"""Model factory + input-spec registry.

Mirrors the reference's `define_input` (train.py:1566-1616),
`train_load_model` (train.py:1619-1710) and `evaluate_load_model`
(train.py:1712-1772): one place that maps a model_type string to a built
model with its canonical clip geometry.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ..core.config import ClipSpec, clip_spec
from .c3d import C3D
from .i3d import I3D
from .r3d import R3D
from .two_stream_i3d import TwoStreamI3D


@dataclasses.dataclass
class ModelBundle:
    """A built model: Flax module + helpers that hide one- vs two-stream."""

    model_type: str
    module: Any
    clip: ClipSpec
    num_classes: int
    two_stream: bool

    # ------------------------------------------------------------------

    def dummy_batch(self, batch_size: int = 1, dtype=jnp.float32):
        c = self.clip
        rgb = jnp.zeros((batch_size,) + c.rgb_shape, dtype)
        if self.two_stream:
            flow = jnp.zeros((batch_size,) + c.flow_shape, dtype)
            return {"rgb": rgb, "flow": flow}
        return {"rgb": rgb}

    def init(self, key: jax.Array, batch_size: int = 1) -> Dict:
        batch = self.dummy_batch(batch_size)
        if self.two_stream:
            return self.module.init(key, batch["rgb"], batch["flow"], train=False)
        return self.module.init(key, batch["rgb"], train=False)

    def apply(
        self,
        variables: Dict,
        batch: Dict[str, jax.Array],
        train: bool = False,
        rngs: Optional[Dict] = None,
        mutable: Any = False,
    ):
        """Returns logits (and, if mutable, the updated variable dict)."""
        kwargs = dict(train=train, rngs=rngs, mutable=mutable)
        if self.two_stream:
            return self.module.apply(variables, batch["rgb"], batch["flow"], **kwargs)
        return self.module.apply(variables, batch["rgb"], **kwargs)


def build_model(
    model_type: str,
    num_classes: int = 11,
    dtype=jnp.float32,
    **model_kwargs,
) -> ModelBundle:
    """model_kwargs forward to the module constructor (e.g. I3D's
    s2d_stem/remat, C3D's width)."""
    spec = clip_spec(model_type)
    if model_type == "C3D":
        module = C3D(num_classes=num_classes, dtype=dtype, **model_kwargs)
    elif model_type == "I3D":
        module = I3D(num_classes=num_classes, dtype=dtype, **model_kwargs)
    elif model_type == "TWOSTREAM_I3D":
        module = TwoStreamI3D(num_classes=num_classes, dtype=dtype, **model_kwargs)
    elif model_type.startswith("R3D_"):
        depth = int(model_type.split("_")[1])
        module = R3D(num_classes=num_classes, depth=depth, dtype=dtype, **model_kwargs)
    else:
        raise ValueError(f"Unknown model_type {model_type!r}")
    return ModelBundle(
        model_type=model_type,
        module=module,
        clip=spec,
        num_classes=num_classes,
        two_stream=(model_type == "TWOSTREAM_I3D"),
    )


def predict_proba(bundle: ModelBundle, variables: Dict, batch) -> jax.Array:
    """Softmax probabilities — what the reference models emitted directly."""
    logits = bundle.apply(variables, batch, train=False)
    return jax.nn.softmax(logits, axis=-1)


def summarize(bundle: ModelBundle, variables: Dict) -> str:
    """Human-readable parameter summary — the reference's model.summary()
    (train.py:806,1893,1945) equivalent for jitted Flax models."""
    lines = [f"{bundle.model_type}: input {bundle.clip.rgb_shape}"]
    total = 0

    def walk(tree, prefix=""):
        nonlocal total
        for k in sorted(tree):
            v = tree[k]
            if isinstance(v, dict):
                walk(v, prefix + k + "/")
            else:
                n = int(jnp.size(v))
                total += n
                lines.append(f"  {prefix + k:<60} {tuple(v.shape)!s:<20} {n:>12,}")

    walk(variables.get("params", {}))
    lines.append(f"total params: {total:,}")
    if "batch_stats" in variables:
        stats = sum(int(jnp.size(x)) for x in jax.tree_util.tree_leaves(variables["batch_stats"]))
        lines.append(f"batch_stats:  {stats:,}")
    return "\n".join(lines)
