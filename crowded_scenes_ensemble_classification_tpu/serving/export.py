"""Serving export: the fused ensemble forward as a portable StableHLO
artifact (jax.export).

The reference "serves" by rebuilding the Keras graph and running
predict_generator with batch_size=1 per member (reference
evaluate_ensemble.py:1032-1063) — deployment means shipping the training
code.  Here the WHOLE serving computation — staged uint8 batch →
resize/scale → every member's forward (weights baked in) → weighted score
fusion → (probs, fused, preds) — is exported once as a versioned,
self-contained StableHLO module that any compatible JAX runtime (or a
C++ PJRT host) can load and run WITHOUT the framework or the Python model
code, on the platform(s) chosen at export time (TPU serving binaries can
be produced on a CPU-only host: lowering is ahead-of-time and
cross-platform).

Artifact = one zip file: `module.stablehlo` (jax.export serialization,
member parameters baked as constants) + `metadata.json` (model type,
member names, fusion weights, input spec) — inspectable, hash-able,
deployable.
"""

from __future__ import annotations

import json
import zipfile
from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ensemble.members import make_member_forward, stack_variables
from ..models.registry import ModelBundle

_MODULE_NAME = "module.stablehlo"
_META_NAME = "metadata.json"


def serving_batch_example(
    bundle: ModelBundle,
    batch_size: int,
    serve_hw: Optional[Tuple[int, int]] = None,
    flow_precomputed: bool = True,
) -> Dict[str, np.ndarray]:
    """The abstract input batch the exported module accepts: staged uint8
    arrays exactly as the BatchPipeline yields them.  serve_hw defaults to
    the model's input size (host resizes at decode, like the reference's
    cv2.resize, train.py:283-289); pass the staging size instead to move
    the resize into the artifact."""
    t = bundle.clip.frames
    h, w = serve_hw or (bundle.clip.height, bundle.clip.width)
    ex = {"rgb": np.zeros((batch_size, t, h, w, 3), np.uint8)}
    if bundle.two_stream:
        if flow_precomputed:
            ex["flow"] = np.zeros((batch_size, t, h, w, 2), np.uint8)
        else:
            ex["gray"] = np.zeros((batch_size, t, h, w, 1), np.uint8)
            ex["gray_next"] = np.zeros((batch_size, t, h, w, 1), np.uint8)
    return ex


def export_ensemble(
    bundle: ModelBundle,
    variables_list: Sequence[Dict],
    batch_example: Dict[str, np.ndarray],
    *,
    weights: Optional[np.ndarray] = None,
    input_scale: float = 1.0,
    platforms: Sequence[str] = ("tpu",),
    share_stem_staging: bool = False,
    flow_fast_warp: bool = False,
    flow_params: Optional[dict] = None,
    mesh=None,
    member_axis: str = "member",
    data_axis: str = "data",
    bake_params: bool = True,
) -> bytes:
    """Serialize the fused ensemble forward to StableHLO bytes.

    The computation matches ensemble.members.make_member_forward exactly
    (same resize/scale/flow conventions — members must be served at the
    scale they trained with) followed by weighted SUM fusion
    (ensemble.fusion._fuse_weighted semantics, reference
    evaluate_ensemble.py:362-366).

    mesh=None (single-chip artifact): member parameters and fusion
    weights are baked into the module as constants — one self-contained
    file.  With a mesh (MULTI-CHIP serving): the exported module takes
    (stacked_vars, batch) with the SPMD member/data shardings recorded
    (jax.export preserves them; the load-time device count must match),
    and the serving runtime supplies the sharded parameters — the
    standard split for multi-host deployment.  Sharded modules are
    exported for the current platform (export on the target mesh);
    `platforms` applies to the single-chip form.

    bake_params=False keeps the single-chip signature (stacked_vars,
    batch) too — a lean module with parameters supplied at load time
    (useful when the deployment channel ships weights separately, or on
    compile relays where constant-inflated HLO blows request limits)."""
    out_hw = (bundle.clip.height, bundle.clip.width)
    fwd = make_member_forward(
        bundle,
        out_hw,
        mesh=mesh,
        member_axis=member_axis,
        data_axis=data_axis,
        input_scale=input_scale,
        share_stem_staging=share_stem_staging,
        flow_fast_warp=flow_fast_warp,
        flow_params=flow_params,
    )
    w = (
        jnp.ones((len(variables_list),), jnp.float32)
        if weights is None
        else jnp.asarray(weights, jnp.float32)
    )

    if mesh is not None:
        from ..ensemble.members import shard_stacked

        stacked = shard_stacked(
            stack_variables(variables_list), mesh, member_axis
        )

        @jax.jit
        def serve_sharded(stacked_vars, batch):
            probs = fwd(stacked_vars, batch)  # (M, B, C)
            fused = jnp.einsum("mbc,m->bc", probs, w)
            return {
                "probs": probs,
                "fused": fused,
                "preds": jnp.argmax(fused, axis=-1),
            }

        return jax.export.export(serve_sharded)(stacked, batch_example).serialize()

    stacked = stack_variables(variables_list)

    if not bake_params:

        @jax.jit
        def serve_args(stacked_vars, batch):
            probs = fwd(stacked_vars, batch)  # (M, B, C)
            fused = jnp.einsum("mbc,m->bc", probs, w)
            return {
                "probs": probs,
                "fused": fused,
                "preds": jnp.argmax(fused, axis=-1),
            }

        exp = jax.export.export(serve_args, platforms=list(platforms))(
            stacked, batch_example
        )
        return exp.serialize()

    @jax.jit
    def serve(batch):
        probs = fwd(stacked, batch)  # (M, B, C)
        fused = jnp.einsum("mbc,m->bc", probs, w)
        return {
            "probs": probs,
            "fused": fused,
            "preds": jnp.argmax(fused, axis=-1),
        }

    exp = jax.export.export(serve, platforms=list(platforms))(batch_example)
    return exp.serialize()


def save_serving_artifact(path: str, blob: bytes, metadata: Dict) -> str:
    """One deployable zip: StableHLO module + JSON metadata."""
    with zipfile.ZipFile(path, "w", compression=zipfile.ZIP_DEFLATED) as z:
        z.writestr(_MODULE_NAME, blob)
        z.writestr(_META_NAME, json.dumps(metadata, indent=2, sort_keys=True))
    return path


def load_serving_artifact(path: str):
    """→ (serve_fn(batch dict) → {"probs","fused","preds"}, metadata).
    Runs on any platform the artifact was exported for."""
    with zipfile.ZipFile(path) as z:
        blob = z.read(_MODULE_NAME)
        metadata = json.loads(z.read(_META_NAME))
    exp = jax.export.deserialize(blob)

    def serve(*args):
        """Single-chip artifacts: serve(batch).  Sharded (mesh-exported)
        artifacts: serve(stacked_vars, batch) — the runtime supplies the
        sharded parameters (see export_ensemble)."""
        return exp.call(*args)

    serve.platforms = exp.platforms
    serve.nr_devices = exp.nr_devices
    return serve, metadata
