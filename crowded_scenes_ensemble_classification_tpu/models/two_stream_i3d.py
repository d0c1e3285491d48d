"""TwoStream-I3D: RGB trunk + optical-flow trunk, concatenated heads.

Behavioural spec from the reference `TwoStream_Inception_Inflated3d`
(train.py:857-1011): two independent I3D trunks — RGB with 3 input channels,
flow with 2 (forced via assign_tuple_value, train.py:880-891) — each run
through the feature head, flattened, concatenated, then a single
Dense(num_classes, softmax) (train.py:1006-1009).  Here the Dense returns
logits.

Parity note: the reference's named-Kinetics-weights branch
(train.py:940-952) is dead code (invalid list indexing); the live paths are
weights=None and weights=[rgb_path, flow_path], which map here to fresh init
and `weights_io` conversion respectively.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from .common import flatten
from .i3d import I3DTrunk, i3d_feature_head


class TwoStreamI3D(nn.Module):
    num_classes: int = 11
    dtype: jnp.dtype = jnp.float32
    # stem_prestaged=True: BOTH inputs are already in the s2d_stem_stage
    # layout (N, T, H/2+3, W/2+3, 4C) — computed once per batch by the
    # caller and shared across ensemble members, amortizing both trunks'
    # stem staging over the whole ensemble (models.common.s2d_stem_stage).
    stem_prestaged: bool = False
    quant: bool = False  # int8 conv contractions in both trunks (inference only)
    # restrict int8 to these stem/Mixed_* sites in BOTH trunks (None =
    # everywhere); see I3DTrunk.quant_blocks
    quant_blocks: Optional[Tuple[str, ...]] = None
    fuse_1x1: bool = False  # fused block-input 1×1 convs (exact rewrite)

    @nn.compact
    def __call__(
        self, rgb: jax.Array, flow: jax.Array, train: bool = False
    ) -> jax.Array:
        """rgb: (N, T, H, W, 3); flow: (N, T, H, W, 2)."""
        trunk = functools.partial(
            I3DTrunk,
            dtype=self.dtype,
            stem_prestaged=self.stem_prestaged,
            quant=self.quant,
            quant_blocks=self.quant_blocks,
            fuse_1x1=self.fuse_1x1,
        )
        x_rgb = trunk(name="rgb_trunk")(rgb, train)
        x_flow = trunk(name="flow_trunk")(flow, train)
        feats = jnp.concatenate(
            [flatten(i3d_feature_head(x_rgb)), flatten(i3d_feature_head(x_flow))],
            axis=-1,
        )
        logits = nn.Dense(
            self.num_classes, dtype=self.dtype, param_dtype=jnp.float32, name="predictions"
        )(feats)
        return logits.astype(jnp.float32)
