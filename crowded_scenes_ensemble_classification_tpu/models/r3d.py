"""R3D — 3D ResNets (18/34/50/101/152) in Flax.

Behavioural spec from the reference keras-resnet3d port
(train.py:1278-1559): pre-activation residual blocks (`bn→relu→conv`),
7³/2 stem conv + 3³/2 same-pad maxpool, four stages with channel doubling,
stride-2 first block per stage (except stage 0), projection shortcut via a
1×1×1 valid conv whose strides are the ceil shape ratios
(`_shortcut3d` train.py:1324-1346), final bn→relu, full-volume average pool,
Dense softmax head (here: logits).

Every kernel carries Keras `l2(1e-4)` regularization in the reference; the
train engine reproduces it via `models.common.l2_param_penalty`.

Always trained from scratch, mirroring train.py:1683-1707.
Canonical input 16×112×112×3 (train.py:1603-1611).
"""

from __future__ import annotations

import math
from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from .common import BNRelu, QuantConv, avg_pool_3d, flatten, max_pool_3d

# depth → (block kind, repetitions) — reference train.py:1526-1559
R3D_PRESETS = {
    18: ("basic", (2, 2, 2, 2)),
    34: ("basic", (3, 4, 6, 3)),
    50: ("bottleneck", (3, 4, 6, 3)),
    101: ("bottleneck", (3, 4, 23, 3)),
    152: ("bottleneck", (3, 8, 36, 3)),
}


def _conv(feats, kernel, strides=(1, 1, 1), padding="SAME", dtype=jnp.float32, name=None, quant=False):
    if quant:
        from .common import quant_mode

        # int8 contraction (inference only); same 'kernel'+'bias' params
        return QuantConv(
            feats, kernel_size=kernel, strides=strides, padding=padding,
            mode=quant_mode(quant), name=name,
        )
    return nn.Conv(
        feats,
        kernel_size=kernel,
        strides=strides,
        padding=padding,
        dtype=dtype,
        param_dtype=jnp.float32,
        name=name,
    )


class _Shortcut(nn.Module):
    """Identity, or 1×1×1 valid-conv projection when shape/channels change
    (reference `_shortcut3d` train.py:1324-1346)."""

    dtype: jnp.dtype = jnp.float32
    quant: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, residual: jax.Array) -> jax.Array:
        strides = tuple(
            math.ceil(int(x.shape[i]) / int(residual.shape[i])) for i in (1, 2, 3)
        )
        equal_channels = int(x.shape[-1]) == int(residual.shape[-1])
        if any(s > 1 for s in strides) or not equal_channels:
            x = _conv(
                int(residual.shape[-1]),
                (1, 1, 1),
                strides=strides,
                padding="VALID",
                dtype=self.dtype,
                name="proj",
                quant=self.quant,
            )(x)
        return x + residual


class BasicBlock3D(nn.Module):
    features: int
    strides: Tuple[int, int, int] = (1, 1, 1)
    is_first_block_of_first_layer: bool = False
    dtype: jnp.dtype = jnp.float32
    quant: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        if self.is_first_block_of_first_layer:
            # Stem just did bn→relu→maxpool; don't repeat the pre-activation
            # (reference basic_block train.py:1372-1379).
            y = _conv(self.features, (3, 3, 3), self.strides, dtype=self.dtype, name="conv1", quant=self.quant)(x)
        else:
            y = BNRelu(dtype=self.dtype, name="preact1")(x, train)
            y = _conv(self.features, (3, 3, 3), self.strides, dtype=self.dtype, name="conv1", quant=self.quant)(y)
        y2 = BNRelu(dtype=self.dtype, name="preact2")(y, train)
        y2 = _conv(self.features, (3, 3, 3), dtype=self.dtype, name="conv2", quant=self.quant)(y2)
        return _Shortcut(dtype=self.dtype, quant=self.quant, name="shortcut")(x, y2)


class BottleneckBlock3D(nn.Module):
    features: int
    strides: Tuple[int, int, int] = (1, 1, 1)
    is_first_block_of_first_layer: bool = False
    dtype: jnp.dtype = jnp.float32
    quant: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        if self.is_first_block_of_first_layer:
            y = _conv(self.features, (1, 1, 1), self.strides, dtype=self.dtype, name="conv1", quant=self.quant)(x)
        else:
            y = BNRelu(dtype=self.dtype, name="preact1")(x, train)
            y = _conv(self.features, (1, 1, 1), self.strides, dtype=self.dtype, name="conv1", quant=self.quant)(y)
        y = BNRelu(dtype=self.dtype, name="preact2")(y, train)
        y = _conv(self.features, (3, 3, 3), dtype=self.dtype, name="conv2", quant=self.quant)(y)
        y = BNRelu(dtype=self.dtype, name="preact3")(y, train)
        y = _conv(self.features * 4, (1, 1, 1), dtype=self.dtype, name="conv3", quant=self.quant)(y)
        return _Shortcut(dtype=self.dtype, quant=self.quant, name="shortcut")(x, y)


class R3D(nn.Module):
    """ResNet3D classifier.  `depth` ∈ {18, 34, 50, 101, 152}."""

    num_classes: int = 11
    depth: int = 18
    dtype: jnp.dtype = jnp.float32
    # quant=True runs every conv contraction in int8 on the MXU
    # (inference only; models.common.quant_conv_general).
    quant: bool = False
    # width=1.0 is the exact reference topology; smaller values shrink every
    # stage's channel count proportionally (CI/dryrun-scale models, like
    # C3D.width — converted checkpoints require width=1.0).
    width: float = 1.0

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        if self.quant and train:
            raise ValueError("quant=True R3D is inference-only")
        kind, repetitions = R3D_PRESETS[self.depth]
        block_cls = BasicBlock3D if kind == "basic" else BottleneckBlock3D

        base = max(int(64 * self.width), 8)
        x = x.astype(self.dtype)
        # Stem: conv→bn→relu then same-pad maxpool (train.py:1483-1488).
        x = _conv(base, (7, 7, 7), (2, 2, 2), dtype=self.dtype, name="conv1", quant=self.quant)(x)
        x = BNRelu(dtype=self.dtype, name="stem_bnrelu")(x, train)
        x = max_pool_3d(x, (3, 3, 3), (2, 2, 2), "SAME")

        features = base
        for stage, reps in enumerate(repetitions):
            for i in range(reps):
                strides = (2, 2, 2) if (i == 0 and stage != 0) else (1, 1, 1)
                x = block_cls(
                    features=features,
                    strides=strides,
                    is_first_block_of_first_layer=(stage == 0 and i == 0),
                    dtype=self.dtype,
                    quant=self.quant,
                    name=f"stage{stage}_block{i}",
                )(x, train)
            features *= 2

        x = BNRelu(dtype=self.dtype, name="final_bnrelu")(x, train)
        # Full-volume average pool (train.py:1502-1507).
        t, h, w = int(x.shape[1]), int(x.shape[2]), int(x.shape[3])
        x = avg_pool_3d(x, (t, h, w), (1, 1, 1), "VALID")
        x = flatten(x)
        logits = nn.Dense(
            self.num_classes, dtype=self.dtype, param_dtype=jnp.float32, name="predictions"
        )(x)
        return logits.astype(jnp.float32)
