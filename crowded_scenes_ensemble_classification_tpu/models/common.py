"""Shared building blocks for the 3D-CNN zoo.

Layout is NTHWC (batch, time, height, width, channels) throughout — the
TPU-friendly channels-last layout, and the same axis order the reference fed
Keras (channels_last, train.py input shapes at 1566-1616).

Padding/pool semantics deliberately match Keras/TF1 so that converted
reference weights reproduce outputs:

- 'SAME' convs/pools use TF SAME (asymmetric right/bottom-heavy padding on
  even strides) — XLA's "SAME" is TF-compatible.
- BatchNorm uses epsilon=1e-3 / momentum=0.99 (Keras 2.2.4 defaults), with
  `scale=False` where the reference's conv3d_bn does (train.py:665).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

KERAS_BN_EPS = 1e-3
KERAS_BN_MOMENTUM = 0.99


def max_pool_3d(
    x: jax.Array,
    window: Tuple[int, int, int],
    strides: Tuple[int, int, int],
    padding: str = "SAME",
) -> jax.Array:
    """MaxPooling3D over the (T, H, W) axes of an NTHWC tensor."""
    return nn.max_pool(x, window_shape=window, strides=strides, padding=padding)


def avg_pool_3d(
    x: jax.Array,
    window: Tuple[int, int, int],
    strides: Tuple[int, int, int] = (1, 1, 1),
    padding: str = "VALID",
) -> jax.Array:
    """AveragePooling3D over the (T, H, W) axes of an NTHWC tensor."""
    return nn.avg_pool(x, window_shape=window, strides=strides, padding=padding)


class ConvBN(nn.Module):
    """Conv3D (no bias) + BatchNorm(scale=False) + ReLU.

    Mirrors the reference `conv3d_bn` (train.py:615-670) used by every I3D
    layer; on TPU the conv lands on the MXU and XLA fuses the BN/ReLU
    epilogue into it.
    """

    features: int
    kernel: Tuple[int, int, int]
    strides: Tuple[int, int, int] = (1, 1, 1)
    padding: str = "SAME"
    use_bias: bool = False
    use_bn: bool = True
    use_relu: bool = True
    bn_scale: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        x = nn.Conv(
            features=self.features,
            kernel_size=self.kernel,
            strides=self.strides,
            padding=self.padding,
            use_bias=self.use_bias,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name="conv",
        )(x)
        if self.use_bn:
            x = nn.BatchNorm(
                use_running_average=not train,
                momentum=KERAS_BN_MOMENTUM,
                epsilon=KERAS_BN_EPS,
                use_scale=self.bn_scale,
                dtype=self.dtype,
                param_dtype=jnp.float32,
                name="bn",
            )(x)
        if self.use_relu:
            x = nn.relu(x)
        return x


class BNRelu(nn.Module):
    """BatchNorm (full affine) + ReLU — the R3D pre-activation helper
    (reference `_bn_relu` train.py:1278-1281)."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        x = nn.BatchNorm(
            use_running_average=not train,
            momentum=KERAS_BN_MOMENTUM,
            epsilon=KERAS_BN_EPS,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name="bn",
        )(x)
        return nn.relu(x)


def flatten(x: jax.Array) -> jax.Array:
    """Row-major flatten of all non-batch axes — identical to Keras Flatten
    on a channels_last tensor."""
    return x.reshape((x.shape[0], -1))


def l2_param_penalty(params, weight: float = 1e-4, kernel_key: str = "kernel"):
    """Sum of `weight * sum(k**2)` over every conv/dense kernel — the Keras
    `l2(1e-4)` regularizer the R3D family attaches to all kernels
    (reference train.py:1292-1293, 1511-1516)."""
    total = 0.0
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    for path, leaf in flat:
        names = [getattr(p, "key", getattr(p, "name", "")) for p in path]
        if names and names[-1] == kernel_key:
            total = total + jnp.sum(jnp.square(leaf.astype(jnp.float32)))
    return weight * total
