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


# ----------------------------------------------------------------------
# Space-to-depth stem convolution (TPU layout optimization)
# ----------------------------------------------------------------------


def s2d_stem_conv(x: jax.Array, kernel: jax.Array) -> jax.Array:
    """EXACT rewrite of a 7×7×7 stride-(2,2,2) SAME conv (the I3D stem,
    reference train.py:1026) as a 7×4×4 stride-(2,1,1) conv on a 2×2
    space-to-depth input — the MLPerf-style stem trick.  3-channel 224²
    inputs tile poorly on the TPU vector units; the s2d form has 12
    channels at 115² and runs substantially faster, with bit-identical
    math (the weight rearrangement is algebraic, done in-graph so
    checkpoints keep the canonical (7,7,7,C,F) layout).

    Requires even H and W.  x: (N, T, H, W, C); kernel: (7, 7, 7, C, F).
    """
    n, t, h, w, c = x.shape
    kt, kh, kw, kc, f = kernel.shape
    assert (kt, kh, kw) == (7, 7, 7) and kc == c
    assert h % 2 == 0 and w % 2 == 0, "s2d stem needs even spatial dims"

    # SAME pads for stride 2 / 7 taps are (2, 3); add one extra trailing pad
    # so the 7-tap window becomes an 8-tap (zero-extended) window that
    # factorizes into 4 s2d rows.
    xp = jnp.pad(x, ((0, 0), (0, 0), (2, 4), (2, 4), (0, 0)))
    hp, wp = h + 6, w + 6
    # space-to-depth: (N, T, hp/2, 2, wp/2, 2, C) → channels (ph_h, ph_w, C)
    xs = xp.reshape(n, t, hp // 2, 2, wp // 2, 2, c)
    xs = xs.transpose(0, 1, 2, 4, 3, 5, 6).reshape(n, t, hp // 2, wp // 2, 4 * c)

    # kernel: zero-extend 7→8 taps per spatial axis, then factor each axis
    # into (row, phase); channel order must match (ph_h, ph_w, C) above.
    k8 = jnp.pad(kernel, ((0, 0), (0, 1), (0, 1), (0, 0), (0, 0)))
    k8 = k8.reshape(kt, 4, 2, 4, 2, c, f)  # (t, kh', ph_h, kw', ph_w, C, F)
    k8 = k8.transpose(0, 1, 3, 2, 4, 5, 6).reshape(kt, 4, 4, 4 * c, f)

    out = jax.lax.conv_general_dilated(
        xs,
        k8,
        window_strides=(2, 1, 1),
        padding=[(2, 3), (0, 0), (0, 0)],  # temporal SAME unchanged
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
    )
    return out


class _ConvKernel(nn.Module):
    """Bare conv-kernel parameter holder so s2d stems keep the canonical
    `<layer>/conv/kernel` checkpoint path."""

    shape: Tuple[int, ...]

    @nn.compact
    def __call__(self):
        return self.param("kernel", nn.initializers.lecun_normal(), self.shape, jnp.float32)


class S2DStemConvBN(nn.Module):
    """Drop-in replacement for the I3D stem ConvBN using s2d_stem_conv.
    Same parameter tree (conv/kernel + bn/*) as ConvBN, so converted
    checkpoints load unchanged."""

    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        c = int(x.shape[-1])
        kernel = _ConvKernel((7, 7, 7, c, self.features), name="conv")()
        x = s2d_stem_conv(x.astype(self.dtype), kernel.astype(self.dtype))
        x = nn.BatchNorm(
            use_running_average=not train,
            momentum=KERAS_BN_MOMENTUM,
            epsilon=KERAS_BN_EPS,
            use_scale=False,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name="bn",
        )(x)
        return nn.relu(x)
