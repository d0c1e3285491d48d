"""Pallas TPU kernel: 3×3×3 stride-1 SAME max-pooling.

Every I3D inception block contains a 3³/1 SAME maxpool branch
(reference train.py:1045, 9 instances) — an overlapping 27-tap
reduce_window that XLA executes at ~11% of HBM speed-of-light on v5e
(measured: 8.5ms for (32,10,56,56,192) bf16 vs ~1ms theoretical).

Design: the same input is passed three times with *clamped temporal index
maps* (t−1, t, t+1 — clamping equals SAME −inf padding because max is
idempotent), so Mosaic's pipeline streams the three (H, W, C) slabs into
VMEM with automatic double-buffering; the 27-tap window then collapses to
a temporal max plus shifted-register maxes along H and W — pure VPU work,
each element read ≤3× instead of 27×.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = float("-inf")


def _shift_max_axis0(y: jax.Array) -> jax.Array:
    """max(y[h-1], y[h], y[h+1]) along axis 0 with −inf edges."""
    pad = jnp.full_like(y[:1], NEG_INF)
    up = jnp.concatenate([y[1:], pad], axis=0)
    down = jnp.concatenate([pad, y[:-1]], axis=0)
    return jnp.maximum(jnp.maximum(up, y), down)


def _shift_max_axis1(y: jax.Array) -> jax.Array:
    pad = jnp.full_like(y[:, :1], NEG_INF)
    left = jnp.concatenate([y[:, 1:], pad], axis=1)
    right = jnp.concatenate([pad, y[:, :-1]], axis=1)
    return jnp.maximum(jnp.maximum(left, y), right)


def _maxpool3_kernel(xm1_ref, x0_ref, xp1_ref, o_ref):
    y = jnp.maximum(jnp.maximum(xm1_ref[0, 0], x0_ref[0, 0]), xp1_ref[0, 0])
    y = _shift_max_axis0(y)  # H
    y = _shift_max_axis1(y)  # W
    o_ref[0, 0] = y


@jax.jit
def max_pool_3x3x3_same(x: jax.Array) -> jax.Array:
    """(B, T, H, W, C) → same shape; equals nn.max_pool((3,3,3), (1,1,1),
    'SAME').  bf16/f32.

    Channels are chunked into 128-lane blocks so the 3-slab working set
    (×2 pipeline buffers) stays under the 16 MB VMEM budget."""
    b, t, h, w, c = x.shape
    cb = min(c, 128)
    block = pl.BlockSpec
    slab = (1, 1, h, w, cb)

    def idx(shift):
        def index_map(i, j, k):
            return (i, jnp.clip(j + shift, 0, t - 1), 0, 0, k)

        return index_map

    return pl.pallas_call(
        _maxpool3_kernel,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        grid=(b, t, pl.cdiv(c, cb)),
        in_specs=[
            block(slab, idx(-1), memory_space=pltpu.VMEM),
            block(slab, idx(0), memory_space=pltpu.VMEM),
            block(slab, idx(1), memory_space=pltpu.VMEM),
        ],
        out_specs=block(
            slab, lambda i, j, k: (i, j, 0, 0, k), memory_space=pltpu.VMEM
        ),
    )(x, x, x)
