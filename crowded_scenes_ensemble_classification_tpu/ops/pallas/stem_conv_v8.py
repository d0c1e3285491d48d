"""Pallas TPU kernel: the I3D 7³/2 stem conv as a deep-K patch matmul.

XLA runs the 3-channel 7³ stride-2 stem (reference train.py:1026) at
~19 TFLOP/s on v5e while the MXU peaks at ~146: the implicit-GEMM
contraction (≤48) starves the systolic array.  Round-1 kernels that
assembled im2col patches with lane-offset stores compiled but were
store-bound, and roll-based taps were folded back into lazy layout offsets
(NEXT.md §2).  This version uses only layout-safe building blocks:

1. OUTSIDE (XLA): SAME-pad + 2×2×2 space-to-depth, laid out as
   xs_T (B, T2, H2, 8C, W2) — **W in lanes, tap-channels in sublanes**.
2. INSIDE, per (batch, t_out, h-chunk) grid step:
   - P2 (384, CHUNK·128): for each output row h, sublane-concat the 16
     (dt, dy) tap rows — each a fresh offset-0 ref load of a (8C, W2)
     plane — and lane-pack the rows into 128-aligned slots (112 valid
     lanes + zero pad).  No offset stores, no rolls.
   - 4 canonical 2-D MXU matmuls W_dx (F, 384) @ P2 (384, CHUNK·128),
     contraction 384 = 3×128 lanes deep.
   - native 2-D transpose → (CHUNK·128, F), reshape to (CHUNK, 128, F),
     take sublanes [dx, dx+W_out) and accumulate — the dx tap becomes a
     sublane-offset add (Mosaic relayouts align it), not a store.

Parity: identical math to models.common.s2d_stem_conv (weights rearranged
in-graph from the checkpoint's (7,7,7,C,F) layout); bf16 inputs accumulate
in f32 like the XLA conv.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

CHUNK_ROWS = 14  # output rows per in-kernel matmul chunk
LANE = 128


def _stem_kernel(s0, s1, s2, s3, w_ref, o_ref, *, w_out: int, w2: int):
    """s0..s3: (1, 1, H2, 8C, W2) temporal slabs; w: (4, F, 16·8C) per-dx
    weights; o: (1, 1, CHUNK, w_out, F)."""
    chunk = o_ref.shape[2]
    f = o_ref.shape[-1]
    h0 = pl.program_id(2) * chunk
    slabs = (s0, s1, s2, s3)
    cdt = s0.dtype

    # P2 (16·8C, CHUNK·LANE): row block h holds the 16 (dt, dy) tap planes
    # for output row h0+h, lane-padded W2 → LANE.
    cols = []
    for h in range(chunk):
        rows = [
            slabs[dt][0, 0, h0 + h + dy, :, :].astype(cdt)
            for dt in range(4)
            for dy in range(4)
        ]
        p_h = jnp.concatenate(rows, axis=0)  # (16·8C, W2)
        p_h = jnp.pad(p_h, ((0, 0), (0, LANE - w2)))
        cols.append(p_h)
    p2 = jnp.concatenate(cols, axis=1)  # (K, CHUNK·LANE)

    acc = None
    for dx in range(4):
        y = jax.lax.dot_general(
            w_ref[dx].astype(cdt),
            p2,
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (F, CHUNK·LANE)
        y_t = y.T  # native 2-D transpose → (CHUNK·LANE, F)
        y_t = y_t.reshape(chunk, LANE, f)
        part = y_t[:, dx : dx + w_out, :]  # sublane-offset slice
        acc = part if acc is None else acc + part
    o_ref[0, 0] = acc.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret", "chunk"))
def stem_conv_7x7x7_s2_v8(
    x: jax.Array,
    kernel: jax.Array,
    interpret: bool = False,
    chunk: int = CHUNK_ROWS,
) -> jax.Array:
    """7³ stride-(2,2,2) TF-SAME conv, NTHWC × (7,7,7,C,F) → NTHWC.
    Requires even T, H, W; H/2 divisible by `chunk`; W/2 + 3 ≤ 128."""
    n, t, h, w, c = x.shape
    kt, kh, kw, kc, f = kernel.shape
    assert (kt, kh, kw) == (7, 7, 7) and kc == c
    assert t % 2 == 0 and h % 2 == 0 and w % 2 == 0
    t_out, h_out, w_out = t // 2, h // 2, w // 2
    assert h_out % chunk == 0, (h_out, chunk)
    assert w // 2 + 3 <= LANE, "width/2+3 must fit one lane tile"

    # --- outside: pad + 2×2×2 space-to-depth in (…, 8C, W2) layout
    xp = jnp.pad(x, ((0, 0), (2, 4), (2, 4), (2, 4), (0, 0)))
    tp, hp, wp = t + 6, h + 6, w + 6
    xs = xp.reshape(n, tp // 2, 2, hp // 2, 2, wp // 2, 2, c)
    # (n, t2, h2, [pt, ph, pw, c], w2)
    xs_t = xs.transpose(0, 1, 3, 2, 4, 6, 7, 5).reshape(
        n, tp // 2, hp // 2, 8 * c, wp // 2
    )
    # per-dx weights: w[dx, f, (dt, dy, 8c)]
    k8 = jnp.pad(kernel, ((0, 1), (0, 1), (0, 1), (0, 0), (0, 0)))
    k8 = k8.reshape(4, 2, 4, 2, 4, 2, c, f).transpose(0, 2, 4, 1, 3, 5, 6, 7)
    k8 = k8.reshape(4, 4, 4, 8 * c, f)  # (dt, dy, dx, 8c, f)
    w_dx = k8.transpose(2, 4, 0, 1, 3).reshape(4, f, 16 * 8 * c)

    cs = 8 * c
    h2, w2 = hp // 2, wp // 2
    slab = (1, 1, h2, cs, w2)

    def idx(shift):
        return lambda b, to, ch: (b, to + shift, 0, 0, 0)

    return pl.pallas_call(
        functools.partial(_stem_kernel, w_out=w_out, w2=w2),
        out_shape=jax.ShapeDtypeStruct((n, t_out, h_out, w_out, f), x.dtype),
        grid=(n, t_out, h_out // chunk),
        in_specs=[
            pl.BlockSpec(slab, idx(0), memory_space=pltpu.VMEM),
            pl.BlockSpec(slab, idx(1), memory_space=pltpu.VMEM),
            pl.BlockSpec(slab, idx(2), memory_space=pltpu.VMEM),
            pl.BlockSpec(slab, idx(3), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # weights (4, F, K)
        ],
        out_specs=pl.BlockSpec(
            (1, 1, chunk, w_out, f),
            lambda b, to, ch: (b, to, ch, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        interpret=pltpu.InterpretParams() if interpret else False,
    )(xs_t, xs_t, xs_t, xs_t, w_dx)
