"""Pallas TPU kernel: the I3D 7³/2 stem convolution as an MXU patch-matmul.

XLA runs the 3-channel 7³ stride-2 stem at ~8 TFLOP/s (33 ms for B=32 —
~60% of the whole I3D forward) while the mid-network convs hit 104 TFLOP/s:
with 3 input channels the implicit-GEMM contraction is tiny and the MXU
starves.

This kernel restores the contraction dimension:
1. OUTSIDE (cheap XLA reshapes): 2×2×2 space-to-depth of the SAME-padded
   input → xs (B, T2, H2, W2, 24) with a stride-1 4³ kernel — exactly
   equivalent to the 7³/2 SAME conv (zero-extended taps; same construction
   as models.common.s2d_stem_conv, validated to float noise),
2. INSIDE: for each (batch, t_out) grid step, four temporal slabs stream in
   as pipelined VMEM blocks (same clamped-index trick as the maxpool
   kernel); the kernel builds im2col patch rows chunk-by-chunk with static
   slices and runs ONE (rows, 4·4·4·24=1536) × (1536, 64) MXU matmul per
   chunk — contraction 1536 ≫ 128 keeps the systolic array full.

Parity: identical math to the canonical stem (weights are rearranged
in-graph from the checkpoint's (7,7,7,C,64) layout).

STATUS: EXPERIMENTAL — exact in interpret mode (tests), but the Mosaic
compiler currently rejects the patch concat on-device: it folds the
pltpu.roll taps back into lazy layout offsets and then hits
"result/input offset mismatch on non-concat dimension" (sublane offsets
follow the dx taps).  Known paths forward (NEXT.md): assemble patches in a
VMEM scratch with the tap index on an untiled leading dim + a multi-dim
dot_general, or 128-lane-aligned channel padding of the s2d input.  Not
wired into the model yet; XLA remains the stem default.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

CHUNK_ROWS = 14  # output rows per in-kernel matmul chunk


def _stem_kernel(s0, s1, s2, s3, w_ref, o_ref, *, h_out: int, w_out: int):
    """s0..s3: (1, 1, H2, W2, 8C) temporal slabs t..t+3; w: (4·4·4·8C, F);
    o: (1, 1, h_out, w_out, F).

    Mosaic requires matching sublane offsets for lane-concat inputs, so the
    dx taps are realized with pltpu.roll along W (physical shift → offset-0
    layout) instead of offset slices."""
    f = w_ref.shape[-1]
    slabs = (s0, s1, s2, s3)
    w2 = s0.shape[3]
    n_chunks = h_out // CHUNK_ROWS
    for c in range(n_chunks):
        r0 = c * CHUNK_ROWS
        parts = []
        for dt in range(4):
            for dy in range(4):
                # REF slice → fresh offset-0 load (vector slices carry
                # layout offsets Mosaic can't concat on non-concat dims)
                band = slabs[dt][
                    0, 0, r0 + dy : r0 + dy + CHUNK_ROWS, :, :
                ].astype(jnp.float32)
                for dx in range(4):
                    # W2−dx ≡ −dx (mod W2): column j+dx at offset-0 layout
                    shifted = pltpu.roll(band, w2 - dx, 1) if dx else band
                    parts.append(shifted[:, 0:w_out, :])
        patches = jnp.concatenate(parts, axis=-1)  # (CHUNK, w_out, 64·8C)
        patches = patches.reshape(CHUNK_ROWS * w_out, -1)
        out = jnp.dot(
            patches, w_ref[:].astype(jnp.float32),
            preferred_element_type=jnp.float32,
        )
        o_ref[0, 0, r0 : r0 + CHUNK_ROWS] = out.reshape(
            CHUNK_ROWS, w_out, f
        ).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def stem_conv_7x7x7_s2(x: jax.Array, kernel: jax.Array, interpret: bool = False) -> jax.Array:
    """7³ stride-(2,2,2) TF-SAME conv, NTHWC × (7,7,7,C,F) → NTHWC.
    Requires even T, H, W and H/2 divisible by CHUNK_ROWS (224² ✓)."""
    n, t, h, w, c = x.shape
    kt, kh, kw, kc, f = kernel.shape
    assert (kt, kh, kw) == (7, 7, 7) and kc == c
    assert t % 2 == 0 and h % 2 == 0 and w % 2 == 0
    t_out, h_out, w_out = t // 2, h // 2, w // 2
    assert h_out % CHUNK_ROWS == 0, (h_out, CHUNK_ROWS)

    # --- outside: pad + 2×2×2 space-to-depth (same math as s2d_stem_conv)
    xp = jnp.pad(x, ((0, 0), (2, 4), (2, 4), (2, 4), (0, 0)))
    tp, hp, wp = t + 6, h + 6, w + 6
    xs = xp.reshape(n, tp // 2, 2, hp // 2, 2, wp // 2, 2, c)
    xs = xs.transpose(0, 1, 3, 5, 2, 4, 6, 7).reshape(
        n, tp // 2, hp // 2, wp // 2, 8 * c
    )
    k8 = jnp.pad(kernel, ((0, 1), (0, 1), (0, 1), (0, 0), (0, 0)))
    k8 = k8.reshape(4, 2, 4, 2, 4, 2, c, f).transpose(0, 2, 4, 1, 3, 5, 6, 7)
    w_flat = k8.reshape(4 * 4 * 4 * 8 * c, f)

    cs = 8 * c
    h2, w2 = hp // 2, wp // 2
    slab = (1, 1, h2, w2, cs)

    def idx(shift):
        return lambda b, to: (b, to + shift, 0, 0, 0)

    return pl.pallas_call(
        functools.partial(_stem_kernel, h_out=h_out, w_out=w_out),
        out_shape=jax.ShapeDtypeStruct((n, t_out, h_out, w_out, f), x.dtype),
        grid=(n, t_out),
        in_specs=[
            pl.BlockSpec(slab, idx(0), memory_space=pltpu.VMEM),
            pl.BlockSpec(slab, idx(1), memory_space=pltpu.VMEM),
            pl.BlockSpec(slab, idx(2), memory_space=pltpu.VMEM),
            pl.BlockSpec(slab, idx(3), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # weights, full
        ],
        out_specs=pl.BlockSpec(
            (1, 1, h_out, w_out, f), lambda b, to: (b, to, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        interpret=pltpu.InterpretParams() if interpret else False,
    )(xs, xs, xs, xs, w_flat)
