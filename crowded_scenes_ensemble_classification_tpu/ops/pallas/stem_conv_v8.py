"""Pallas TPU kernel v8: I3D 7³/2 stem as an MXU patch-matmul with
32-lane-aligned channel padding.

Same construction as stem_conv.py (2×2×2 space-to-depth outside → 4³/1
conv as im2col patch-matmul inside), but the s2d channels are zero-padded
24 → 32 so that:
- every (dt, dy, dx) tap slice is a 32-lane block,
- the 4 dx taps of one (dt, dy) band tile exactly one 128-lane group,
- patch-assembly stores/concats happen at 32-aligned lane offsets (the
  round-1 v7 kernel's 24-lane masked stores were the bottleneck —
  NEXT.md §2).

K grows 1536 → 2048 (33% more MACs, all on the MXU where the stem has
>10× headroom).  Weights are zero-padded in the same (dt, dy, dx, c)
order, so the math is exactly the canonical stem (reference train.py:1026).

assembly='concat': lane-concat of rolled tap bands (no scratch).
assembly='scratch': explicit VMEM scratch + 64 aligned 32-lane stores.
assembly='wfold': dx-unfold OUTSIDE (XLA lane concat) → kernel is one
K=2048 matmul over 16 leading-dim tap slices, zero in-kernel assembly.

STATUS: EXPERIMENTAL — 'scratch' and 'wfold' COMPILE AND ARE EXACT on-chip
(bf16, maxerr 0.03 vs the canonical bf16 conv), but NONE beats XLA yet
(measured v5e, B=16/48 at 224²): XLA canonical 36.6 ms @B=48 (21.7 TF);
wfold 76.5 ms; scratch 62 ms @B=16.  Measured root causes:
- the XLA-side staging (8-D s2d transpose + 24→32 lane pad + dx concat)
  alone costs 34.8 ms @B=16 — more than XLA's entire conv;
- bf16 sublane rotates are unimplemented in Mosaic ("Rotate with non-32-bit
  data"), and f32-roll + lane-concat still hits the lazy-layout
  "offset mismatch" fold;
- breaking the accumulator chain / single K=2048 dot made no difference —
  per-block cost is staging + streaming bound, not MXU bound.
The model keeps stem_impl='xla' as the production default (models/i3d.py);
this kernel stays behind stem_impl='pallas' for future Mosaic versions.

ROUND-3 CLOSE-OUT: the one untried lever — amortizing the s2d staging
across ensemble members — was measured and SHIPPED via pure XLA, no
Pallas: `models.common.s2d_stem_stage` computed once per batch +
`stem_prestaged=True` modules per member run the 4-member stem in
92.6 ms vs 111.2 ms canonical at B=48 (34.3 TFLOP/s effective, clearing
the ≥30 TF bar).  With staging amortized, the remaining stem is a plain
K=2048-ish MXU contraction that XLA already schedules well — the Pallas
campaign is closed unless Mosaic gains bf16 sublane rotates.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

CHUNK_ROWS = 14  # output rows per in-kernel matmul chunk
CS = 32  # padded s2d channel count (8·3 = 24 → 32)


def _kernel_concat(s0, s1, s2, s3, w_ref, o_ref, *, h_out, w_out):
    f = w_ref.shape[-1]
    slabs = (s0, s1, s2, s3)
    w2 = s0.shape[3]
    for c in range(h_out // CHUNK_ROWS):
        r0 = c * CHUNK_ROWS
        parts = []
        for dt in range(4):
            for dy in range(4):
                band = slabs[dt][0, 0, r0 + dy : r0 + dy + CHUNK_ROWS, :, :]
                # f32 rolls (bf16 dynamic_rotate is unimplemented in Mosaic)
                band = band.astype(jnp.float32)
                for dx in range(4):
                    shifted = pltpu.roll(band, w2 - dx, 1) if dx else band
                    parts.append(shifted[:, 0:w_out, :])
        patches = jnp.concatenate(parts, axis=-1)  # (CHUNK, w_out, 64·CS)
        patches = patches.reshape(CHUNK_ROWS * w_out, -1)
        out = jnp.dot(
            patches.astype(w_ref.dtype), w_ref[:],
            preferred_element_type=jnp.float32,
        )
        o_ref[0, 0, r0 : r0 + CHUNK_ROWS] = out.reshape(
            CHUNK_ROWS, w_out, f
        ).astype(o_ref.dtype)


def _kernel_scratch(s0, s1, s2, s3, w_ref, o_ref, patches, *, h_out, w_out):
    f = w_ref.shape[-1]
    slabs = (s0, s1, s2, s3)
    w2 = s0.shape[3]
    for c in range(h_out // CHUNK_ROWS):
        r0 = c * CHUNK_ROWS
        for dt in range(4):
            for dy in range(4):
                for dx in range(4):
                    # fresh offset-0 load straight from the ref (bf16 has no
                    # dynamic_rotate; ref slices avoid rolls entirely)
                    piece = slabs[dt][
                        0, 0,
                        r0 + dy : r0 + dy + CHUNK_ROWS,
                        dx : dx + w_out,
                        :,
                    ]
                    lane0 = (dt * 16 + dy * 4 + dx) * CS
                    patches[:, :, lane0 : lane0 + CS] = piece
        out = jnp.dot(
            patches[:].reshape(CHUNK_ROWS * w_out, -1),
            w_ref[:],
            preferred_element_type=jnp.float32,
        )
        o_ref[0, 0, r0 : r0 + CHUNK_ROWS] = out.reshape(
            CHUNK_ROWS, w_out, f
        ).astype(o_ref.dtype)


def _kernel_wfold(s0, s1, s2, s3, w_ref, o_ref, *, h_out, w_out):
    """Assembly-free variant: the dx-unfold happened OUTSIDE (XLA lane
    concat → 128-wide slabs), so each (dt, dy) tap is a LEADING-dim slice
    (free tile selection) and the conv is 16 accumulating K=128 MXU
    matmuls — no rolls, no scratch, no unaligned stores."""
    f = w_ref.shape[-1]
    slabs = (s0, s1, s2, s3)
    # ONE deep matmul: the 16 (dt, dy) taps lane-concat into K = 16·128 =
    # 2048 (all operands are offset-0 loads with identical layouts), so the
    # whole accumulation happens inside the MXU — no f32 accumulator
    # round-trips through VMEM.
    pieces = [
        slabs[dt][0, 0, dy : dy + h_out, :, :].reshape(h_out * w_out, 4 * CS)
        for dt in range(4)
        for dy in range(4)
    ]
    patches = jnp.concatenate(pieces, axis=1)  # (M, 2048)
    out = jnp.dot(
        patches,
        w_ref[:].reshape(16 * 4 * CS, f),
        preferred_element_type=jnp.float32,
    )
    o_ref[0, 0] = out.reshape(h_out, w_out, f).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("assembly", "interpret"))
def stem_conv_7x7x7_s2_v8(
    x: jax.Array,
    kernel: jax.Array,
    assembly: str = "scratch",
    interpret: bool = False,
) -> jax.Array:
    """7³ stride-(2,2,2) TF-SAME conv, NTHWC × (7,7,7,C,F) → NTHWC.
    Requires even T/H/W and H/2 divisible by CHUNK_ROWS (224² ✓)."""
    n, t, h, w, c = x.shape
    kt, kh, kw, kc, f = kernel.shape
    assert (kt, kh, kw) == (7, 7, 7) and kc == c
    assert t % 2 == 0 and h % 2 == 0 and w % 2 == 0
    t_out, h_out, w_out = t // 2, h // 2, w // 2
    assert h_out % CHUNK_ROWS == 0, (h_out, CHUNK_ROWS)
    assert 8 * c <= CS

    # --- outside: pad + 2×2×2 space-to-depth, channels padded to CS ------
    xp = jnp.pad(x, ((0, 0), (2, 4), (2, 4), (2, 4), (0, 0)))
    tp, hp, wp = t + 6, h + 6, w + 6
    xs = xp.reshape(n, tp // 2, 2, hp // 2, 2, wp // 2, 2, c)
    xs = xs.transpose(0, 1, 3, 5, 2, 4, 6, 7).reshape(
        n, tp // 2, hp // 2, wp // 2, 8 * c
    )
    xs = jnp.pad(xs, ((0, 0),) * 4 + ((0, CS - 8 * c),))
    k8 = jnp.pad(kernel, ((0, 1), (0, 1), (0, 1), (0, 0), (0, 0)))
    k8 = k8.reshape(4, 2, 4, 2, 4, 2, c, f).transpose(0, 2, 4, 1, 3, 5, 6, 7)
    k8 = k8.reshape(4, 4, 4, 8 * c, f)
    k8 = jnp.pad(k8, ((0, 0),) * 3 + ((0, CS - 8 * c), (0, 0)))
    w_flat = k8.reshape(4 * 4 * 4 * CS, f)

    h2, w2 = hp // 2, wp // 2

    def idx(shift):
        return lambda b, to: (b, to + shift, 0, 0, 0)

    if assembly == "wfold":
        # dx-unfold OUTSIDE: lanes become (dx, c) = 128-wide
        xs = jnp.concatenate(
            [xs[:, :, :, dx : dx + w_out, :] for dx in range(4)], axis=-1
        )  # (n, t2, h2, w_out, 4·CS)
        w_flat = k8.reshape(16, 4 * CS, f)
        slab = (1, 1, h2, w_out, 4 * CS)
        kern = functools.partial(_kernel_wfold, h_out=h_out, w_out=w_out)
        scratch = []
    elif assembly == "concat":
        slab = (1, 1, h2, w2, CS)
        kern = functools.partial(_kernel_concat, h_out=h_out, w_out=w_out)
        scratch = []
    else:
        slab = (1, 1, h2, w2, CS)
        kern = functools.partial(_kernel_scratch, h_out=h_out, w_out=w_out)
        scratch = [pltpu.VMEM((CHUNK_ROWS, w_out, 64 * CS), x.dtype)]

    return pl.pallas_call(
        kern,
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
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=pltpu.InterpretParams() if interpret else False,
    )(xs, xs, xs, xs, w_flat)
