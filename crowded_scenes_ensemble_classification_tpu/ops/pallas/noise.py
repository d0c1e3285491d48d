"""Pallas TPU kernel: fused salt+pepper noise with on-core PRNG.

The XLA path (ops.intensity.salt/pepper) materializes TWO int32 random
tensors the size of the clip batch in HBM (jax.random.randint) and streams
the data three times.  This kernel draws random bits on-core
(pltpu.prng_random_bits), derives BOTH the salt and pepper hits from one
32-bit draw (low/high 16 bits), and touches each element exactly once —
HBM traffic drops from ~5× data size to 2× (read + write).

Per-clip Bernoulli gates (the vidaug `Sometimes` wrappers,
augment_dataset.py:24-31) are passed as per-row flags so one kernel call
covers a whole batch with independent per-clip decisions.

Distribution note: hits use a 16-bit threshold `floor(65536/ratio)`, i.e.
p = 655/65536 ≈ 0.009995 for ratio=100 instead of exactly 1/100 — an
immaterial bias for augmentation noise (documented deviation).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE_BLOCK = 64 * 1024  # elements per grid step per clip row (256 KB f32)


def _noise_kernel(seed_ref, gates_ref, x_ref, o_ref, *, threshold: int):
    b = pl.program_id(0)
    j = pl.program_id(1)
    # unique stream per (clip, block)
    pltpu.prng_seed(seed_ref[0] + b * pl.num_programs(1) + j)
    bits = pltpu.bitcast(pltpu.prng_random_bits(x_ref.shape), jnp.uint32)

    salt_on = gates_ref[b, 0] != 0
    pepper_on = gates_ref[b, 1] != 0

    low = bits & jnp.uint32(0xFFFF)
    high = bits >> jnp.uint32(16)
    x = x_ref[:]
    x = jnp.where(salt_on & (low < jnp.uint32(threshold)), 255.0, x)
    x = jnp.where(pepper_on & (high < jnp.uint32(threshold)), 0.0, x)
    o_ref[:] = x


@functools.partial(jax.jit, static_argnames=("ratio",))
def salt_pepper_pallas(
    clips: jax.Array,
    seed: jax.Array,
    salt_gates: jax.Array,
    pepper_gates: jax.Array,
    ratio: int = 100,
) -> jax.Array:
    """clips: (B, ...) float32; gates: (B,) bool; seed: uint32 scalar.
    Each element is set to 255 (salt) / 0 (pepper) with probability ≈1/ratio
    when that clip's gate is on."""
    b = clips.shape[0]
    flat = clips.reshape(b, -1)
    l = flat.shape[1]
    # TPU tiling: operate as (B, rows, 512) with 128-row blocks
    lanes = 512
    pad = (-l) % lanes
    if pad:
        flat = jnp.pad(flat, ((0, 0), (0, pad)))
    rows = flat.shape[1] // lanes
    x3 = flat.reshape(b, rows, lanes)
    row_block = min(128, rows) if rows % 8 == 0 or rows >= 128 else rows
    threshold = max(int(65536 // ratio), 1)

    gates = jnp.stack(
        [salt_gates.astype(jnp.int32), pepper_gates.astype(jnp.int32)], axis=-1
    )  # (B, 2)
    seed_arr = jnp.asarray(seed, jnp.int32).reshape(1)

    out = pl.pallas_call(
        functools.partial(_noise_kernel, threshold=threshold),
        out_shape=jax.ShapeDtypeStruct(x3.shape, x3.dtype),
        grid=(b, pl.cdiv(rows, row_block)),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # seed (full, tiny)
            pl.BlockSpec(memory_space=pltpu.SMEM),  # gates (B, 2), full
            pl.BlockSpec(
                (1, row_block, lanes), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, row_block, lanes), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM
        ),
    )(seed_arr, gates, x3)
    out = out.reshape(b, -1)
    if pad:
        out = out[:, :l]
    return out.reshape(clips.shape)


def crowd11_noise_pallas(
    clips: jax.Array, key: jax.Array, p: float, ratio: int = 100
) -> jax.Array:
    """The salt+pepper tail of the Crowd-11 policy (after crop/flip/resize),
    batched, with per-clip `Sometimes(p)` gates derived from `key`."""
    b = clips.shape[0]
    k_salt, k_pepper, k_seed = jax.random.split(key, 3)
    salt_gates = jax.random.bernoulli(k_salt, p, (b,))
    pepper_gates = jax.random.bernoulli(k_pepper, p, (b,))
    seed = jax.random.randint(k_seed, (), 0, 2**31 - 1, dtype=jnp.int32)
    return salt_pepper_pallas(clips, seed, salt_gates, pepper_gates, ratio)
