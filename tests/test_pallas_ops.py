"""Pallas kernel tests.

CPU CI runs the kernels in TPU-interpret mode, where prng_random_bits
returns zeros — so CPU tests cover shape/gating/passthrough logic, and the
stochastic-density checks only run when a real TPU is attached (bench runs
exercise them in production)."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ON_TPU = jax.devices()[0].platform == "tpu"


def _run(clips, seed, salt_gates, pepper_gates, ratio=100, interpret=True):
    from crowded_scenes_ensemble_classification_tpu.ops.pallas import noise as N

    if not interpret:
        return N.salt_pepper_pallas(clips, seed, salt_gates, pepper_gates, ratio)

    b = clips.shape[0]
    flat = clips.reshape(b, -1)
    l = flat.shape[1]
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
    )
    out = pl.pallas_call(
        functools.partial(N._noise_kernel, threshold=threshold),
        out_shape=jax.ShapeDtypeStruct(x3.shape, x3.dtype),
        grid=(b, pl.cdiv(rows, row_block)),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, row_block, lanes), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, row_block, lanes), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        interpret=pltpu.InterpretParams(),
    )(jnp.asarray(seed, jnp.int32).reshape(1), gates, x3)
    out = out.reshape(b, -1)
    if pad:
        out = out[:, :l]
    return out.reshape(clips.shape)


def test_gates_off_is_identity():
    """With both gates off the kernel must pass data through unchanged —
    independent of what the PRNG emits."""
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(0, 255, (2, 4, 32, 32, 3)), jnp.float32)
    off = jnp.asarray([False, False])
    out = np.asarray(_run(x, 7, off, off))
    np.testing.assert_array_equal(out, np.asarray(x))


def test_per_clip_gating_interpret():
    """Interpret-mode PRNG yields all-zero bits → every element 'hits';
    that degenerate case exactly exposes the gating logic."""
    x = jnp.full((3, 2, 16, 16, 1), 128.0, jnp.float32)
    out = np.asarray(
        _run(x, 0, jnp.asarray([True, False, False]), jnp.asarray([False, True, False]))
    )
    assert (out[0] == 255.0).all()  # salt gate on, all bits hit
    assert (out[1] == 0.0).all()  # pepper gate on
    assert (out[2] == 128.0).all()  # both off


def test_nondivisible_length_padding():
    x = jnp.full((2, 5, 7, 7, 3), 50.0, jnp.float32)  # 735 elements/clip
    off = jnp.asarray([False, False])
    out = np.asarray(_run(x, 1, off, off, ratio=10))
    assert out.shape == x.shape
    np.testing.assert_array_equal(out, np.asarray(x))


@pytest.mark.skipif(not ON_TPU, reason="real PRNG requires TPU")
def test_noise_density_on_tpu():
    x = jnp.full((2, 4, 64, 64, 3), 128.0, jnp.float32)
    on = jnp.asarray([True, True])
    out = np.asarray(_run(x, 7, on, on, interpret=False))
    assert 0.005 < (out == 255.0).mean() < 0.016
    assert 0.005 < (out == 0.0).mean() < 0.016


def test_maxpool_pallas_matches_xla_interpret():
    """3³/1 SAME maxpool kernel == nn.max_pool (interpret mode)."""
    import flax.linen as nn
    from crowded_scenes_ensemble_classification_tpu.ops.pallas import maxpool as M

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 5, 8, 8, 16)), jnp.float32)
    b, t, h, w, c = x.shape
    slab = (1, 1, h, w, c)

    def idx(shift):
        return lambda i, j: (i, jnp.clip(j + shift, 0, t - 1), 0, 0, 0)

    out = pl.pallas_call(
        M._maxpool3_kernel,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        grid=(b, t),
        in_specs=[
            pl.BlockSpec(slab, idx(-1), memory_space=pltpu.VMEM),
            pl.BlockSpec(slab, idx(0), memory_space=pltpu.VMEM),
            pl.BlockSpec(slab, idx(1), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(slab, lambda i, j: (i, j, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=pltpu.InterpretParams(),
    )(x, x, x)
    ref = nn.max_pool(x, (3, 3, 3), (1, 1, 1), "SAME")
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


@pytest.mark.skipif(not ON_TPU, reason="compiled pallas requires TPU")
def test_maxpool_pallas_on_tpu():
    import flax.linen as nn
    from crowded_scenes_ensemble_classification_tpu.ops.pallas.maxpool import (
        max_pool_3x3x3_same,
    )

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 4, 16, 16, 192)), jnp.bfloat16)
    out = max_pool_3x3x3_same(x)
    ref = nn.max_pool(x, (3, 3, 3), (1, 1, 1), "SAME")
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_stem_conv_kernel_interpret():
    """Pallas stem patch-matmul == TF-SAME 7³/2 conv (interpret mode)."""
    from jax import lax
    from crowded_scenes_ensemble_classification_tpu.ops.pallas.stem_conv import (
        stem_conv_7x7x7_s2,
    )

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(1, 8, 56, 56, 3)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(7, 7, 7, 3, 16)) * 0.1, jnp.float32)
    got = stem_conv_7x7x7_s2(x, k, interpret=True)
    ref = lax.conv_general_dilated(
        x, k, (2, 2, 2), "SAME", dimension_numbers=("NDHWC", "DHWIO", "NDHWC")
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-4)


# ----------------------------------------------------------------------
# stem_conv_v8: the 7³/2 I3D stem as a 32-lane-aligned MXU patch-matmul
# ----------------------------------------------------------------------


@pytest.mark.parametrize("assembly", ["concat", "scratch"])
def test_stem_conv_v8_exact_interpret(assembly, rng):
    """Both assembly variants reproduce the canonical 7³/2 TF-SAME stem
    conv exactly (interpret mode; reference op train.py:1026)."""
    from crowded_scenes_ensemble_classification_tpu.ops.pallas.stem_conv_v8 import (
        stem_conv_7x7x7_s2_v8,
    )

    x = jnp.asarray(rng.normal(0, 1, (2, 4, 28, 28, 3)), jnp.float32)
    k = jnp.asarray(rng.normal(0, 0.1, (7, 7, 7, 3, 16)), jnp.float32)
    ref = jax.lax.conv_general_dilated(
        x, k, (2, 2, 2), "SAME", dimension_numbers=("NDHWC", "DHWIO", "NDHWC")
    )
    out = stem_conv_7x7x7_s2_v8(x, k, assembly=assembly, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


@pytest.mark.tpu
@pytest.mark.skipif(not ON_TPU, reason="needs real TPU")
def test_stem_conv_v8_on_tpu(rng):
    from crowded_scenes_ensemble_classification_tpu.ops.pallas.stem_conv_v8 import (
        stem_conv_7x7x7_s2_v8,
    )

    x = jnp.asarray(rng.normal(0, 1, (2, 20, 224, 224, 3)), jnp.bfloat16)
    k = jnp.asarray(rng.normal(0, 0.05, (7, 7, 7, 3, 64)), jnp.bfloat16)
    ref = jax.lax.conv_general_dilated(
        x, k, (2, 2, 2), "SAME", dimension_numbers=("NDHWC", "DHWIO", "NDHWC")
    )
    out = stem_conv_7x7x7_s2_v8(x, k, assembly="scratch")
    # bf16 operands with f32 accumulation in both paths
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32), atol=0.0625
    )
