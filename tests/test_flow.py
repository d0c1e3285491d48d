"""Optical-flow kernel tests: synthetic-motion accuracy, cv2 cross-check for
Farnebäck (SURVEY.md §7.3.1 mitigation), TV-L1 convergence, quantization
round-trip."""

import cv2
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from crowded_scenes_ensemble_classification_tpu.flow import (
    dequantize_flow_u8,
    farneback_flow_clip,
    farneback_flow_pair,
    quantize_flow_u8,
    rgb_to_gray,
    tvl1_flow_pair,
    warp_image,
)


def textured_image(rng, h=64, w=64, blur=3):
    img = rng.random((h, w)).astype(np.float32) * 255
    return cv2.GaussianBlur(img, (0, 0), blur)


def shifted_pair(rng, dx=2.0, dy=1.0, h=64, w=64):
    """I0, and I1 whose content moved by (+dx, +dy): expected flow (dx, dy)
    in cv2's prev→next convention."""
    big = textured_image(rng, h + 16, w + 16)
    m = np.float32([[1, 0, -8], [0, 1, -8]])
    I0 = cv2.warpAffine(big, m, (w, h))
    m2 = np.float32([[1, 0, -8 + dx], [0, 1, -8 + dy]])
    I1 = cv2.warpAffine(big, m2, (w, h))
    return I0, I1


def interior(x, m=10):
    return x[m:-m, m:-m]


def test_farneback_recovers_translation(rng):
    I0, I1 = shifted_pair(rng, dx=2.0, dy=1.0)
    flow = np.asarray(farneback_flow_pair(jnp.asarray(I0), jnp.asarray(I1)))
    assert abs(np.median(interior(flow[..., 0])) - 2.0) < 0.5
    assert abs(np.median(interior(flow[..., 1])) - 1.0) < 0.5


def test_farneback_close_to_cv2(rng):
    I0, I1 = shifted_pair(rng, dx=3.0, dy=-2.0, h=96, w=96)
    ours = np.asarray(farneback_flow_pair(jnp.asarray(I0), jnp.asarray(I1)))
    ref = cv2.calcOpticalFlowFarneback(
        I0.astype(np.uint8), I1.astype(np.uint8), None,
        0.5, 5, 11, 5, 5, 1.1, 0,
    )
    diff = np.abs(interior(ours) - interior(ref))
    # Endpoint agreement within half a pixel on average for pure translation
    assert diff.mean() < 0.5, diff.mean()


def test_farneback_zero_motion(rng):
    I0 = textured_image(rng)
    flow = np.asarray(farneback_flow_pair(jnp.asarray(I0), jnp.asarray(I0)))
    assert np.abs(flow).max() < 0.1


def test_farneback_clip_api(rng):
    clip = np.stack([textured_image(rng, 48, 48) for _ in range(4)])
    flows = farneback_flow_clip(jnp.asarray(clip))
    assert flows.shape == (3, 48, 48, 2)


def test_farneback_batch_api_matches_nested(rng):
    """farneback_flow_batch flattens leading batch dims into one vmap axis
    (nested vmap halves TPU throughput); result == the nested-vmap form."""
    from crowded_scenes_ensemble_classification_tpu.flow import (
        farneback_flow_batch,
    )

    gray = jnp.asarray(
        np.stack(
            [textured_image(rng, 48, 48) for _ in range(6)]
        ).reshape(2, 3, 48, 48)
    )
    gray_next = jnp.roll(gray, -1, axis=1)
    a = np.asarray(farneback_flow_batch(gray, gray_next))
    b = np.asarray(
        jax.vmap(jax.vmap(lambda p, c: farneback_flow_pair(p, c)))(
            gray, gray_next
        )
    )
    assert a.shape == (2, 3, 48, 48, 2)
    np.testing.assert_allclose(a, b, atol=1e-5)
    # memory-bounding chunked path, non-divisible total (6 pairs, chunks
    # of 4 → one padded chunk): pad rows discarded, flow equal to float
    # noise (different batch shapes compile to different fusion/rounding;
    # measured ≤1e-3 px — far under the solver's own EPE tolerances)
    c = np.asarray(farneback_flow_batch(gray, gray_next, chunk_pairs=4))
    np.testing.assert_allclose(c, a, atol=5e-3)


def test_tvl1_recovers_translation(rng):
    I0, I1 = shifted_pair(rng, dx=1.5, dy=-1.0)
    flow = np.asarray(
        tvl1_flow_pair(jnp.asarray(I0) / 255.0, jnp.asarray(I1) / 255.0)
    )
    assert abs(np.median(interior(flow[..., 0])) - 1.5) < 0.5
    assert abs(np.median(interior(flow[..., 1])) + 1.0) < 0.5


def test_tvl1_zero_motion(rng):
    I0 = textured_image(rng)
    flow = np.asarray(tvl1_flow_pair(jnp.asarray(I0) / 255.0, jnp.asarray(I0) / 255.0))
    assert np.abs(flow).max() < 0.2


def test_flow_quantization_roundtrip(rng):
    flow = jnp.asarray(rng.uniform(-15, 15, (8, 8, 2)).astype(np.float32))
    q = quantize_flow_u8(flow, bound=20.0)
    assert q.dtype == jnp.uint8
    back = dequantize_flow_u8(q, bound=20.0)
    np.testing.assert_allclose(np.asarray(back), np.asarray(flow), atol=0.08)


def test_warp_image_shifts(rng):
    img = jnp.asarray(textured_image(rng))
    flow = jnp.ones((64, 64, 2)) * jnp.asarray([3.0, 0.0])
    warped = np.asarray(warp_image(img, flow))
    np.testing.assert_allclose(
        interior(warped), interior(np.asarray(img)[:, 3:67] if False else np.roll(np.asarray(img), -3, axis=1)),
        atol=1e-2,
    )


def test_rgb_to_gray_matches_cv2(rng):
    frame = rng.integers(0, 255, (16, 16, 3)).astype(np.uint8)
    ours = np.asarray(rgb_to_gray(jnp.asarray(frame, jnp.float32)))
    ref = cv2.cvtColor(frame, cv2.COLOR_BGR2GRAY).astype(np.float32)
    np.testing.assert_allclose(ours, ref, atol=1.0)


def test_farneback_fast_warp_recovers_translation(rng):
    """fast_warp mode (gather-free separable warp) recovers uniform motion
    exactly like the exact path."""
    I0, I1 = shifted_pair(rng, dx=2.0, dy=1.0)
    flow = np.asarray(
        farneback_flow_pair(jnp.asarray(I0), jnp.asarray(I1), fast_warp=True)
    )
    assert abs(np.median(interior(flow[..., 0])) - 2.0) < 0.5
    assert abs(np.median(interior(flow[..., 1])) - 1.0) < 0.5


def test_warp_separable_matches_exact_on_smooth_flow(rng):
    from crowded_scenes_ensemble_classification_tpu.flow.pyramid import (
        warp_image,
        warp_image_separable,
    )

    img = jnp.asarray(textured_image(rng))
    # smooth flow field (the regime the approximation targets)
    gy, gx = np.meshgrid(np.linspace(0, 1, 64), np.linspace(0, 1, 64), indexing="ij")
    flow = jnp.asarray(
        np.stack([2.0 + np.sin(gx * 3) * 1.5, -1.0 + np.cos(gy * 3)], -1), jnp.float32
    )
    a = np.asarray(warp_image(img, flow))
    b = np.asarray(warp_image_separable(img, flow))
    assert np.abs(a - b)[6:-6, 6:-6].mean() < 1.0


def test_tvl1_fast_warp_recovers_translation(rng):
    I0, I1 = shifted_pair(rng, dx=1.5, dy=-1.0)
    flow = np.asarray(
        tvl1_flow_pair(jnp.asarray(I0), jnp.asarray(I1), fast_warp=True)
    )
    assert abs(np.median(interior(flow[..., 0])) - 1.5) < 0.5
    assert abs(np.median(interior(flow[..., 1])) + 1.0) < 0.5
