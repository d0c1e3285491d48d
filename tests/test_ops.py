"""Device-side transform tests vs numpy/cv2 oracles (SURVEY.md §4a).

Oracle semantics come from the reference's vidaug fork and train.py
pipeline; each test cites the behaviour it checks.
"""

import cv2
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from crowded_scenes_ensemble_classification_tpu.ops import (
    affine,
    crop_flip,
    geometric,
    group,
    intensity,
    resize,
    temporal,
)
from crowded_scenes_ensemble_classification_tpu.ops.augment import (
    crowd11_augment,
    crowd11_augment_batch,
)


def clip_u8(rng, t=4, h=32, w=48, c=3):
    return rng.integers(0, 256, size=(t, h, w, c)).astype(np.float32)


# ---------------------------------------------------------------- temporal


def test_select_frames_matches_reference(rng):
    """step = max(T//n, 1); frames[::step][:n] (train.py:132-145)."""
    clip = clip_u8(rng, t=37)
    out = np.asarray(temporal.select_frames(jnp.asarray(clip), 16))
    step = max(37 // 16, 1)
    expected = clip[::step][:16]
    np.testing.assert_array_equal(out, expected)


def test_select_frames_short_clip_cycles(rng):
    clip = clip_u8(rng, t=5)
    out = np.asarray(temporal.select_frames(jnp.asarray(clip), 16))
    assert out.shape[0] == 16
    np.testing.assert_array_equal(out[:5], clip)
    np.testing.assert_array_equal(out[5], clip[0])


def test_temporal_begin_crop_loop_pad(rng):
    """Cyclic pad when short (vidaug temporal.py:28-49)."""
    clip = clip_u8(rng, t=3)
    out = np.asarray(temporal.temporal_begin_crop(jnp.asarray(clip), 8))
    expected = clip[np.arange(8) % 3]
    np.testing.assert_array_equal(out, expected)


def test_temporal_center_crop(rng):
    clip = clip_u8(rng, t=20)
    out = np.asarray(temporal.temporal_center_crop(jnp.asarray(clip), 8))
    begin = max(0, 10 - 4)
    np.testing.assert_array_equal(out, clip[begin : begin + 8])


def test_temporal_random_crop_range(rng):
    clip = clip_u8(rng, t=20)
    for seed in range(5):
        out = np.asarray(
            temporal.temporal_random_crop(jnp.asarray(clip), 8, jax.random.key(seed))
        )
        assert out.shape[0] == 8
        # every output frame must be one of the source frames
        starts = [
            b for b in range(13) if np.array_equal(out, clip[b : b + 8])
        ]
        assert len(starts) == 1


def test_temporal_fit_matches_linspace_recipe(rng):
    """int(linspace(1, T, n)) − 1 (vidaug temporal.py:159-175)."""
    clip = clip_u8(rng, t=13)
    out = np.asarray(temporal.temporal_fit(jnp.asarray(clip), 7))
    idx = [int(i) - 1 for i in np.linspace(1, 13, 7)]
    np.testing.assert_array_equal(out, clip[idx])


def test_downsample_upsample(rng):
    clip = clip_u8(rng, t=10)
    down = np.asarray(temporal.downsample(jnp.asarray(clip), 0.5))
    assert down.shape[0] == 5
    up = np.asarray(temporal.upsample(jnp.asarray(clip), 1.5))
    assert up.shape[0] == 15


def test_inverse_order(rng):
    clip = clip_u8(rng, t=6)
    out = np.asarray(temporal.inverse_order(jnp.asarray(clip)))
    np.testing.assert_array_equal(out, clip[::-1])


def test_temporal_elastic_is_permutation_of_valid_indices(rng):
    clip = clip_u8(rng, t=16)
    out = np.asarray(
        temporal.temporal_elastic_transformation(jnp.asarray(clip), jax.random.key(3))
    )
    assert out.shape == clip.shape
    # first and last frames are fixed points of the tanh warp
    np.testing.assert_array_equal(out[0], clip[0])
    np.testing.assert_array_equal(out[-1], clip[-1])


# ---------------------------------------------------------------- crops/flips


def test_center_crop_matches_round_half_even(rng):
    """w1 = int(round((W−cw)/2)) with Python round (vidaug crop.py:36-37)."""
    clip = clip_u8(rng, h=33, w=48)
    out = np.asarray(crop_flip.center_crop(jnp.asarray(clip), (20, 21)))
    y0 = int(round((33 - 20) / 2.0))
    x0 = int(round((48 - 21) / 2.0))
    np.testing.assert_array_equal(out, clip[:, y0 : y0 + 20, x0 : x0 + 21])


@pytest.mark.parametrize("pos", ["tl", "tr", "bl", "br", "c"])
def test_corner_crops(pos, rng):
    clip = clip_u8(rng, h=30, w=40)
    out = np.asarray(crop_flip.corner_crop(jnp.asarray(clip), (10, 12), position=pos))
    assert out.shape == (4, 10, 12, 3)


def test_random_crop_within_bounds(rng):
    clip = clip_u8(rng, h=30, w=40)
    out = np.asarray(crop_flip.random_crop(jnp.asarray(clip), (10, 12), jax.random.key(1)))
    # exact window must exist in source
    found = any(
        np.array_equal(out, clip[:, y : y + 10, x : x + 12])
        for y in range(21)
        for x in range(29)
    )
    assert found


def test_flips(rng):
    clip = clip_u8(rng)
    np.testing.assert_array_equal(
        np.asarray(crop_flip.horizontal_flip(jnp.asarray(clip))), clip[:, :, ::-1]
    )
    np.testing.assert_array_equal(
        np.asarray(crop_flip.vertical_flip(jnp.asarray(clip))), clip[:, ::-1]
    )


# ---------------------------------------------------------------- intensity


def test_intensity_ops(rng):
    clip = clip_u8(rng)
    j = jnp.asarray(clip)
    np.testing.assert_array_equal(np.asarray(intensity.invert_color(j)), 255.0 - clip)
    np.testing.assert_array_equal(
        np.asarray(intensity.add(j, 30)), np.clip(clip + 30, 0, 255)
    )
    np.testing.assert_array_equal(
        np.asarray(intensity.multiply(j, 1.5)), np.clip(clip * 1.5, 0, 255)
    )


def test_salt_pepper_density(rng):
    clip = np.full((8, 64, 64, 3), 128.0, np.float32)
    j = jnp.asarray(clip)
    salted = np.asarray(intensity.salt(j, jax.random.key(0), ratio=100))
    frac = (salted == 255.0).mean()
    assert 0.005 < frac < 0.015  # expect ~1/100
    peppered = np.asarray(intensity.pepper(j, jax.random.key(1), ratio=100))
    frac = (peppered == 0.0).mean()
    assert 0.005 < frac < 0.015


# ---------------------------------------------------------------- resize


def test_resize_bilinear_matches_cv2(rng):
    clip = clip_u8(rng, t=2, h=40, w=56)
    out = np.asarray(resize.resize_bilinear(jnp.asarray(clip), (24, 32)))
    for i in range(2):
        oracle = cv2.resize(clip[i], (32, 24), interpolation=cv2.INTER_LINEAR)
        np.testing.assert_allclose(out[i], oracle, atol=0.75)


def test_crop_resize_full_window_equals_resize(rng):
    clip = clip_u8(rng, t=2, h=40, w=56)
    a = np.asarray(resize.crop_resize(jnp.asarray(clip), (24, 32)))
    b = np.asarray(resize.resize_bilinear(jnp.asarray(clip), (24, 32)))
    np.testing.assert_allclose(a, b, atol=1e-3)


def test_crop_resize_window_matches_crop_then_resize(rng):
    clip = clip_u8(rng, t=2, h=40, w=56)
    fused = np.asarray(
        resize.crop_resize(
            jnp.asarray(clip), (24, 32), win_start_yx=(5, 7), win_size_hw=(20, 30)
        )
    )
    two_step = np.asarray(
        resize.resize_bilinear(jnp.asarray(clip[:, 5:25, 7:37]), (24, 32))
    )
    np.testing.assert_allclose(fused, two_step, atol=1e-3)


def test_crop_resize_flip(rng):
    clip = clip_u8(rng, t=1, h=32, w=32)
    flipped = np.asarray(
        resize.crop_resize(jnp.asarray(clip), (32, 32), flip_x=True)
    )
    np.testing.assert_allclose(flipped, clip[:, :, ::-1], atol=1e-3)


# ---------------------------------------------------------------- affine


def test_translate_matches_cv2(rng):
    clip = clip_u8(rng, t=1, h=32, w=40)
    out = np.asarray(affine.translate(jnp.asarray(clip), 5.0, -3.0))
    m = np.float32([[1, 0, 5], [0, 1, -3]])
    oracle = cv2.warpAffine(clip[0], m, (40, 32))
    np.testing.assert_allclose(out[0, 4:-4, 6:-6], oracle[4:-4, 6:-6], atol=1.0)


def test_shear_matches_cv2(rng):
    clip = clip_u8(rng, t=1, h=32, w=40)
    out = np.asarray(affine.shear(jnp.asarray(clip), 0.1, -0.05))
    m = np.float32([[1, 0.1, 0], [-0.05, 1, 0]])
    oracle = cv2.warpAffine(clip[0], m, (40, 32))
    # compare interior (border handling differs at edges)
    np.testing.assert_allclose(out[0, 6:-6, 8:-8], oracle[6:-6, 8:-8], atol=2.0)


def test_rotate_90_exact():
    clip = np.zeros((1, 21, 21, 1), np.float32)
    clip[0, 3, 10, 0] = 100.0
    out = np.asarray(affine.rotate(jnp.asarray(clip), 90.0))
    # a point above center maps to the side under a 90° rotation
    y, x = np.unravel_index(np.argmax(out[0, :, :, 0]), (21, 21))
    assert (y, x) != (3, 10)
    assert out.max() > 50


# ---------------------------------------------------------------- geometric


def test_gaussian_blur_matches_scipy(rng):
    from scipy import ndimage

    clip = clip_u8(rng, t=1, h=32, w=32, c=1)
    out = np.asarray(geometric.gaussian_blur(jnp.asarray(clip), sigma=1.5))
    oracle = ndimage.gaussian_filter(clip[0, :, :, 0], sigma=1.5, mode="nearest")
    np.testing.assert_allclose(out[0, :, :, 0], oracle, atol=0.6)


def test_elastic_identity_when_alpha_zero(rng):
    clip = clip_u8(rng, t=2, h=16, w=16)
    out = np.asarray(
        geometric.elastic_transformation(jnp.asarray(clip), jax.random.key(0), 0.0, 3.0)
    )
    np.testing.assert_allclose(out, clip, atol=1e-3)


def test_piecewise_affine_zero_displacement_identity(rng):
    clip = clip_u8(rng, t=2, h=16, w=16)
    out = np.asarray(
        geometric.piecewise_affine_transform(
            jnp.asarray(clip), jax.random.key(0), 0.0, 1.0, 1.0
        )
    )
    np.testing.assert_array_equal(out, clip)


def test_superpixel_full_replace_constant_segments(rng):
    clip = clip_u8(rng, t=2, h=8, w=8)
    segments = jnp.zeros((8, 8), jnp.int32)  # one segment
    out = np.asarray(
        geometric.apply_superpixels(jnp.asarray(clip), segments, 1.0, jax.random.key(0))
    )
    for t in range(2):
        for c in range(3):
            np.testing.assert_allclose(out[t, :, :, c], clip[t, :, :, c].mean(), atol=1e-3)


# ---------------------------------------------------------------- combinators


def test_sometimes_gates(rng):
    clip = jnp.asarray(clip_u8(rng))
    t_always = group.sometimes(1.0, lambda c, k: c + 1.0)
    t_never = group.sometimes(0.0, lambda c, k: c + 1.0)
    np.testing.assert_allclose(np.asarray(t_always(clip, jax.random.key(0))), np.asarray(clip) + 1)
    np.testing.assert_allclose(np.asarray(t_never(clip, jax.random.key(0))), np.asarray(clip))


def test_one_of_applies_exactly_one(rng):
    clip = jnp.zeros((1, 4, 4, 1))
    tf = group.one_of([lambda c, k: c + 1, lambda c, k: c + 2])
    out = float(np.asarray(tf(clip, jax.random.key(0))).max())
    assert out in (1.0, 2.0)


def test_some_of_applies_n(rng):
    clip = jnp.zeros((1, 4, 4, 1))
    tf = group.some_of([lambda c, k: c + 1, lambda c, k: c + 10, lambda c, k: c + 100], n=2)
    out = float(np.asarray(tf(clip, jax.random.key(0))).max())
    assert out in (11.0, 101.0, 110.0)


def test_sequential_fixed_order(rng):
    clip = jnp.zeros((1, 4, 4, 1))
    tf = group.sequential([lambda c, k: c + 1, lambda c, k: c * 3])
    out = float(np.asarray(tf(clip, jax.random.key(0))).max())
    assert out == 3.0


# ---------------------------------------------------------------- fused policy


def test_crowd11_augment_shapes_and_determinism(rng):
    clip = jnp.asarray(clip_u8(rng, t=4, h=120, w=160))
    out1 = crowd11_augment(clip, jax.random.key(7), (56, 56), p=0.75)
    out2 = crowd11_augment(clip, jax.random.key(7), (56, 56), p=0.75)
    assert out1.shape == (4, 56, 56, 3)
    np.testing.assert_array_equal(np.asarray(out1), np.asarray(out2))
    out3 = crowd11_augment(clip, jax.random.key(8), (56, 56), p=0.75)
    assert not np.array_equal(np.asarray(out1), np.asarray(out3))


def test_crowd11_augment_p0_is_plain_resize(rng):
    clip = jnp.asarray(clip_u8(rng, t=2, h=120, w=160))
    out = crowd11_augment(clip, jax.random.key(0), (56, 56), p=0.0)
    oracle = resize.resize_bilinear(clip, (56, 56))
    np.testing.assert_allclose(np.asarray(out), np.asarray(oracle), atol=1e-2)


def test_crowd11_augment_batch_vmap(rng):
    clips = jnp.asarray(np.stack([clip_u8(rng, t=2, h=64, w=64) for _ in range(3)]))
    out = crowd11_augment_batch(clips, jax.random.key(0), (32, 32), p=0.9)
    assert out.shape == (3, 2, 32, 32, 3)
    # per-sample keys differ → different augmentations (almost surely)
    assert not np.array_equal(np.asarray(out[0]), np.asarray(out[1]))


def test_sequential_random_order_applies_all(rng):
    """Random-order Sequential applies every transform exactly once
    (vidaug group.py:25-49 with random_order=True)."""
    clip = jnp.zeros((1, 4, 4, 1))
    tf = group.sequential(
        [lambda c, k: c + 1, lambda c, k: c * 2, lambda c, k: c + 10],
        random_order=True,
    )
    seen = set()
    for seed in range(12):
        out = float(np.asarray(tf(clip, jax.random.key(seed)))[0, 0, 0, 0])
        seen.add(out)
        # all permutation results of {+1, *2, +10} from 0:
        assert out in {12.0, 22.0, 11.0, 21.0, 12.0, 2.0 + 10.0}
    assert len(seen) >= 2  # the order actually varies


# ------------------------------------------------- window transfers


def test_windowed_augment_matches_full_path_exactly(rng):
    """Host-sliced window + device windowed augment must be FLOAT-IDENTICAL
    to the full-staging augment for cropped clips, and reference-faithful
    (decode-time u8 resize) for uncropped ones."""
    import jax
    import jax.numpy as jnp

    from crowded_scenes_ensemble_classification_tpu.ops.augment import (
        augment_crop_decisions,
        crowd11_augment_batch,
        crowd11_augment_windowed_batch,
        decode_time_eval_resize_u8,
        pack_windows_host,
    )

    B, T, S = 8, 3, 64
    out_hw = (56, 56)          # staging 64, margin 16 -> crop window 48
    margin = 16
    staging = rng.integers(0, 255, (B, T, S, S, 3)).astype(np.uint8)
    key = jax.random.key(7)

    do_crop, y0, x0 = augment_crop_decisions(
        key, B, (S, S), p=0.75, crop_margin=margin
    )
    assert do_crop.any() and (~do_crop).any(), "seed must exercise both paths"

    eval_u8 = np.stack([decode_time_eval_resize_u8(c, out_hw) for c in staging])
    buf = pack_windows_host(staging, eval_u8, do_crop, y0, x0, out_hw, margin)

    got = crowd11_augment_windowed_batch(
        jnp.asarray(buf).astype(jnp.float32), key, out_hw, (S, S), p=0.75,
        crop_margin=margin,
    )
    full = crowd11_augment_batch(
        jnp.asarray(staging).astype(jnp.float32), key, out_hw, p=0.75,
        crop_margin=margin,
    )

    got_np, full_np = np.asarray(got), np.asarray(full)
    for i in range(B):
        if do_crop[i]:
            # same pixel selection; tap weights may differ by 1 ulp of the
            # (y0 + coords) addition the full path performs -> <=2e-3 on
            # the 0-255 scale (4e-6 relative; far below bf16 model eps)
            np.testing.assert_allclose(
                got_np[i], full_np[i], atol=2e-3,
                err_msg=f"cropped clip {i} must match to tap-weight ulp",
            )
        else:
            # uncropped: windowed path uses the u8-quantized decode-time
            # resize (reference cv2-on-uint8 semantics, train.py:283-289)
            # -> within u8 rounding of the device f32 resize; salt/pepper
            # pixels are forced to 0/255 identically in both.
            diff = np.abs(got_np[i] - full_np[i])
            assert diff.max() <= 1.0, diff.max()


def test_windowed_augment_needs_margin_consistency(rng):
    """augment_crop_decisions and the windowed batch must agree on gates
    for any key (threefry is backend-independent)."""
    import jax

    from crowded_scenes_ensemble_classification_tpu.ops.augment import (
        augment_crop_decisions,
    )

    key = jax.random.key(123)
    a = augment_crop_decisions(key, 16, (64, 64), p=0.75, crop_margin=16)
    b = augment_crop_decisions(key, 16, (64, 64), p=0.75, crop_margin=16)
    np.testing.assert_array_equal(a[0], b[0])
    np.testing.assert_array_equal(a[1], b[1])
    np.testing.assert_array_equal(a[2], b[2])
    assert a[1].max() <= 16 and a[2].max() <= 16

    # fold_step must equal an explicit fold_in of the key (the device-side
    # pipeline folds the step inside its jit region)
    c = augment_crop_decisions(
        key, 16, (64, 64), p=0.75, crop_margin=16, fold_step=7
    )
    d = augment_crop_decisions(
        jax.random.fold_in(key, 7), 16, (64, 64), p=0.75, crop_margin=16
    )
    np.testing.assert_array_equal(c[0], d[0])
    np.testing.assert_array_equal(c[1], d[1])
    np.testing.assert_array_equal(c[2], d[2])
