"""Data layer tests: fold generation properties (SURVEY.md §4d), split
matrix, pipeline determinism."""

import os

import numpy as np
import pandas as pd
import pytest

from crowded_scenes_ensemble_classification_tpu.data import (
    BatchPipeline,
    SampleSpec,
    assign_scenes_to_folds,
    build_split,
    class_weights_balanced,
    expand_precomputed_augmentation,
    fold_class_histograms,
    generate_folds,
    generate_synthetic_dataset,
    load_fold_csvs,
    make_fold_dataframes,
    scene_labels_from_dataframe,
    verify_folds_disjoint,
    write_split_matrix,
)
from crowded_scenes_ensemble_classification_tpu.core.config import split_pairs


@pytest.fixture(scope="module")
def synth_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("synth")
    df = generate_synthetic_dataset(
        str(root), num_scenes=10, clips_per_scene=3, num_classes=4,
        num_frames=10, hw=(48, 48), as_videos=False,
    )
    return root, df


def test_fold_assignment_properties():
    rng = np.random.default_rng(0)
    scene_labels = {
        s: list(rng.integers(0, 5, size=rng.integers(2, 12))) for s in range(40)
    }
    folds = assign_scenes_to_folds(scene_labels, nb_folds=5, num_classes=5)
    assert verify_folds_disjoint(folds)
    assert sum(len(f) for f in folds) == 40
    # greedy balance: clip counts per fold within a reasonable band
    clip_counts = [sum(len(scene_labels[s]) for s in f) for f in folds]
    assert max(clip_counts) - min(clip_counts) < max(clip_counts)


def test_fold_assignment_biggest_scene_first():
    scene_labels = {"big": [0] * 10, "small": [1], "mid": [0, 1, 0]}
    folds = assign_scenes_to_folds(scene_labels, nb_folds=2, num_classes=2)
    # 'big' placed first into fold 0 (lowest score at start)
    assert "big" in folds[0]


def test_generate_folds_csv_format(synth_root, tmp_path):
    _, df = synth_root
    folder, folds_scenes = generate_folds(df, str(tmp_path), nb_folds=3)
    assert folder.endswith("3_folds")
    fold_dfs = load_fold_csvs(folder, 3)
    for f in fold_dfs:
        assert list(f.columns) == [
            "rgbclips_path",
            "x_axis_flowclips_path",
            "y_axis_flowclips_path",
            "class",
        ]
    total = sum(len(f) for f in fold_dfs)
    assert total == len(df)
    hist = fold_class_histograms(df, folds_scenes, 4)
    assert hist.sum() == len(df)
    # greedy stratification: every fold gets clips
    assert (hist.sum(axis=1) > 0).all()


def test_split_matrix(synth_root, tmp_path):
    _, df = synth_root
    folds_scenes = assign_scenes_to_folds(scene_labels_from_dataframe(df), 4)
    fold_dfs = make_fold_dataframes(df, folds_scenes)
    entries = write_split_matrix(fold_dfs, str(tmp_path))
    assert len(entries) == len(split_pairs(4)) == 12
    t, v, d = entries[0]
    split = build_split(fold_dfs, t, v)
    n_train = len(split["train"])
    n_expected = sum(len(fold_dfs[i]) for i in range(4) if i not in (t, v))
    assert n_train == n_expected
    assert os.path.exists(os.path.join(d, "train.csv"))
    # train/val/test clip paths are disjoint
    s = [set(split[k]["rgbclips_path"]) for k in ("train", "val", "test")]
    assert not (s[0] & s[1]) and not (s[0] & s[2]) and not (s[1] & s[2])


def test_pipeline_determinism_and_padding(synth_root):
    _, df = synth_root
    fold = df.rename(columns={"label": "class"})[
        ["rgbclips_path", "x_axis_flowclips_path", "y_axis_flowclips_path", "class"]
    ]
    spec = SampleSpec(num_frames=8, staging_hw=(32, 32))
    pipe = BatchPipeline(fold, spec, batch_size=8, seed=42, num_workers=2)
    b1 = list(pipe.batches(epoch=0))
    b2 = list(pipe.batches(epoch=0))
    assert len(b1) == len(pipe)
    np.testing.assert_array_equal(b1[0]["rgb"], b2[0]["rgb"])
    np.testing.assert_array_equal(b1[0]["index"], b2[0]["index"])
    # different epoch → different order
    b3 = list(pipe.batches(epoch=1))
    assert not np.array_equal(b1[0]["index"], b3[0]["index"])
    # last batch padded, mask correct
    n = len(fold)
    last = b1[-1]
    n_valid = n - (len(pipe) - 1) * 8
    assert last["valid"].sum() == n_valid
    assert last["rgb"].shape == (8, 8, 32, 32, 3)
    assert last["rgb"].dtype == np.uint8


def test_pipeline_tiling_for_on_the_fly_augmentation(synth_root):
    _, df = synth_root
    fold = df.rename(columns={"label": "class"})
    spec = SampleSpec(num_frames=4, staging_hw=(16, 16))
    pipe = BatchPipeline(fold, spec, batch_size=4, augmentation_frequency=3, num_workers=2)
    idx = pipe.epoch_indices(0)
    assert len(idx) == 3 * len(fold)
    counts = np.bincount(idx)
    assert (counts == 3).all()


def test_expand_precomputed_augmentation(synth_root):
    _, df = synth_root
    fold = df.rename(columns={"label": "class"}).copy()
    fold["rgbclips_augmented_0_path"] = fold["rgbclips_path"] + "_aug0"
    fold["rgbclips_augmented_1_path"] = fold["rgbclips_path"] + "_aug1"
    merged = expand_precomputed_augmentation(fold, 2)
    assert len(merged) == 3 * len(fold)
    assert (merged["class"].values[: len(fold)] == fold["class"].values).all()


def test_class_weights_balanced():
    labels = [0, 0, 0, 1]
    w = class_weights_balanced(labels, 2)
    np.testing.assert_allclose(w, [4 / (2 * 3), 4 / (2 * 1)])


def test_decode_pad_cycle_rule():
    """Short-decode padding must cycle [f0, f1, ...] over the decoded
    prefix (the select_frame_indices rule), not repeat f0 forever."""
    from crowded_scenes_ensemble_classification_tpu.data.video_io import _pad_cycle

    frames = [np.full((2, 2, 3), i, np.uint8) for i in range(5)]
    padded = _pad_cycle(list(frames), 8)
    got = [int(f[0, 0, 0]) for f in padded]
    assert got == [0, 1, 2, 3, 4, 0, 1, 2]
    # longer-than-one-cycle padding
    padded = _pad_cycle(frames[:2], 7)
    assert [int(f[0, 0, 0]) for f in padded] == [0, 1, 0, 1, 0, 1, 0]


def test_ragged_wire_roundtrip():
    """data.wire_format: host pack → device unpack reproduces exactly the
    padded window buffer pack_windows_host builds (same keys/decisions),
    at ~65% of the dense bytes."""
    import jax
    import jax.numpy as jnp

    from crowded_scenes_ensemble_classification_tpu.data.wire_format import (
        make_wire_unpack,
        pack_ragged_windows,
        plan_wire_steps,
    )
    from crowded_scenes_ensemble_classification_tpu.ops.augment import (
        decode_time_eval_resize_u8,
        pack_windows_host,
    )

    B, T, STG, OUT = 6, 3, 80, 56
    rng = np.random.default_rng(3)
    staging_all = rng.integers(0, 255, (B, T, STG, STG, 3)).astype(np.uint8)
    eval_all = np.stack(
        [decode_time_eval_resize_u8(c, (OUT, OUT)) for c in staging_all]
    )
    key = jax.random.key(9)
    # margin 30: crop window 50 < out 56 so ragged saves bytes, and both
    # gate outcomes occur at tiny sizes
    plan = plan_wire_steps(
        key, 2, B, T, (STG, STG), (OUT, OUT), p=0.75, crop_margin=30
    )
    assert plan.cap < B * plan.full_bytes  # ragged actually saves bytes

    for step in range(2):
        do_crop, y0, x0, offsets = plan.steps[step]
        wire, off = pack_ragged_windows(
            plan, step, staging_all[do_crop], eval_all[~do_crop]
        )
        step_key = jax.random.fold_in(key, step)
        got = np.asarray(
            jax.jit(make_wire_unpack(plan))(
                jnp.asarray(wire), jnp.asarray(off), step_key
            )
        )
        want = pack_windows_host(
            staging_all, eval_all, do_crop, y0, x0, (OUT, OUT), crop_margin=30
        )
        np.testing.assert_array_equal(got, want, err_msg=f"step {step}")


def test_ragged_wire_all_crop_cap_floor():
    """An all-crop plan (p=1 or an unlucky small batch) has cap <
    B·full_bytes — the device unpack still dynamic-slices a FULL-size
    window at every offset, so the capacity must be floored at
    full_bytes (regression: negative `cap - full_bytes` broke tracing)."""
    import jax
    import jax.numpy as jnp

    from crowded_scenes_ensemble_classification_tpu.data.wire_format import (
        make_wire_unpack,
        pack_ragged_windows,
        plan_wire_steps,
    )
    from crowded_scenes_ensemble_classification_tpu.ops.augment import (
        decode_time_eval_resize_u8,
        pack_windows_host,
    )

    B, T, STG, OUT = 1, 2, 80, 56
    rng = np.random.default_rng(11)
    staging_all = rng.integers(0, 255, (B, T, STG, STG, 3)).astype(np.uint8)
    eval_all = np.stack(
        [decode_time_eval_resize_u8(c, (OUT, OUT)) for c in staging_all]
    )
    key = jax.random.key(4)
    plan = plan_wire_steps(
        key, 3, B, T, (STG, STG), (OUT, OUT), p=1.0, crop_margin=30
    )
    assert all(plan.steps[s][0].all() for s in range(3))  # all-crop plan
    assert plan.cap >= plan.full_bytes
    for step in range(3):
        do_crop, y0, x0, _ = plan.steps[step]
        wire, off = pack_ragged_windows(
            plan, step, staging_all[do_crop], eval_all[~do_crop]
        )
        got = np.asarray(
            jax.jit(make_wire_unpack(plan))(
                jnp.asarray(wire), jnp.asarray(off), jax.random.fold_in(key, step)
            )
        )
        want = pack_windows_host(
            staging_all, eval_all, do_crop, y0, x0, (OUT, OUT), crop_margin=30
        )
        np.testing.assert_array_equal(got, want, err_msg=f"step {step}")


def test_ragged_wire_nonsquare_staging():
    """Non-square staging: the wire format derives the crop window per
    axis — (H−margin, W−margin) — exactly like ops.augment (regression:
    staging_hw[0] was used for both axes, silently mis-slicing W)."""
    import jax
    import jax.numpy as jnp

    from crowded_scenes_ensemble_classification_tpu.data.wire_format import (
        make_wire_unpack,
        pack_ragged_windows,
        plan_wire_steps,
    )
    from crowded_scenes_ensemble_classification_tpu.ops.augment import (
        decode_time_eval_resize_u8,
        pack_windows_host,
    )

    B, T = 5, 2
    STG_H, STG_W = 80, 104  # crop windows 50 x 74
    OUT = (56, 80)
    rng = np.random.default_rng(12)
    staging_all = rng.integers(0, 255, (B, T, STG_H, STG_W, 3)).astype(np.uint8)
    eval_all = np.stack(
        [decode_time_eval_resize_u8(c, OUT) for c in staging_all]
    )
    key = jax.random.key(21)
    plan = plan_wire_steps(
        key, 2, B, T, (STG_H, STG_W), OUT, p=0.6, crop_margin=30
    )
    assert plan.crop_hw == (50, 74)
    for step in range(2):
        do_crop, y0, x0, _ = plan.steps[step]
        wire, off = pack_ragged_windows(
            plan, step, staging_all[do_crop], eval_all[~do_crop]
        )
        got = np.asarray(
            jax.jit(make_wire_unpack(plan))(
                jnp.asarray(wire), jnp.asarray(off), jax.random.fold_in(key, step)
            )
        )
        want = pack_windows_host(
            staging_all, eval_all, do_crop, y0, x0, OUT, crop_margin=30
        )
        np.testing.assert_array_equal(got, want, err_msg=f"step {step}")


def test_i420_batch_pack_byte_identical():
    """wire_format.bgr_clips_to_i420_batch (ONE cvtColor for the whole
    batch) is byte-identical to stacking the per-clip bgr_clip_to_i420
    reference pack — including odd W (chroma blocks only need even H)."""
    from crowded_scenes_ensemble_classification_tpu.data.wire_format import (
        bgr_clip_to_i420,
        bgr_clips_to_i420_batch,
    )

    rng = np.random.default_rng(11)
    for B, T, H, W in ((3, 4, 24, 32), (2, 5, 16, 16)):
        clips = rng.integers(0, 256, (B, T, H, W, 3)).astype(np.uint8)
        want = np.stack([bgr_clip_to_i420(c) for c in clips])
        got = bgr_clips_to_i420_batch(clips)
        np.testing.assert_array_equal(got, want)


def test_i420_device_inverse_matches_cv2():
    """wire_format.i420_to_bgr_u8 undoes cv2's I420 encoding the way cv2
    itself does (nearest chroma upsample + studio-swing BT.601): within
    ±1 DN of cv2.COLOR_YUV2BGR_I420 on arbitrary I420 bytes (cv2 runs
    the same matrix in Q20 fixed point; we round the float form)."""
    import cv2
    import jax.numpy as jnp

    from crowded_scenes_ensemble_classification_tpu.data.wire_format import (
        i420_to_bgr_u8,
    )

    T, H, W = 3, 24, 32
    rng = np.random.default_rng(7)
    flat = rng.integers(0, 256, (T * H * W * 3 // 2,)).astype(np.uint8)
    got = np.asarray(i420_to_bgr_u8(jnp.asarray(flat), T, H, W)).astype(int)
    per_frame = flat.reshape(T, H * 3 // 2, W)
    want = np.stack(
        [cv2.cvtColor(f, cv2.COLOR_YUV2BGR_I420) for f in per_frame]
    ).astype(int)
    assert np.abs(got - want).max() <= 1


def test_ragged_wire_yuv420_roundtrip():
    """yuv420 wire: half the bytes of the rgb wire, and the device unpack
    reproduces exactly the cv2 I420 round-trip of every selected window
    (crop windows sliced bit-aligned from the even-origin superwindow;
    gates and origins re-derived from the same key) within the ±1 DN
    fixed-point-vs-float margin."""
    import cv2
    import jax
    import jax.numpy as jnp

    from crowded_scenes_ensemble_classification_tpu.data.wire_format import (
        _even_origin,
        make_wire_unpack,
        pack_ragged_windows,
        plan_wire_steps,
    )
    from crowded_scenes_ensemble_classification_tpu.ops.augment import (
        decode_time_eval_resize_u8,
    )

    def cv2_roundtrip(clip):
        return np.stack(
            [
                cv2.cvtColor(
                    cv2.cvtColor(np.ascontiguousarray(f), cv2.COLOR_BGR2YUV_I420),
                    cv2.COLOR_YUV2BGR_I420,
                )
                for f in clip
            ]
        )

    B, T, STG, OUT = 6, 3, 80, 56  # margin 30 -> crop window 50x50 (even-odd mix)
    rng = np.random.default_rng(5)
    staging_all = rng.integers(0, 255, (B, T, STG, STG, 3)).astype(np.uint8)
    eval_all = np.stack(
        [decode_time_eval_resize_u8(c, (OUT, OUT)) for c in staging_all]
    )
    key = jax.random.key(17)
    plan = plan_wire_steps(
        key, 2, B, T, (STG, STG), (OUT, OUT), p=0.75, crop_margin=30,
        colorspace="yuv420",
    )
    rgb_plan = plan_wire_steps(
        key, 2, B, T, (STG, STG), (OUT, OUT), p=0.75, crop_margin=30,
    )
    # exactly half the per-clip payloads
    assert plan.full_bytes * 2 == rgb_plan.full_bytes
    assert plan.crop_bytes * 2 < rgb_plan.crop_bytes * 1.1  # +2px superwindow
    ch, cw = plan.crop_hw
    sh, sw = plan.crop_ship_hw
    assert (sh % 2, sw % 2) == (0, 0) and sh >= ch and sw >= cw

    for step in range(2):
        do_crop, y0, x0, _ = plan.steps[step]
        wire, off = pack_ragged_windows(
            plan, step, staging_all[do_crop], eval_all[~do_crop]
        )
        got = np.asarray(
            jax.jit(make_wire_unpack(plan))(
                jnp.asarray(wire), jnp.asarray(off),
                jax.random.fold_in(key, step),
            )
        ).astype(int)
        for i in range(B):
            if do_crop[i]:
                j = int(np.nonzero(np.nonzero(do_crop)[0] == i)[0][0])
                ye = _even_origin(int(y0[i]), sh, STG)
                xe = _even_origin(int(x0[i]), sw, STG)
                sup = cv2_roundtrip(
                    staging_all[i, :, ye : ye + sh, xe : xe + sw]
                )
                dy, dx = int(y0[i]) - ye, int(x0[i]) - xe
                want = np.zeros((T, OUT, OUT, 3), int)
                want[:, :ch, :cw] = sup[:, dy : dy + ch, dx : dx + cw]
            else:
                want = cv2_roundtrip(eval_all[i]).astype(int)
            assert np.abs(got[i] - want).max() <= 1, f"step {step} clip {i}"


def test_ragged_wire_yuv420_smooth_content_quality():
    """On smooth natural-video-like content (gradient texture + small
    sensor noise — what real decoded frames look like), the yuv420 wire's
    lossy chroma costs ≤ a few DN through the FULL windowed-augment
    pipeline vs the rgb wire (salt/pepper replacements are key-identical
    across both, so differences are purely chroma)."""
    import jax
    import jax.numpy as jnp

    from crowded_scenes_ensemble_classification_tpu.data.wire_format import (
        make_wire_unpack,
        pack_ragged_windows,
        plan_wire_steps,
    )
    from crowded_scenes_ensemble_classification_tpu.ops.augment import (
        crowd11_augment_windowed_batch,
        decode_time_eval_resize_u8,
    )

    B, T, STG, OUT = 4, 2, 80, 56
    rng = np.random.default_rng(13)
    yy, xx = np.meshgrid(np.arange(STG), np.arange(STG), indexing="ij")
    base = (
        96
        + 60 * np.sin(yy / 17.0)
        + 50 * np.cos(xx / 23.0)
    )[None, None, :, :, None]
    clips = base + rng.normal(0, 3.0, (B, T, STG, STG, 3))
    staging_all = np.clip(clips, 0, 255).astype(np.uint8)
    eval_all = np.stack(
        [decode_time_eval_resize_u8(c, (OUT, OUT)) for c in staging_all]
    )
    key = jax.random.key(3)
    outs = {}
    for cs in ("rgb", "yuv420"):
        plan = plan_wire_steps(
            key, 1, B, T, (STG, STG), (OUT, OUT), p=0.6, crop_margin=30,
            colorspace=cs,
        )
        do_crop, _, _, _ = plan.steps[0]
        wire, off = pack_ragged_windows(
            plan, 0, staging_all[do_crop], eval_all[~do_crop]
        )
        step_key = jax.random.fold_in(key, 0)
        buf = jax.jit(make_wire_unpack(plan))(
            jnp.asarray(wire), jnp.asarray(off), step_key
        )
        outs[cs] = np.asarray(
            crowd11_augment_windowed_batch(
                buf.astype(jnp.float32), step_key, (OUT, OUT), (STG, STG),
                p=0.6, crop_margin=30,
            )
        )
    diff = np.abs(outs["rgb"] - outs["yuv420"])
    # The max is set by the per-channel-INDEPENDENT ±3 DN noise: 4:2:0
    # keeps one chroma sample per 2×2 block (top-left, cv2's own
    # subsampling), so a ±6 DN chroma swing within a block reconstructs
    # with ~2× matrix gain.  A real decoded frame's chroma is already
    # 4:2:0 at the source, so this term vanishes in production; the mean
    # (dominated by the smooth content) is the representative figure.
    assert diff.max() <= 24.0
    assert diff.mean() <= 2.5


def test_ragged_wire_yuv420_rejects_odd_dims():
    import jax
    import pytest as _pytest

    from crowded_scenes_ensemble_classification_tpu.data.wire_format import (
        plan_wire_steps,
    )

    with _pytest.raises(ValueError, match="even"):
        plan_wire_steps(
            jax.random.key(0), 1, 2, 2, (81, 80), (56, 56),
            colorspace="yuv420",
        )


def test_sharded_wire_matches_single_buffer_unpack():
    """Multi-chip ingest: per-shard ragged wires unpacked locally under
    shard_map (one wire row per data-mesh device) must reproduce the
    single-buffer unpack bit-for-bit — the downstream augment consumes
    either form unchanged.  Covers both wire colorspaces."""
    import jax

    from crowded_scenes_ensemble_classification_tpu.core.mesh import make_mesh
    from crowded_scenes_ensemble_classification_tpu.data.wire_format import (
        make_sharded_wire_unpack,
        make_wire_unpack,
        pack_ragged_windows,
        pack_sharded_wires,
        plan_wire_steps,
        shard_wire_plan,
    )

    n_shards, batch = 8, 16
    frames, staging_hw, out_hw, margin = 3, (32, 30), (24, 24), 8
    key = jax.random.key(7)
    mesh = make_mesh((("data", n_shards),))
    rng = np.random.default_rng(0)
    for cs in ("rgb", "yuv420"):
        plan = plan_wire_steps(
            key, 2, batch, frames, staging_hw, out_hw,
            p=0.6, crop_margin=margin, colorspace=cs,
        )
        splan = shard_wire_plan(plan, n_shards)
        ref_unpack = jax.jit(make_wire_unpack(plan))
        sh_unpack = jax.jit(make_sharded_wire_unpack(splan, mesh))
        for step in range(2):
            do_crop = plan.steps[step][0]
            staging = rng.integers(
                0, 255, (int(do_crop.sum()), frames, *staging_hw, 3), np.uint8
            )
            eval_u8 = rng.integers(
                0, 255, (int((~do_crop).sum()), frames, *out_hw, 3), np.uint8
            )
            wire, offs = pack_ragged_windows(plan, step, staging, eval_u8)
            wires, soffs = pack_sharded_wires(splan, step, staging, eval_u8)
            step_key = jax.random.fold_in(key, step)
            ref = np.asarray(ref_unpack(wire, offs, step_key))
            out = sh_unpack(wires, soffs, step_key)
            assert out.sharding.spec[0] == "data"
            np.testing.assert_array_equal(np.asarray(out), ref)


def test_shard_wire_plan_rejects_uneven_batch():
    import jax

    from crowded_scenes_ensemble_classification_tpu.data.wire_format import (
        plan_wire_steps,
        shard_wire_plan,
    )

    plan = plan_wire_steps(
        jax.random.key(0), 1, 6, 2, (32, 32), (24, 24), crop_margin=8
    )
    with pytest.raises(ValueError, match="divisible"):
        shard_wire_plan(plan, 4)


def test_sharded_wire_unpack_rejects_mesh_mismatch():
    """A plan sharded N ways on a mesh with a different data-axis size
    would silently read only wire_rows[0] per block and pair rows with
    the wrong clip keys — must refuse at build time."""
    import jax

    from crowded_scenes_ensemble_classification_tpu.core.mesh import make_mesh
    from crowded_scenes_ensemble_classification_tpu.data.wire_format import (
        make_sharded_wire_unpack,
        plan_wire_steps,
        shard_wire_plan,
    )

    plan = plan_wire_steps(
        jax.random.key(0), 1, 8, 2, (32, 32), (24, 24), crop_margin=8
    )
    splan = shard_wire_plan(plan, 4)
    mesh = make_mesh((("data", -1),))  # 8 devices ≠ 4 shards
    with pytest.raises(ValueError, match="mesh axis"):
        make_sharded_wire_unpack(splan, mesh)


def test_ragged_wire_rejects_crop_window_exceeding_out():
    """The windowed-augment wire ships each crop window inside an
    out_hw-sized buffer, so a geometry whose crop window exceeds out_hw
    (e.g. C3D's 112² with 256² staging) must be rejected loudly at plan
    time instead of failing deep inside the device unpack."""
    import jax

    from crowded_scenes_ensemble_classification_tpu.data.wire_format import (
        plan_wire_steps,
    )

    with pytest.raises(ValueError, match="exceeds out_hw"):
        plan_wire_steps(
            jax.random.key(21), 2, 1, 2, (64, 64), (24, 24), crop_margin=8
        )
    # raising the margin so the window fits makes the same geometry legal
    plan = plan_wire_steps(
        jax.random.key(21), 2, 1, 2, (64, 64), (24, 24), crop_margin=40
    )
    assert plan.crop_hw == (24, 24)


def test_prefetch_batches_early_exit_releases_producer(synth_root):
    """A consumer that takes only the first batches (e.g. static-int8
    calibration) must not leave the producer thread blocked on the full
    queue for the process lifetime, pinning staged uint8 batches."""
    import threading
    import time

    from crowded_scenes_ensemble_classification_tpu.data import prefetch_batches

    _, df = synth_root
    fold = df.rename(columns={"label": "class"})
    spec = SampleSpec(num_frames=4, staging_hw=(16, 16))
    pipe = BatchPipeline(fold, spec, batch_size=2, num_workers=2)
    assert len(pipe) > 4  # enough batches that the producer WOULD block

    before = threading.active_count()
    taken = []
    for batch in prefetch_batches(pipe, epoch=0):
        taken.append(batch)
        if len(taken) >= 2:
            break
    assert len(taken) == 2
    # the generator's finally clause joins the producer on early exit;
    # give lingering decode-pool threads a beat to retire
    deadline = time.time() + 30
    while threading.active_count() > before and time.time() < deadline:
        time.sleep(0.05)
    assert threading.active_count() <= before, (
        f"leaked threads: {[t.name for t in threading.enumerate()]}"
    )

    # the normal full-drain path still works after the fix
    n_full = sum(1 for _ in prefetch_batches(pipe, epoch=1))
    assert n_full == len(pipe)
