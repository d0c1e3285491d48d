"""Two-stream path with on-device Farnebäck (the FarneBack_onTheFly mode,
reference train.py:223-239) and with precomputed TV-L1 videos
(TVL1_precomputed, train.py:195-221)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from crowded_scenes_ensemble_classification_tpu.core.config import ClipSpec
from crowded_scenes_ensemble_classification_tpu.data import (
    BatchPipeline,
    SampleSpec,
    generate_synthetic_dataset,
)
from crowded_scenes_ensemble_classification_tpu.data.video_io import (
    decode_twostream_staging,
)
from crowded_scenes_ensemble_classification_tpu.models import TwoStreamI3D
from crowded_scenes_ensemble_classification_tpu.models.registry import ModelBundle
from crowded_scenes_ensemble_classification_tpu.train.engine import make_eval_step


@pytest.fixture(scope="module")
def video_dataset(tmp_path_factory):
    root = tmp_path_factory.mktemp("ts")
    df = generate_synthetic_dataset(
        str(root), num_scenes=4, clips_per_scene=2, num_classes=2,
        num_frames=20, hw=(48, 48), as_videos=True, write_flow=True,
    )
    return df.rename(columns={"label": "class"})


def test_decode_twostream_staging(video_dataset):
    path = video_dataset.iloc[0]["rgbclips_path"]
    staged = decode_twostream_staging(path, 8, (32, 32))
    assert staged["rgb"].shape == (8, 32, 32, 3)
    assert staged["gray"].shape == (8, 32, 32, 1)
    assert staged["gray_next"].shape == (8, 32, 32, 1)
    assert staged["rgb"].dtype == np.uint8
    # gray_next should be the frame AFTER each selected frame (different
    # unless the clip repeats frames)
    assert not np.array_equal(staged["gray"], staged["gray_next"])


def test_pipeline_onthefly_mode_batches(video_dataset):
    spec = SampleSpec(
        num_frames=8, staging_hw=(32, 32), two_stream=True, flow_precomputed=False
    )
    pipe = BatchPipeline(video_dataset, spec, batch_size=4, shuffle=False, num_workers=2)
    batch = next(pipe.batches(0))
    assert set(batch) >= {"rgb", "gray", "gray_next", "label", "valid"}
    assert batch["gray"].shape == (4, 8, 32, 32, 1)


def test_pipeline_precomputed_mode_batches(video_dataset):
    spec = SampleSpec(
        num_frames=8, staging_hw=(32, 32), two_stream=True, flow_precomputed=True
    )
    pipe = BatchPipeline(video_dataset, spec, batch_size=4, shuffle=False, num_workers=2)
    batch = next(pipe.batches(0))
    assert batch["flow"].shape == (4, 8, 32, 32, 2)


def tiny_ts_bundle():
    return ModelBundle(
        model_type="TWOSTREAM_I3D",
        module=TwoStreamI3D(num_classes=2),
        clip=ClipSpec(frames=16, height=64, width=64, flow_channels=2),
        num_classes=2,
        two_stream=True,
    )


def test_twostream_eval_with_device_farneback(video_dataset):
    """Full two-stream forward where the flow stream is computed on device
    from the staged gray pairs — no flow files touched."""
    bundle = tiny_ts_bundle()
    variables = bundle.module.init(
        jax.random.key(0),
        jnp.zeros((1, 16, 64, 64, 3)),
        jnp.zeros((1, 16, 64, 64, 2)),
        train=False,
    )
    spec = SampleSpec(
        num_frames=16, staging_hw=(64, 64), two_stream=True, flow_precomputed=False
    )
    pipe = BatchPipeline(
        video_dataset.iloc[:2], spec, batch_size=2, shuffle=False, num_workers=2
    )
    step = make_eval_step(bundle, (64, 64))
    batch = next(pipe.batches(0))
    out = step(variables, batch)
    assert out["probs"].shape == (2, 2)
    assert np.isfinite(float(out["loss_sum"]))


# ----------------------------------------------------------------------
# Exact augmented-Farnebäck mode (flow_from_augmented=True): the
# reference's augmented_onTheFly + FarneBack_onTheFly path computes flow
# from the AUGMENTED frames (train.py:176-184).
# ----------------------------------------------------------------------


def test_gray_pair_augment_matches_rgb_decisions():
    """crowd11_augment_gray_pair_batch applies bit-identical crop/flip
    decisions to the ones the rgb stream derives from the same key."""
    from crowded_scenes_ensemble_classification_tpu.ops.augment import (
        crowd11_augment,
        crowd11_augment_gray_pair_batch,
    )

    rng = np.random.default_rng(3)
    b, t, h, w = 3, 4, 96, 96
    gray = rng.integers(0, 256, (b, t, h, w, 1)).astype(np.float32)
    gray_next = rng.integers(0, 256, (b, t, h, w, 1)).astype(np.float32)
    key = jax.random.key(7)

    got_g, got_gn = crowd11_augment_gray_pair_batch(
        jnp.asarray(gray), jnp.asarray(gray_next), key, p=0.75,
        apply_noise=False,
    )
    keys = jax.random.split(key, b)
    for i in range(b):
        # feed the gray frame as a 1-channel clip through the rgb-path
        # augmenter at the staging resolution: spatial transforms must match
        want = crowd11_augment(
            jnp.asarray(gray[i]), keys[i], (h, w), p=0.75, apply_noise=False
        )
        np.testing.assert_allclose(np.asarray(got_g[i]), np.asarray(want), atol=1e-4)


def test_gray_pair_noise_streams_differ():
    """Salt/pepper draws are stream-tagged: gray and gray_next get
    independent noise (the reference drew per-frame noise; pair frames are
    distinct frames)."""
    from crowded_scenes_ensemble_classification_tpu.ops.augment import (
        crowd11_augment_gray_pair_batch,
    )

    g = jnp.full((2, 3, 72, 72, 1), 128.0)
    got_g, got_gn = crowd11_augment_gray_pair_batch(
        g, g, jax.random.key(0), p=1.0
    )
    # same base pixels, same decisions, but noise masks must differ
    assert not np.array_equal(np.asarray(got_g), np.asarray(got_gn))
    # density sanity: ~1% salt + ~1% pepper
    frac = float(np.mean(np.asarray(got_g) != 128.0))
    assert 0.005 < frac < 0.05


def test_flow_from_augmented_changes_flow_not_rgb():
    """_preprocess(flow_from_augmented=True) changes only the flow stream
    (rgb already augmented identically in both modes)."""
    from crowded_scenes_ensemble_classification_tpu.train.engine import _preprocess

    rng_np = np.random.default_rng(11)
    batch = {
        "rgb": rng_np.integers(0, 256, (2, 8, 80, 80, 3)).astype(np.uint8),
        "gray": rng_np.integers(0, 256, (2, 8, 80, 80, 1)).astype(np.uint8),
        "gray_next": rng_np.integers(0, 256, (2, 8, 80, 80, 1)).astype(np.uint8),
    }
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    key = jax.random.key(5)
    kw = dict(out_hw=(64, 64), augment=True, p=1.0, two_stream=True)
    base = _preprocess(batch, key, flow_from_augmented=False, **kw)
    exact = _preprocess(batch, key, flow_from_augmented=True, **kw)
    np.testing.assert_array_equal(np.asarray(base["rgb"]), np.asarray(exact["rgb"]))
    assert not np.array_equal(np.asarray(base["flow"]), np.asarray(exact["flow"]))


def test_flow_from_augmented_e2e_drift(video_dataset, tmp_path):
    """E2E drift quantification (VERDICT r3 #4): train the same tiny
    TwoStream under both flow modes, evaluate both on the same clips, and
    measure how far the cached predictions drift."""
    from crowded_scenes_ensemble_classification_tpu.train.engine import (
        evaluate_model,
        fit,
    )

    spec = SampleSpec(
        num_frames=16, staging_hw=(64, 64), two_stream=True, flow_precomputed=False
    )
    df = video_dataset.iloc[:4]
    train_pipe = BatchPipeline(df, spec, batch_size=4, shuffle=False, num_workers=2)
    val_pipe = BatchPipeline(df, spec, batch_size=4, shuffle=False, num_workers=2)

    probs = {}
    for mode in (False, True):
        bundle = tiny_ts_bundle()
        res = fit(
            bundle,
            train_pipe,
            val_pipe,
            epochs=1,
            seed=0,
            augment=True,
            input_scale=1.0 / 255.0,
            flow_from_augmented=mode,
        )
        out = evaluate_model(
            bundle,
            res["state"].variables(),
            val_pipe,
            (64, 64),
            collect_probs=True,
            input_scale=1.0 / 255.0,
        )
        assert np.all(np.isfinite(out["probs"]))
        probs[mode] = out["probs"]
    # Evaluation is unaugmented in both modes, so drift comes purely from
    # the training-time flow semantics.  Quantify, and sanity-bound it.
    drift = float(np.mean(np.abs(probs[True] - probs[False])))
    assert 0.0 <= drift < 1.0


def test_flow_computed_at_reference_scale():
    """On-device Farnebäck from >224 staging runs at the reference's
    max-dim-224 scale (opticalflow_FarneBack_extractor, train.py:304-307):
    a 3 px shift at 240² staging must read ≈ 3·224/240 = 2.8 px in the
    resized flow maps — 224-scale pixel units, NOT staging-pixel units
    (the pre-fix behaviour computed flow at staging resolution, so the
    same motion read ≈ 3.0 px)."""
    from crowded_scenes_ensemble_classification_tpu.train.engine import _preprocess

    h = w = 240
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float64)

    def tex(x, y):
        v = np.zeros_like(x)
        for fx, fy, ph in [(0.031, 0.017, 0.3), (0.011, 0.041, 1.1), (0.023, 0.009, 2.0)]:
            v += np.sin(2 * np.pi * (fx * x + fy * y) + ph)
        return (v - v.min()) / (v.max() - v.min()) * 255.0

    g0, g1, g2 = tex(xx, yy), tex(xx - 3.0, yy), tex(xx - 6.0, yy)
    gray = np.stack([g0, g1])[None, ..., None].astype(np.float32)
    gray_next = np.stack([g1, g2])[None, ..., None].astype(np.float32)
    batch = {
        "rgb": np.zeros((1, 2, h, w, 3), np.uint8),
        "gray": jnp.asarray(gray),
        "gray_next": jnp.asarray(gray_next),
    }
    out = _preprocess(
        batch, jax.random.key(0), (224, 224), augment=False, p=0.75, two_stream=True
    )
    assert out["flow"].shape == (1, 2, 224, 224, 2)
    u = np.asarray(out["flow"])[0, :, 16:-16, 16:-16, 0]
    med = abs(float(np.median(u)))
    want = 3.0 * 224.0 / 240.0  # 2.8
    assert abs(med - want) < 0.2, med
    assert abs(med - 3.0) > 0.1, med  # must NOT be staging-pixel units
