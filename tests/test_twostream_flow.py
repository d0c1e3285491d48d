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
