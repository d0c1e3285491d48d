"""Failure-recovery test (SURVEY.md §5): interrupt training, resume from
the full-state checkpoint, and verify the run continues exactly (same epoch
count, optimizer state preserved)."""

import math

import numpy as np
import optax
import pytest

from crowded_scenes_ensemble_classification_tpu.core.config import ClipSpec
from crowded_scenes_ensemble_classification_tpu.data import (
    BatchPipeline,
    SampleSpec,
    generate_synthetic_dataset,
)
from crowded_scenes_ensemble_classification_tpu.models import C3D
from crowded_scenes_ensemble_classification_tpu.models.registry import ModelBundle
from crowded_scenes_ensemble_classification_tpu.train import fit, LRPolicy


def bundle3():
    return ModelBundle(
        model_type="C3D",
        module=C3D(num_classes=3, width=0.125),
        clip=ClipSpec(frames=16, height=32, width=32),
        num_classes=3,
        two_stream=False,
    )


def _tx():
    return optax.inject_hyperparams(optax.adam)(learning_rate=2e-3)


def test_interrupt_and_resume(tmp_path):
    root = tmp_path / "data"
    df = generate_synthetic_dataset(
        str(root), num_scenes=6, clips_per_scene=3, num_classes=3,
        num_frames=16, hw=(36, 36), as_videos=False,
    ).rename(columns={"label": "class"})
    spec = SampleSpec(num_frames=16, staging_hw=(36, 36))
    tr = BatchPipeline(df.iloc[:12], spec, batch_size=6, seed=1, num_workers=2)
    va = BatchPipeline(df.iloc[12:], spec, batch_size=6, shuffle=False, num_workers=2)
    ckpt = str(tmp_path / "ckpt")

    common = dict(
        seed=0,
        input_scale=1 / 255.0,
        lr_policy=LRPolicy(initial_lr=2e-3),
        checkpoint_dir=ckpt,
        save_full_every=1,
    )

    # "crash" after 2 epochs
    first = fit(bundle3(), tr, va, epochs=2, optimizer=_tx(), **common)
    assert len(first["history"]["loss"]) == 2
    step_after_2 = int(first["state"].step)

    # resume and run to 4 total epochs
    second = fit(
        bundle3(), tr, va, epochs=4, optimizer=_tx(), resume_full=True, **common
    )
    hist = second["history"]
    # history carried over: 2 old + 2 new epochs
    assert len(hist["loss"]) == 4
    np.testing.assert_allclose(hist["loss"][:2], first["history"]["loss"])
    # optimizer step counter continued (no restart from 0)
    assert int(second["state"].step) == 2 * step_after_2
    assert math.isfinite(hist["loss"][-1])


def test_fresh_run_ignores_resume_flag_when_no_checkpoint(tmp_path):
    root = tmp_path / "data"
    df = generate_synthetic_dataset(
        str(root), num_scenes=4, clips_per_scene=2, num_classes=2,
        num_frames=16, hw=(36, 36), as_videos=False,
    ).rename(columns={"label": "class"})
    spec = SampleSpec(num_frames=16, staging_hw=(36, 36))
    tr = BatchPipeline(df.iloc[:6], spec, batch_size=6, seed=1, num_workers=2)
    va = BatchPipeline(df.iloc[6:], spec, batch_size=6, shuffle=False, num_workers=2)
    out = fit(
        bundle3(), tr, va, epochs=1, optimizer=_tx(), resume_full=True,
        checkpoint_dir=str(tmp_path / "none"), input_scale=1 / 255.0,
        lr_policy=LRPolicy(initial_lr=2e-3),
    )
    assert len(out["history"]["loss"]) == 1


def test_nan_guard_stops_training(tmp_path):
    """Fault injection: a divergent optimizer must trip the NaN/inf guard
    (the reference imported TerminateOnNaN but never wired it — here it
    works, SURVEY.md §5)."""
    import optax

    root = tmp_path / "data"
    from crowded_scenes_ensemble_classification_tpu.data import (
        generate_synthetic_dataset,
    )

    df = generate_synthetic_dataset(
        str(root), num_scenes=4, clips_per_scene=2, num_classes=2,
        num_frames=16, hw=(36, 36), as_videos=False,
    ).rename(columns={"label": "class"})
    from crowded_scenes_ensemble_classification_tpu.data import (
        BatchPipeline,
        SampleSpec,
    )

    spec = SampleSpec(num_frames=16, staging_hw=(36, 36))
    tr = BatchPipeline(df.iloc[:6], spec, batch_size=6, seed=1, num_workers=2)
    va = BatchPipeline(df.iloc[6:], spec, batch_size=6, shuffle=False, num_workers=2)
    out = fit(
        bundle3(),
        tr,
        va,
        epochs=10,
        optimizer=optax.inject_hyperparams(optax.sgd)(learning_rate=1e18),
        input_scale=1 / 255.0,
        lr_policy=LRPolicy(initial_lr=1e18),
    )
    hist = out["history"]
    # guard fired: training stopped long before 10 epochs on a non-finite loss
    assert len(hist["loss"]) < 10
    assert not math.isfinite(hist["loss"][-1])
