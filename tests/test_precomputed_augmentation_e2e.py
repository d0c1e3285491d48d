"""augmented_precomputed end-to-end: prepare_ensemble runs the offline
augmenter (mp4 outputs + CSV columns), the split pipelines expand the
augmented rows, and a member trains on the merged set — the reference's
augmented_precomputed mode through the whole orchestration stack
(launch_train_ensemble.py:110-111 + train.py augment_dataframe)."""

import math
import os

import numpy as np
import optax
import pandas as pd
import pytest

from crowded_scenes_ensemble_classification_tpu.core.config import (
    ClipSpec,
    ExperimentConfig,
)
from crowded_scenes_ensemble_classification_tpu.data import generate_synthetic_dataset
from crowded_scenes_ensemble_classification_tpu.models import C3D
from crowded_scenes_ensemble_classification_tpu.models.registry import ModelBundle
from crowded_scenes_ensemble_classification_tpu.orchestration import (
    _pipelines_for_split,
    prepare_ensemble,
    train_member,
)


def test_precomputed_augmentation_end_to_end(tmp_path):
    df = generate_synthetic_dataset(
        str(tmp_path / "data"), num_scenes=6, clips_per_scene=2, num_classes=2,
        num_frames=8, hw=(64, 64), as_videos=True,
    )
    cfg = ExperimentConfig(
        model_type="C3D",
        folds_number=3,
        num_classes=2,
        batch_size=4,
        epochs=1,
        augmentation_status="augmented_precomputed",
        augmentation_frequency=2,
    )
    layout = prepare_ensemble(cfg, df, str(tmp_path / "work"))

    # offline augmenter ran: fold CSVs gained the augmented columns and the
    # mp4s exist
    fold0 = pd.read_csv(
        os.path.join(layout.folds_dir, "3_folds", "fold0.csv")
    )
    assert "rgbclips_augmented_1_path" in fold0.columns
    assert all(os.path.exists(p) for p in fold0["rgbclips_augmented_0_path"])

    # ...but split CSVs keep the base columns; expansion happens at
    # pipeline construction (train split only)
    pipes = _pipelines_for_split(cfg, layout, 0, 1, staging_hw=(48, 48), num_workers=2)
    base_rows = sum(
        len(pd.read_csv(layout.split_csv(0, 1, n))) for n in ("train",)
    )
    assert len(pipes["train"].df) == 3 * base_rows  # 1 + Freq2 copies
    assert len(pipes["val"].df) == len(pd.read_csv(layout.split_csv(0, 1, "val")))

    bundle = ModelBundle(
        "C3D", C3D(num_classes=2, width=0.125), ClipSpec(16, 32, 32), 2, False
    )
    out = train_member(
        cfg, layout, 0, 1,
        epochs=1, bundle=bundle, input_scale=1 / 255.0,
        staging_hw=(48, 48), num_workers=2,
        optimizer=optax.inject_hyperparams(optax.adam)(learning_rate=2e-3),
    )
    assert math.isfinite(out["test_loss"])
