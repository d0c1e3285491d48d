"""Offline augmentation pipeline tests: mp4 outputs, CSV column updates,
idempotency, update_links mode (reference augment_dataset.py semantics)."""

import os

import numpy as np
import pandas as pd
import pytest

from crowded_scenes_ensemble_classification_tpu.data import (
    generate_folds,
    generate_synthetic_dataset,
)
from crowded_scenes_ensemble_classification_tpu.data.augment_offline import (
    augment_folds,
    augment_video_file,
)
from crowded_scenes_ensemble_classification_tpu.data.video_io import decode_clip


@pytest.fixture(scope="module")
def folds_setup(tmp_path_factory):
    root = tmp_path_factory.mktemp("offaug")
    df = generate_synthetic_dataset(
        str(root / "data"), num_scenes=4, clips_per_scene=2, num_classes=2,
        num_frames=6, hw=(48, 64), as_videos=True,
    )
    folds_folder, _ = generate_folds(df, str(root / "folds"), nb_folds=2)
    return root, folds_folder


def test_augment_video_file(folds_setup, tmp_path):
    root, folds_folder = folds_setup
    src = pd.read_csv(os.path.join(folds_folder, "fold0.csv"))["rgbclips_path"][0]
    import jax

    dst = str(tmp_path / "aug.mp4")
    augment_video_file(src, dst, jax.random.key(0))
    clip = decode_clip(dst, 6, None)
    # offline policy resizes to 224 (augment_dataset.py:78)
    assert clip.shape == (6, 224, 224, 3)


def test_augment_folds_columns_and_idempotency(folds_setup):
    root, folds_folder = folds_setup
    aug_dir = str(root / "augmented")
    augment_folds(folds_folder, aug_dir, nb_folds=2, augmentation_frequency=2)

    for i in range(2):
        df = pd.read_csv(os.path.join(folds_folder, f"fold{i}.csv"))
        assert "rgbclips_augmented_0_path" in df.columns
        assert "rgbclips_augmented_1_path" in df.columns
        for p in df["rgbclips_augmented_0_path"]:
            assert os.path.exists(p), p
            assert p.endswith("_augmented_0.mp4")

    # idempotent: re-run must not re-encode (mtimes unchanged)
    df = pd.read_csv(os.path.join(folds_folder, "fold0.csv"))
    target = df["rgbclips_augmented_0_path"][0]
    mtime = os.path.getmtime(target)
    augment_folds(folds_folder, aug_dir, nb_folds=2, augmentation_frequency=2)
    assert os.path.getmtime(target) == mtime


def test_update_links_mode(folds_setup):
    root, folds_folder = folds_setup
    aug_dir2 = str(root / "augmented_moved")
    # update_links rewrites the CSV columns without encoding any videos
    augment_folds(
        folds_folder, aug_dir2, nb_folds=2, augmentation_frequency=1,
        operation="update_links",
    )
    df = pd.read_csv(os.path.join(folds_folder, "fold0.csv"))
    assert all(
        p.startswith(aug_dir2) for p in df["rgbclips_augmented_0_path"]
    )
    # no videos were actually encoded in update_links mode
    assert os.listdir(aug_dir2) == []
