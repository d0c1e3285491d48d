"""CLI surface tests: parser coverage of the reference's flag surfaces and
the folds/augment-lite paths (no training — that's test_end_to_end)."""

import os

import numpy as np
import pandas as pd
import pytest

from crowded_scenes_ensemble_classification_tpu.cli.main import build_parser, main
from crowded_scenes_ensemble_classification_tpu.data import generate_synthetic_dataset
from crowded_scenes_ensemble_classification_tpu.data.crowd11 import build_clip_table


def test_parser_covers_reference_choices():
    parser = build_parser()
    args = parser.parse_args(
        [
            "train",
            "--work-dir", "/tmp/x",
            "--model-type", "TWOSTREAM_I3D",
            "--training-condition", "_PRETRAINED",
            "--augmentation-status", "augmented_precomputed",
            "--optical-flow-status", "TVL1_precomputed",
            "--classes-status", "balanced",
            "--test-index", "0",
            "--val-index", "1",
        ]
    )
    assert args.model_type == "TWOSTREAM_I3D"
    with pytest.raises(SystemExit):
        parser.parse_args(["train", "--work-dir", "/tmp/x", "--model-type", "BOGUS",
                           "--test-index", "0", "--val-index", "1"])


def test_folds_command(tmp_path):
    data_dir = tmp_path / "data"
    df = generate_synthetic_dataset(
        str(data_dir), num_scenes=6, clips_per_scene=2, num_classes=3,
        num_frames=6, hw=(32, 32), as_videos=True,
    )
    rc = main(
        [
            "folds",
            "--dataset-directory", str(data_dir),
            "--parent-folds-folder", str(tmp_path / "folds"),
            "--folds-number", "3",
        ]
    )
    assert rc == 0
    fold0 = pd.read_csv(tmp_path / "folds" / "3_folds" / "fold0.csv")
    assert list(fold0.columns) == [
        "rgbclips_path",
        "x_axis_flowclips_path",
        "y_axis_flowclips_path",
        "class",
    ]


def test_build_clip_table_filename_convention(tmp_path):
    data_dir = tmp_path / "data"
    generate_synthetic_dataset(
        str(data_dir), num_scenes=4, clips_per_scene=2, num_classes=2,
        num_frames=4, hw=(16, 16), as_videos=True,
    )
    table = build_clip_table(str(data_dir))
    assert len(table) == 8
    assert set(table["label"]) == {0, 1}
    assert all(table["x_axis_flowclips_path"].str.endswith("_x.avi"))


def test_launch_commands_runner(tmp_path):
    data_dir = tmp_path / "data"
    generate_synthetic_dataset(
        str(data_dir), num_scenes=6, clips_per_scene=2, num_classes=3,
        num_frames=6, hw=(32, 32), as_videos=True,
    )
    rc = main(
        [
            "launch",
            "--work-dir", str(tmp_path / "work"),
            "--dataset-directory", str(data_dir),
            "--folds-number", "3",
            "--num-classes", "3",
            "--runner", "commands",
        ]
    )
    assert rc == 0
    assert os.path.exists(tmp_path / "work" / "experiment.json")
