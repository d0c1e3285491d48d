"""Checkpoint readiness drill smoke (VERDICT r3 #6): file:// URLs over
synthetic reference-layout checkpoints drive the full fetch → checksum →
convert → golden-parity → probs-cache chain today, so the day egress opens
real-weights parity is one command (`convert --drill checkpoint_urls.json`).
"""

from __future__ import annotations

import hashlib
import json
import os

import numpy as np
import pytest

from crowded_scenes_ensemble_classification_tpu.models import weights_io as wio
from crowded_scenes_ensemble_classification_tpu.models.checkpoint_drill import (
    run_drill,
)

from oracle_i3d import random_i3d_h5_layers
from oracle_r3d import random_r3d_h5_layers


def _sha(path):
    return hashlib.sha256(open(path, "rb").read()).hexdigest()


@pytest.fixture(scope="module")
def drill_env(tmp_path_factory):
    """Synthetic I3D rgb checkpoint behind a file:// URL + an R3D-18
    checkpoint; C3D is left blocked (no URL, nothing pre-placed) to cover
    the blocked path."""
    root = tmp_path_factory.mktemp("drill")
    src = root / "src"
    os.makedirs(src)
    i3d_layers = random_i3d_h5_layers(seed=61, stream="rgb", num_classes=11)
    i3d_layers.pop("predictions")  # no-top, like the real release files
    i3d_h5 = wio.write_keras_h5(str(src / "i3d_rgb.h5"), i3d_layers)
    r3d_layers = random_r3d_h5_layers(seed=62, depth=18, num_classes=11)
    r3d_h5 = wio.write_keras_h5(str(src / "r3d18.h5"), r3d_layers)

    spec = {
        "families": [
            {
                "family": "I3D",
                "model_type": "I3D",
                "probs_hw": [64, 64],
                "streams": {
                    "rgb": {
                        "url": "file://" + i3d_h5,
                        "filename": "drill_i3d_rgb.h5",
                        "sha256": _sha(i3d_h5),
                    }
                },
            },
            {
                "family": "R3D_18",
                "model_type": "R3D_18",
                "probs_hw": [64, 64],
                "streams": {
                    "rgb": {
                        "url": "file://" + r3d_h5,
                        "filename": "drill_r3d18.h5",
                        "sha256": _sha(r3d_h5),
                    }
                },
            },
            {
                "family": "C3D",
                "model_type": "C3D",
                "streams": {
                    "rgb": {"url": None, "filename": "absent_sports1M.h5", "sha256": None}
                },
            },
            {"family": "R3D_scratch", "model_type": "R3D_34", "streams": {}},
        ]
    }
    spec_path = root / "spec.json"
    with open(spec_path, "w") as f:
        json.dump(spec, f)
    return {"spec": str(spec_path), "root": str(root), "i3d_h5": i3d_h5}


@pytest.mark.slow
def test_drill_end_to_end(drill_env):
    report = run_drill(
        drill_env["spec"],
        os.path.join(drill_env["root"], "work"),
        cache_dir=os.path.join(drill_env["root"], "cache"),
        probs_clips=2,
    )
    fams = report["families"]
    # I3D + R3D_18: the full chain succeeds with verified checksums
    for mt in ("I3D", "R3D_18"):
        entry = fams[mt]
        assert entry["status"] == "ok", entry
        assert entry["steps"]["parity"]["ok"]
        assert entry["steps"]["parity"]["max_softmax_delta"] <= 1e-4
        probs = np.load(entry["steps"]["probs"]["path"])["probs"]
        assert probs.shape[0] == 1 and probs.shape[1] == 2
        np.testing.assert_allclose(probs.sum(-1), 1.0, atol=1e-5)
    # C3D: blocked (absent local file), never failed
    assert fams["C3D"]["status"] == "blocked"
    # scratch family: explicitly skipped
    assert fams["R3D_34"]["status"] == "skipped"
    assert os.path.exists(report["report_path"])


def test_drill_detects_checksum_mismatch(drill_env, tmp_path):
    spec = json.load(open(drill_env["spec"]))
    bad = [f for f in spec["families"] if f["model_type"] == "I3D"]
    bad[0]["streams"]["rgb"]["sha256"] = "0" * 64
    bad[0]["streams"]["rgb"]["filename"] = "drill_i3d_rgb_bad.h5"
    spec["families"] = bad
    spec_path = tmp_path / "bad_spec.json"
    with open(spec_path, "w") as f:
        json.dump(spec, f)
    report = run_drill(
        str(spec_path), str(tmp_path / "work"), cache_dir=str(tmp_path / "cache")
    )
    assert report["families"]["I3D"]["status"] == "failed"


def test_shipped_spec_parses_and_covers_all_families():
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(repo, "checkpoint_urls.json")) as f:
        spec = json.load(f)
    types = {f["model_type"] for f in spec["families"]}
    assert types == {"I3D", "TWOSTREAM_I3D", "C3D", "R3D_18"}
    # the I3D URLs mirror the reference WEIGHTS_PATH_NO_TOP table
    from crowded_scenes_ensemble_classification_tpu.models.weights_registry import (
        WEIGHTS_PATH_NO_TOP,
    )

    by_type = {f["model_type"]: f for f in spec["families"]}
    assert (
        by_type["I3D"]["streams"]["rgb"]["url"]
        == WEIGHTS_PATH_NO_TOP["rgb_imagenet_and_kinetics"]
    )
    assert (
        by_type["TWOSTREAM_I3D"]["streams"]["flow"]["url"]
        == WEIGHTS_PATH_NO_TOP["flow_imagenet_and_kinetics"]
    )
