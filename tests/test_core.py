"""Core layer tests: config naming parity, manifest round-trip, mesh
construction, PRNG determinism."""

import os

import jax
import numpy as np
import pytest

from crowded_scenes_ensemble_classification_tpu.core import (
    ArtifactRecord,
    ExperimentConfig,
    Manifest,
    clip_spec,
    member_val_indices,
    mesh as mesh_mod,
    prng,
    split_pairs,
)


def test_clip_specs_match_reference_geometry():
    """Canonical shapes from define_input (train.py:1566-1616)."""
    assert clip_spec("I3D").rgb_shape == (20, 224, 224, 3)
    assert clip_spec("TWOSTREAM_I3D").flow_shape == (20, 224, 224, 2)
    assert clip_spec("C3D").rgb_shape == (16, 112, 112, 3)
    assert clip_spec("R3D_152").rgb_shape == (16, 112, 112, 3)
    with pytest.raises(ValueError):
        clip_spec("NOPE")


def test_legacy_artifact_names():
    """Name composition parity with train.py:1983-2008."""
    cfg = ExperimentConfig(
        model_type="I3D",
        training_condition="_PRETRAINED",
        folds_number=5,
        classes_status="unbalanced",
        optical_flow_status="TVL1_precomputed",
        augmentation_status="non_augmented",
    )
    assert cfg.subfolder_name() == (
        "5folds_I3D_PRETRAINED_CS_unbalanced_OF_TVL1_precomputed_AS_non_augmented"
    )
    assert cfg.artifact_stem(2, 3).endswith("_split_test2_val3")
    # precomputed augmentation adds the _Freq{n} tag
    cfg2 = ExperimentConfig(
        augmentation_status="augmented_precomputed", augmentation_frequency=2
    )
    assert "_Freq2_split_test0_val1" in cfg2.artifact_stem(0, 1)
    rel = cfg.weights_relpath(1, 2)
    assert "TestSplit1" in rel and rel.endswith("_weights")


def test_config_validation_and_json_roundtrip(tmp_path):
    with pytest.raises(ValueError):
        ExperimentConfig(model_type="VGG")
    with pytest.raises(ValueError):
        ExperimentConfig(training_condition="SCRATCH")
    with pytest.raises(ValueError):
        # k < 3 leaves no training folds for the k·(k−1) member grid
        ExperimentConfig(folds_number=2)
    cfg = ExperimentConfig(model_type="R3D_50", batch_size=4)
    path = str(tmp_path / "cfg.json")
    cfg.save(path)
    assert ExperimentConfig.load(path) == cfg


def test_split_pairs_and_members():
    pairs = split_pairs(5)
    assert len(pairs) == 20
    assert (0, 0) not in pairs
    assert member_val_indices(5, 2) == [0, 1, 3, 4]


def test_manifest_roundtrip(tmp_path):
    m = Manifest(str(tmp_path), ExperimentConfig(model_type="C3D"))
    m.add(ArtifactRecord(kind="checkpoint", path="ck/best", test_index=0, val_index=1))
    m.add(ArtifactRecord(kind="history", path="h.npy", test_index=0, val_index=1))
    # idempotent replace
    m.add(ArtifactRecord(kind="checkpoint", path="ck/best", test_index=0, val_index=1))
    assert len(m.records) == 2

    m2 = Manifest.load(str(tmp_path))
    assert m2.config.model_type == "C3D"
    found = m2.find("checkpoint", test_index=0)
    assert len(found) == 1 and found[0].val_index == 1
    assert m2.abspath(found[0]).endswith("ck/best")


def test_mesh_construction():
    m = mesh_mod.make_mesh((("data", -1),))
    assert m.shape["data"] == 8
    m2 = mesh_mod.make_mesh((("member", 2), ("data", -1)))
    assert m2.shape == {"member": 2, "data": 4}
    with pytest.raises(ValueError):
        mesh_mod.make_mesh((("a", -1), ("b", -1)))
    with pytest.raises(ValueError):
        mesh_mod.make_mesh((("data", 3),))  # 8 % 3 != 0


def test_ensemble_mesh_fallback():
    m = mesh_mod.ensemble_mesh(4)
    assert m.shape["member"] == 4
    m2 = mesh_mod.ensemble_mesh(3)  # 8 % 3 != 0 → fold members onto data mesh
    assert m2.shape["member"] == 1


def test_prng_determinism():
    k = prng.experiment_key(7)
    a = prng.clip_key(k, epoch=1, clip_index=5)
    b = prng.clip_key(k, epoch=1, clip_index=5)
    assert jax.random.uniform(a) == jax.random.uniform(b)
    c = prng.clip_key(k, epoch=2, clip_index=5)
    assert jax.random.uniform(a) != jax.random.uniform(c)
    keys = prng.batch_keys(k, 4)
    assert keys.shape[0] == 4


def test_flow_schedule_field_validation_and_roundtrip(tmp_path):
    """flow_schedule persists with the experiment identity (like
    input_scale) and rejects unknown schedules; old experiment.json files
    without the field load with the 'full' default."""
    import json

    from crowded_scenes_ensemble_classification_tpu.core.config import (
        ExperimentConfig,
    )
    from crowded_scenes_ensemble_classification_tpu.flow.farneback import (
        TURBO_PARAMS,
        flow_schedule_params,
    )

    cfg = ExperimentConfig(model_type="TWOSTREAM_I3D", flow_schedule="turbo")
    p = str(tmp_path / "experiment.json")
    cfg.save(p)
    assert ExperimentConfig.load(p).flow_schedule == "turbo"
    # naming is unchanged: the schedule is a runtime knob, not a new
    # artifact-identity dimension
    assert cfg.subfolder_name() == ExperimentConfig(
        model_type="TWOSTREAM_I3D"
    ).subfolder_name()

    with pytest.raises(ValueError, match="flow_schedule"):
        ExperimentConfig(flow_schedule="warp9")

    # pre-knob experiment.json files (no flow_schedule key) still load
    d = json.loads(cfg.to_json())
    del d["flow_schedule"]
    with open(p, "w") as f:
        json.dump(d, f)
    assert ExperimentConfig.load(p).flow_schedule == "full"

    assert flow_schedule_params("full") is None
    assert flow_schedule_params("turbo") == TURBO_PARAMS
    with pytest.raises(ValueError):
        flow_schedule_params("bogus")
