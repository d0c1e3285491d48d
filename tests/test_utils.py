"""Observability subsystem tests (utils.metrics)."""

import json
import os
import time

import pytest

from crowded_scenes_ensemble_classification_tpu.utils import (
    MetricsLogger,
    StageTimer,
    profile_trace,
)


def test_metrics_logger_roundtrip(tmp_path):
    path = str(tmp_path / "m" / "metrics.jsonl")
    log = MetricsLogger(path)
    log.log("epoch", epoch=0, loss=1.25)
    log.log("stage", name="decode", seconds=0.5)
    records = log.read()
    assert len(records) == 2
    assert records[0]["event"] == "epoch" and records[0]["loss"] == 1.25
    assert records[1]["name"] == "decode"
    # appended across re-open
    MetricsLogger(path).log("epoch", epoch=1, loss=1.0)
    assert len(log.read()) == 3
    # raw file is valid JSONL
    with open(path) as f:
        for line in f:
            json.loads(line)


def test_stage_timer_rates():
    t = StageTimer()
    with t.stage("decode", items=10):
        time.sleep(0.05)
    with t.stage("decode", items=10):
        time.sleep(0.05)
    with t.stage("forward", items=4):
        time.sleep(0.01)
    s = t.summary()
    assert s["decode"]["items"] == 20
    assert s["decode"]["seconds"] >= 0.1
    assert 0 < t.rate("decode") < 400
    assert t.rate("missing") == 0.0


def test_profile_trace_noop_and_real(tmp_path):
    with profile_trace(None):
        pass  # no-op path
    # real trace on CPU
    import jax
    import jax.numpy as jnp

    with profile_trace(str(tmp_path / "trace")):
        jnp.ones((8, 8)).sum().block_until_ready()
    # profiler wrote something
    assert any(os.scandir(tmp_path / "trace"))


def test_fit_writes_metrics(tmp_path):
    import optax

    from crowded_scenes_ensemble_classification_tpu.core.config import ClipSpec
    from crowded_scenes_ensemble_classification_tpu.data import (
        BatchPipeline,
        SampleSpec,
        generate_synthetic_dataset,
    )
    from crowded_scenes_ensemble_classification_tpu.models import C3D
    from crowded_scenes_ensemble_classification_tpu.models.registry import ModelBundle
    from crowded_scenes_ensemble_classification_tpu.train import fit, LRPolicy

    df = generate_synthetic_dataset(
        str(tmp_path / "d"), num_scenes=4, clips_per_scene=2, num_classes=2,
        num_frames=16, hw=(36, 36), as_videos=False,
    ).rename(columns={"label": "class"})
    spec = SampleSpec(num_frames=16, staging_hw=(36, 36))
    tr = BatchPipeline(df.iloc[:6], spec, batch_size=6, seed=1, num_workers=2)
    va = BatchPipeline(df.iloc[6:], spec, batch_size=6, shuffle=False, num_workers=2)
    bundle = ModelBundle(
        "C3D", C3D(num_classes=2, width=0.125), ClipSpec(16, 32, 32), 2, False
    )
    log = MetricsLogger(str(tmp_path / "metrics.jsonl"))
    fit(
        bundle, tr, va, epochs=1,
        optimizer=optax.inject_hyperparams(optax.adam)(learning_rate=1e-3),
        lr_policy=LRPolicy(initial_lr=1e-3),
        input_scale=1 / 255.0,
        metrics_logger=log,
    )
    records = log.read()
    assert any(r["event"] == "epoch" for r in records)
    epoch0 = [r for r in records if r["event"] == "epoch"][0]
    assert {"loss", "val_loss", "lr", "model_type"} <= set(epoch0)
