"""End-to-end smoke (SURVEY.md §4f): synthetic 3-class video set →
scene-stratified folds → split matrix → train 2 ensemble members (tiny C3D)
→ probability cache → homogeneous fusion → reports.  All on CPU."""

import os

import jax
import numpy as np
import optax
import pytest

from crowded_scenes_ensemble_classification_tpu.core.config import (
    ClipSpec,
    ExperimentConfig,
)
from crowded_scenes_ensemble_classification_tpu.data import generate_synthetic_dataset
from crowded_scenes_ensemble_classification_tpu.ensemble import (
    evaluate_ensembles,
    load_probabilities,
)
from crowded_scenes_ensemble_classification_tpu.models import C3D
from crowded_scenes_ensemble_classification_tpu.models.registry import ModelBundle
from crowded_scenes_ensemble_classification_tpu.orchestration import (
    WorkLayout,
    cache_probabilities,
    member_cli_commands,
    min_val_losses_provider,
    prepare_ensemble,
    train_member,
)
from crowded_scenes_ensemble_classification_tpu.reports import (
    agreement_histogram,
    confusion_matrix,
    members_correct_per_clip,
    render_agreement_pdf,
    render_confusion_pdf,
    row_normalize,
)


def tiny_bundle(num_classes=3):
    return ModelBundle(
        model_type="C3D",
        module=C3D(num_classes=num_classes, width=0.125),
        clip=ClipSpec(frames=16, height=32, width=32),
        num_classes=num_classes,
        two_stream=False,
    )


@pytest.fixture(scope="module")
def workspace(tmp_path_factory):
    root = tmp_path_factory.mktemp("e2e")
    data_dir = root / "data"
    work_dir = root / "work"
    df = generate_synthetic_dataset(
        str(data_dir), num_scenes=9, clips_per_scene=3, num_classes=3,
        num_frames=16, hw=(40, 40), as_videos=False,
    )
    config = ExperimentConfig(
        model_type="C3D",
        training_condition="_SCRATCH",
        folds_number=3,
        num_classes=3,
        batch_size=6,
        epochs=3,
    )
    layout = prepare_ensemble(config, df, str(work_dir))
    return config, layout, df


def test_prepare_creates_layout(workspace):
    config, layout, df = workspace
    folds_subdir = os.path.join(layout.folds_dir, "3_folds")
    assert os.path.exists(os.path.join(folds_subdir, "fold2.csv"))
    assert os.path.exists(layout.split_csv(0, 1, "train"))
    assert os.path.exists(
        os.path.join(layout.models_dir, config.subfolder_name(), "TestSplit0")
    )
    assert os.path.exists(os.path.join(layout.root, "manifest.json"))


def test_member_cli_commands(workspace):
    config, layout, _ = workspace
    cmds = member_cli_commands(config, layout.root)
    assert len(cmds) == 6  # 3 × 2
    assert "--test-index 0 --val-index 1" in cmds[0]


def test_train_members_and_ensemble(workspace, tmp_path):
    config, layout, _ = workspace
    bundle = tiny_bundle()
    tx = optax.inject_hyperparams(optax.adam)(learning_rate=2e-3)

    for v in (1, 2):
        out = train_member(
            config,
            layout,
            0,
            v,
            epochs=2,
            bundle=bundle,
            input_scale=1 / 255.0,
            staging_hw=(40, 40),
            num_workers=2,
            optimizer=optax.inject_hyperparams(optax.adam)(learning_rate=2e-3),
        )
        assert np.isfinite(out["test_loss"])
        assert os.path.exists(out["checkpoint_dir"])
        assert os.path.exists(layout.history_path(config, 0, v))

    # probability cache for test fold 0 (2 members)
    path = cache_probabilities(
        config, layout, 0, "test", bundle=bundle, staging_hw=(40, 40), num_workers=2
    )
    d = load_probabilities(path)
    assert d["probs"].shape[0] == 2
    assert d["probs"].shape[2] == 3
    np.testing.assert_allclose(d["probs"].sum(-1), 1.0, atol=1e-4)

    # cached: second call returns without recompute
    assert cache_probabilities(
        config, layout, 0, "test", bundle=bundle, staging_hw=(40, 40)
    ) == path

    # train_val subset = concat(train, val) (evaluate_ensemble.py:1079-1108)
    tv_path = cache_probabilities(
        config, layout, 0, "train_val", bundle=bundle, staging_hw=(40, 40),
        num_workers=2,
    )
    tv = load_probabilities(tv_path)
    import pandas as pd

    n_train = len(pd.read_csv(layout.split_csv(0, 1, "train")))
    n_val = len(pd.read_csv(layout.split_csv(0, 1, "val")))
    assert tv["probs"].shape[1] == n_train + n_val

    # homogeneous fusion over fold 0 with SUM and VALIDATION_ERROR_INVERSE
    def provider(t, subset):
        return load_probabilities(
            cache_probabilities(
                config, layout, t, subset, bundle=bundle, staging_hw=(40, 40)
            )
        )

    res_sum = evaluate_ensembles(provider, 1, "SUM", name=config.subfolder_name())
    assert 0.0 <= res_sum.mean_accuracy <= 1.0
    csv_path = res_sum.save_predictions_csv(layout.results_dir)
    assert os.path.exists(csv_path)

    res_vei = evaluate_ensembles(
        provider,
        1,
        "VALIDATION_ERROR_INVERSE",
        min_val_losses_provider=min_val_losses_provider(config, layout),
    )
    w = res_vei.folds[0].weights
    assert len(w) == 2 and abs(float(np.sum(w)) - 1.0) < 1e-6

    # reports from the cached tensors
    cm = row_normalize(
        confusion_matrix(d["labels"], res_sum.folds[0].predictions, 3)
    )
    pdf = render_confusion_pdf(cm, str(tmp_path / "cm.pdf"), title="fold 0")
    assert os.path.exists(pdf)
    counts = members_correct_per_clip(d["probs"], d["labels"])
    hist = agreement_histogram(counts, n_members=2)
    assert hist.sum() == len(d["labels"])
    pdf2 = render_agreement_pdf([hist], str(tmp_path / "agree.pdf"), n_members=2)
    assert os.path.exists(pdf2)


def test_launch_local_shares_jitted_steps(tmp_path, monkeypatch):
    """launch_ensemble_training (local runner) must build the jitted
    train/eval steps ONCE and share them across all k*(k-1) members —
    per-member rebuilds recompile the full model k*(k-1) times (minutes
    per compile on the axon relay)."""
    from crowded_scenes_ensemble_classification_tpu import orchestration
    from crowded_scenes_ensemble_classification_tpu.models import registry
    from crowded_scenes_ensemble_classification_tpu.train import engine

    df = generate_synthetic_dataset(
        str(tmp_path / "data"), num_scenes=9, clips_per_scene=3,
        num_classes=3, num_frames=16, hw=(40, 40), as_videos=False,
    )
    config = ExperimentConfig(
        model_type="C3D", training_condition="_SCRATCH", folds_number=3,
        num_classes=3, batch_size=6, epochs=1,
    )

    # tiny C3D stand-in for the full-size factory
    monkeypatch.setattr(
        orchestration, "build_model",
        lambda mt, nc, **kw: tiny_bundle(nc),
    )

    calls = {"train": 0, "eval": 0}
    real_train, real_eval = engine.make_train_step, engine.make_eval_step

    def counting_train(*a, **kw):
        calls["train"] += 1
        return real_train(*a, **kw)

    def counting_eval(*a, **kw):
        calls["eval"] += 1
        return real_eval(*a, **kw)

    monkeypatch.setattr(engine, "make_train_step", counting_train)
    monkeypatch.setattr(engine, "make_eval_step", counting_eval)

    results = orchestration.launch_ensemble_training(
        config, df, str(tmp_path / "work"),
        epochs=1, input_scale=1 / 255.0, staging_hw=(40, 40), num_workers=2,
        optimizer=optax.inject_hyperparams(optax.adam)(learning_rate=2e-3),
    )
    assert len(results) == 6  # 3 x 2 members trained
    assert all(np.isfinite(r["test_loss"]) for r in results.values())
    assert calls["train"] == 1, calls
    assert calls["eval"] == 1, calls


def test_cache_probabilities_input_scale_and_long_video_variant(tmp_path):
    """cache_probabilities must (a) evaluate members at config.input_scale
    — the scale they trained with (regression: it silently ran at 1.0) —
    and (b) give long-video window scans their own cache path, never
    returning a standard-window cache for a long-video request."""
    from crowded_scenes_ensemble_classification_tpu.orchestration import (
        WorkLayout,
        cache_probabilities,
    )
    from crowded_scenes_ensemble_classification_tpu.train.checkpoints import (
        save_best,
    )

    cfg = ExperimentConfig(
        model_type="C3D", folds_number=3, num_classes=3, batch_size=2,
        input_scale=1 / 255.0,
    )
    layout = WorkLayout(str(tmp_path / "work"))
    bundle = tiny_bundle()

    # 40-frame synthetic clips (> the 16-frame window) for fold 0
    import pandas as pd

    rng = np.random.default_rng(3)
    clip_dir = tmp_path / "clips"
    clip_dir.mkdir()
    rows = []
    for i in range(4):
        p = str(clip_dir / f"clip{i}.npy")
        np.save(p, rng.integers(0, 255, (40, 32, 32, 3)).astype(np.uint8))
        rows.append({"rgbclips_path": p, "x_axis_flowclips_path": "",
                     "y_axis_flowclips_path": "", "class": i % 3})
    csv_path = layout.split_csv(0, 1, "test")
    os.makedirs(os.path.dirname(csv_path), exist_ok=True)
    pd.DataFrame(rows).to_csv(csv_path, index=False)
    for v in (1, 2):
        save_best(layout.checkpoint_dir(cfg, 0, v),
                  bundle.init(jax.random.key(v)))

    # (a) config.input_scale drives the forward
    path = cache_probabilities(
        cfg, layout, 0, "test", bundle=bundle, staging_hw=(32, 32),
        num_workers=2,
    )
    probs_scaled = load_probabilities(path)["probs"]
    cache_probabilities(
        cfg, layout, 0, "test", bundle=bundle, staging_hw=(32, 32),
        num_workers=2, input_scale=1.0, recompute=True,
    )
    probs_raw = load_probabilities(path)["probs"]
    assert probs_scaled.shape == probs_raw.shape == (2, 4, 3)
    assert not np.allclose(probs_scaled, probs_raw, atol=1e-3)

    # (b) long-video caches are variant-suffixed, standard cache untouched
    long_path = cache_probabilities(
        cfg, layout, 0, "test", bundle=bundle, staging_hw=(32, 32),
        num_workers=2, long_video=True, window_stride=8, long_frames=40,
    )
    assert long_path != path and "_long40s8_" in os.path.basename(long_path)
    d_long = load_probabilities(long_path)
    assert d_long["probs"].shape == (2, 4, 3)
    np.testing.assert_allclose(d_long["probs"].sum(-1), 1.0, atol=1e-4)
    # cached: a second long-video call returns the same variant path
    assert cache_probabilities(
        cfg, layout, 0, "test", bundle=bundle, staging_hw=(32, 32),
        long_video=True, window_stride=8, long_frames=40,
    ) == long_path


def test_commands_runner_respects_recover(tmp_path):
    """`launch --recover --runner commands` must emit commands for exactly
    the PENDING members — an external-scheduler relaunch that re-queued
    completed members would waste their full training time (reference
    launch_train_ensemble.py:130-142 relied on single-train.sh skipping)."""
    from crowded_scenes_ensemble_classification_tpu.core.config import (
        split_pairs,
    )
    from crowded_scenes_ensemble_classification_tpu.orchestration import (
        launch_ensemble_training,
        prepare_ensemble,
    )
    from crowded_scenes_ensemble_classification_tpu.train.checkpoints import (
        save_best,
    )

    df = generate_synthetic_dataset(
        str(tmp_path / "data"), num_scenes=9, clips_per_scene=2,
        num_classes=3, num_frames=8, hw=(24, 24), as_videos=False,
    )
    config = ExperimentConfig(
        model_type="C3D", training_condition="_SCRATCH", folds_number=3,
        num_classes=3, batch_size=4, epochs=1,
    )
    work = str(tmp_path / "work")
    layout = prepare_ensemble(config, df, work)

    pairs = split_pairs(3)
    done, pending = pairs[:2], pairs[2:]
    bundle = tiny_bundle()
    for t, v in done:  # fabricate the complete (checkpoint, history) pair
        save_best(layout.checkpoint_dir(config, t, v),
                  bundle.init(jax.random.key(7)))
        hp = layout.history_path(config, t, v)  # ends in .npy
        os.makedirs(os.path.dirname(hp), exist_ok=True)
        np.save(hp, np.array([1.0], np.float32))

    cmds = launch_ensemble_training(
        config, None, work, runner="commands", recover=True
    )
    assert len(cmds) == len(pending)
    for (t, v), cmd in zip(pending, cmds):
        assert f"--test-index {t} --val-index {v}" in cmd
    for t, v in done:
        assert not any(
            f"--test-index {t} --val-index {v}" in c for c in cmds
        ), (t, v)
    # without recover, the commands runner still emits the full ensemble
    assert len(
        launch_ensemble_training(config, None, work, runner="commands")
    ) == len(pairs)


def test_flow_schedule_threads_into_probability_caching(tmp_path, monkeypatch):
    """cache_probabilities derives the Farnebäck flow_params from
    config.flow_schedule — members trained with turbo flow are evaluated
    with turbo flow (same contract as input_scale)."""
    from crowded_scenes_ensemble_classification_tpu import orchestration
    from crowded_scenes_ensemble_classification_tpu.flow.farneback import (
        TURBO_PARAMS,
    )
    from crowded_scenes_ensemble_classification_tpu.train.checkpoints import (
        save_best,
    )
    import dataclasses
    import pandas as pd

    captured = {}

    def fake_member_probabilities(bundle, variables, pipe, mesh=None,
                                  input_scale=1.0, flow_params=None):
        captured["flow_params"] = flow_params
        n = len(pipe.df)
        return np.full((len(variables), n, 3), 1 / 3, np.float32)

    monkeypatch.setattr(
        orchestration, "member_probabilities", fake_member_probabilities
    )

    work = str(tmp_path / "work")
    cfg = ExperimentConfig(
        model_type="C3D", folds_number=3, num_classes=3, batch_size=2,
        flow_schedule="turbo",
    )
    layout = WorkLayout(work)
    rng = np.random.default_rng(2)
    clip_dir = tmp_path / "clips"
    clip_dir.mkdir()
    rows = []
    for i in range(4):
        p = str(clip_dir / f"c{i}.npy")
        np.save(p, rng.integers(0, 255, (16, 24, 24, 3)).astype(np.uint8))
        rows.append({"rgbclips_path": p, "x_axis_flowclips_path": "",
                     "y_axis_flowclips_path": "", "class": i % 3})
    csv_path = layout.split_csv(0, 1, "test")
    os.makedirs(os.path.dirname(csv_path), exist_ok=True)
    pd.DataFrame(rows).to_csv(csv_path, index=False)
    bundle = tiny_bundle()
    for v in (1, 2):
        save_best(layout.checkpoint_dir(cfg, 0, v),
                  bundle.init(jax.random.key(v)))

    cache_probabilities(
        cfg, layout, 0, "test", bundle=bundle, staging_hw=(24, 24),
        num_workers=2,
    )
    assert captured["flow_params"] == TURBO_PARAMS

    captured.clear()
    cache_probabilities(
        dataclasses.replace(cfg, flow_schedule="full"), layout, 0, "test",
        bundle=bundle, staging_hw=(24, 24), num_workers=2, recompute=True,
    )
    assert captured["flow_params"] is None


def test_fuse_1x1_threads_into_probability_caching(tmp_path, monkeypatch):
    """cache_probabilities(fuse_1x1=True) builds I3D-family members with
    the fused inception graph (exact rewrite, same checkpoints — see
    models/i3d.py InceptionBlock) and ignores the knob for non-I3D
    families, whose constructors don't accept it."""
    from crowded_scenes_ensemble_classification_tpu import orchestration

    built = {}
    real_build = orchestration.build_model

    def fake_build_model(model_type, num_classes, **kwargs):
        built[model_type] = kwargs
        # return a tiny real bundle so the rest of the plumbing works
        return real_build("C3D", num_classes, width=8)

    def fake_member_probabilities(bundle, variables, pipe, **kw):
        return np.full((len(variables), len(pipe.df), 3), 1 / 3, np.float32)

    def fake_member_variables(config, layout, bundle, t):
        v = bundle.init(jax.random.key(0), batch_size=1)
        return [v, v], ["m1", "m2"]

    monkeypatch.setattr(orchestration, "build_model", fake_build_model)
    monkeypatch.setattr(
        orchestration, "member_probabilities", fake_member_probabilities
    )
    monkeypatch.setattr(
        orchestration, "_member_variables", fake_member_variables
    )

    import pandas as pd

    work = str(tmp_path / "work")
    layout = WorkLayout(work)
    rng = np.random.default_rng(3)
    clip_dir = tmp_path / "clips"
    clip_dir.mkdir()
    rows = []
    for i in range(2):
        p = str(clip_dir / f"c{i}.npy")
        np.save(p, rng.integers(0, 255, (16, 24, 24, 3)).astype(np.uint8))
        rows.append({"rgbclips_path": p, "x_axis_flowclips_path": "",
                     "y_axis_flowclips_path": "", "class": i % 3})
    csv_path = layout.split_csv(0, 1, "test")
    os.makedirs(os.path.dirname(csv_path), exist_ok=True)
    pd.DataFrame(rows).to_csv(csv_path, index=False)

    cfg = ExperimentConfig(
        model_type="I3D", folds_number=3, num_classes=3, batch_size=2
    )
    cache_probabilities(
        cfg, layout, 0, "test", staging_hw=(24, 24), num_workers=2,
        fuse_1x1=True,
    )
    assert built["I3D"].get("fuse_1x1") is True

    built.clear()
    cfg_c3d = ExperimentConfig(
        model_type="C3D", folds_number=3, num_classes=3, batch_size=2
    )
    cache_probabilities(
        cfg_c3d, layout, 0, "test", staging_hw=(24, 24), num_workers=2,
        fuse_1x1=True, recompute=True,
    )
    assert "fuse_1x1" not in built["C3D"]
