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


def test_ensemble_and_report_cli_from_cached_probs(tmp_path, capsys):
    """ensemble/report subcommands driven purely by pre-seeded probability
    caches (cache_probabilities short-circuits on existing npz —
    reference auto-cache semantics, evaluate_ensemble.py:1161-1174)."""
    from crowded_scenes_ensemble_classification_tpu.core.config import ExperimentConfig
    from crowded_scenes_ensemble_classification_tpu.ensemble.probability_store import (
        probability_cache_path,
        save_probabilities,
    )
    from crowded_scenes_ensemble_classification_tpu.orchestration import WorkLayout

    work = str(tmp_path / "work")
    cfg = ExperimentConfig(model_type="C3D", folds_number=3, num_classes=3)
    layout = WorkLayout(work)
    rng = np.random.default_rng(0)
    for t in range(3):
        labels = rng.integers(0, 3, 20)
        probs = np.where(
            rng.random((2, 20, 1)) < 0.8,
            np.eye(3)[labels][None],
            rng.dirichlet(np.ones(3), (2, 20)),
        ).astype(np.float32)
        for subset in ("test", "train_val"):
            save_probabilities(
                probability_cache_path(layout.probs_dir, cfg.subfolder_name(), t, subset),
                probs, labels, [f"m{t}0", f"m{t}1"],
            )
        # history npys for VALIDATION_ERROR_INVERSE
        for v in [x for x in range(3) if x != t]:
            hp = layout.history_path(cfg, t, v)
            os.makedirs(os.path.dirname(hp), exist_ok=True)
            np.save(hp, np.asarray([1.0, 0.5 + 0.1 * v], np.float32))

    rc = main([
        "ensemble", "--work-dir", work, "-mt", "C3D", "-fn", "3",
        "--num-classes", "3", "--operation", "evaluate", "-wt", "SUM",
    ])
    assert rc == 0
    out = capsys.readouterr().out
    assert "mean accuracy:" in out
    assert os.path.exists(
        os.path.join(
            work, "Results",
            f"weighted_prediction_results_{cfg.subfolder_name()}.csv",
        )
    )

    rc = main([
        "ensemble", "--work-dir", work, "-mt", "C3D", "-fn", "3",
        "--num-classes", "3", "--operation", "evaluate",
        "-wt", "VALIDATION_ERROR_INVERSE",
    ])
    assert rc == 0

    rc = main([
        "ensemble", "--work-dir", work, "-mt", "C3D", "-fn", "3",
        "--num-classes", "3", "--operation", "evaluate",
        "-wt", "GRID_SEARCH",
    ])
    assert rc == 0
    out = capsys.readouterr().out
    assert "GRID_SEARCH" in out  # learned weights .npy path printed

    rc = main([
        "report", "--work-dir", work, "-mt", "C3D", "-fn", "3",
        "--num-classes", "3", "--operation", "agreement",
    ])
    assert rc == 0
    out = capsys.readouterr().out
    assert out.strip().endswith(".pdf")

    rc = main([
        "report", "--work-dir", work, "-mt", "C3D", "-fn", "3",
        "--num-classes", "3", "--operation", "confusion",
    ])
    assert rc == 0
    capsys.readouterr()

    # train_val agreement diagrams (reference stickDiagrams train_val
    # variant, evaluate_ensemble.py:928-996)
    rc = main([
        "report", "--work-dir", work, "-mt", "C3D", "-fn", "3",
        "--num-classes", "3", "--operation", "agreement",
        "--subset", "train_val",
    ])
    assert rc == 0
    out = capsys.readouterr().out
    assert out.strip().endswith("_train_val.pdf")
    assert os.path.exists(out.strip())

    # global-ensemble difference matrices (reference Global path,
    # evaluate_ensemble.py:490-614)
    rc = main([
        "report", "--work-dir", work, "-mt", "C3D", "-fn", "3",
        "--num-classes", "3", "--operation", "difference",
        "--scope", "global",
    ])
    assert rc == 0
    out = capsys.readouterr().out
    paths = [l for l in out.strip().splitlines() if l.endswith(".pdf")]
    # 3 folds x 2 members
    assert len(paths) == 6 and all(os.path.exists(p) for p in paths)
    assert all("difference_global_" in p for p in paths)

    # global-ensemble confusion matrices (reference Global path,
    # evaluate_ensemble.py:783-851)
    rc = main([
        "report", "--work-dir", work, "-mt", "C3D", "-fn", "3",
        "--num-classes", "3", "--operation", "confusion",
        "--scope", "global",
    ])
    assert rc == 0
    out = capsys.readouterr().out.strip()
    assert out.endswith("confusion_global_ensemble.pdf")
    assert os.path.exists(out)


def test_member_cli_commands_parse():
    """The sbatch-parity command list must round-trip through our own CLI
    parser (reference emitted positional sbatch relays that silently broke
    on reorder; ours are validated flags)."""
    from crowded_scenes_ensemble_classification_tpu.core.config import (
        ExperimentConfig,
    )
    from crowded_scenes_ensemble_classification_tpu.orchestration import (
        member_cli_commands,
    )

    cfg = ExperimentConfig(
        model_type="R3D_50",
        training_condition="_SCRATCH",
        folds_number=3,
        augmentation_status="augmented_onTheFly",
        optical_flow_status="TVL1_precomputed",
        batch_size=8,
        epochs=42,
    )
    parser = build_parser()
    cmds = member_cli_commands(cfg, "/tmp/w")
    assert len(cmds) == 6
    for cmd in cmds:
        argv = cmd.split()[2:]  # strip "python -m"
        assert argv[0] == "crowded_scenes_ensemble_classification_tpu"
        args = parser.parse_args(argv[1:])
        assert args.command == "train"
        assert args.model_type == "R3D_50"
        assert args.epochs == 42
        assert 0 <= args.test_index < 3 and args.test_index != args.val_index


def test_commands_runner_threads_pretrained_paths(tmp_path):
    """`launch --runner commands --rgb-h5/--flow-h5` must thread the
    checkpoint paths into every fan-out member command (the Slurm-parity
    path, reference launch_train_ensemble.py:144-158)."""
    from crowded_scenes_ensemble_classification_tpu.cli.main import build_parser
    from crowded_scenes_ensemble_classification_tpu.core.config import ExperimentConfig
    from crowded_scenes_ensemble_classification_tpu.orchestration import (
        member_cli_commands,
    )

    cfg = ExperimentConfig(
        model_type="TWOSTREAM_I3D", training_condition="_PRETRAINED",
        folds_number=3,
    )
    cmds = member_cli_commands(
        cfg, str(tmp_path), rgb_h5="/w/rgb.h5", flow_h5="/w/flow.h5"
    )
    assert len(cmds) == 6
    for c in cmds:
        assert "--rgb-h5 /w/rgb.h5" in c and "--flow-h5 /w/flow.h5" in c
        assert "--training-condition _PRETRAINED" in c

    # and the train parser accepts what the fan-out emits
    args = build_parser().parse_args(
        cmds[0].split()[3:]  # strip "python -m <module>"
    )
    assert args.rgb_h5 == "/w/rgb.h5" and args.flow_h5 == "/w/flow.h5"


@pytest.mark.slow
def test_probs_long_video_cli(tmp_path, capsys):
    """VERDICT r2 item 6: classify T>>window synthetic videos end-to-end
    from the CLI — `probs --long-video` window-scans each long clip with
    on-device score averaging, and `ensemble` consumes the cache."""
    import jax

    from crowded_scenes_ensemble_classification_tpu.core.config import (
        ExperimentConfig,
    )
    from crowded_scenes_ensemble_classification_tpu.models import build_model
    from crowded_scenes_ensemble_classification_tpu.orchestration import WorkLayout
    from crowded_scenes_ensemble_classification_tpu.train.checkpoints import (
        save_best,
    )

    work = str(tmp_path / "work")
    cfg = ExperimentConfig(model_type="C3D", folds_number=3, num_classes=3,
                           batch_size=2)
    layout = WorkLayout(work)

    # long synthetic clips: T = 40 frames >> the 16-frame C3D window
    rng = np.random.default_rng(0)
    clip_dir = tmp_path / "clips"
    clip_dir.mkdir()
    rows = []
    for i in range(4):
        clip = rng.integers(0, 255, (40, 64, 64, 3)).astype(np.uint8)
        p = str(clip_dir / f"clip{i}.npy")
        np.save(p, clip)
        rows.append({"rgbclips_path": p, "x_axis_flowclips_path": "",
                     "y_axis_flowclips_path": "", "class": i % 3})
    csv_path = layout.split_csv(0, 1, "test")
    os.makedirs(os.path.dirname(csv_path), exist_ok=True)
    pd.DataFrame(rows).to_csv(csv_path, index=False)

    # random-init member checkpoints (mechanics test, not accuracy)
    bundle = build_model("C3D", 3)
    for v in (1, 2):
        save_best(layout.checkpoint_dir(cfg, 0, v),
                  bundle.init(jax.random.key(v)))

    rc = main([
        "probs", "--work-dir", work, "-mt", "C3D", "-fn", "3",
        "--num-classes", "3", "-bs", "2", "--test-index", "0",
        "--long-video", "--window-stride", "8", "--long-frames", "40",
    ])
    assert rc == 0
    out = capsys.readouterr().out.strip()
    assert out.endswith(".npz") and os.path.exists(out)

    from crowded_scenes_ensemble_classification_tpu.ensemble.probability_store import (
        load_probabilities,
    )

    d = load_probabilities(out)
    assert d["probs"].shape == (2, 4, 3)  # (members, long clips, classes)
    np.testing.assert_allclose(d["probs"].sum(-1), 1.0, atol=1e-4)


def _tiny_c3d_builds(monkeypatch):
    """The quant CLI tests exercise PLUMBING — cache-path qualification,
    calibration-before-window-scan ordering, checkpoint restore — not
    int8 numerics (gated in tests/test_quant.py).  A full-width C3D
    lowered as int8 on XLA CPU compiles for tens of minutes (observed
    round 5: >40 min for the vmapped member forward), so the
    orchestration builds width-0.125 C3Ds here.  Returns the patched
    builder for the test's own checkpoint init (widths must match)."""
    from crowded_scenes_ensemble_classification_tpu import orchestration
    from crowded_scenes_ensemble_classification_tpu.models.registry import (
        build_model as real_build,
    )

    def tiny(model_type, num_classes=11, **kw):
        if model_type == "C3D":
            kw.setdefault("width", 0.125)
        return real_build(model_type, num_classes, **kw)

    monkeypatch.setattr(orchestration, "build_model", tiny)
    return tiny


def test_probs_quant_cli(tmp_path, capsys, monkeypatch):
    """`probs --quant` runs int8 member inference (models.common.
    quant_conv_general) from the same checkpoints and caches at its own
    `…_int8` npz path — a bf16/f32 cache is never silently returned for
    a quantized request."""
    import jax

    from crowded_scenes_ensemble_classification_tpu.core.config import (
        ExperimentConfig,
    )
    from crowded_scenes_ensemble_classification_tpu.orchestration import WorkLayout
    from crowded_scenes_ensemble_classification_tpu.train.checkpoints import (
        save_best,
    )

    build_model = _tiny_c3d_builds(monkeypatch)
    work = str(tmp_path / "work")
    cfg = ExperimentConfig(model_type="C3D", folds_number=3, num_classes=3,
                           batch_size=2)
    layout = WorkLayout(work)

    rng = np.random.default_rng(0)
    clip_dir = tmp_path / "clips"
    clip_dir.mkdir()
    rows = []
    for i in range(4):
        clip = rng.integers(0, 255, (16, 64, 64, 3)).astype(np.uint8)
        p = str(clip_dir / f"clip{i}.npy")
        np.save(p, clip)
        rows.append({"rgbclips_path": p, "x_axis_flowclips_path": "",
                     "y_axis_flowclips_path": "", "class": i % 3})
    csv_path = layout.split_csv(0, 1, "test")
    os.makedirs(os.path.dirname(csv_path), exist_ok=True)
    pd.DataFrame(rows).to_csv(csv_path, index=False)

    bundle = build_model("C3D", 3)
    for v in (1, 2):
        save_best(layout.checkpoint_dir(cfg, 0, v),
                  bundle.init(jax.random.key(v)))

    rc = main([
        "probs", "--work-dir", work, "-mt", "C3D", "-fn", "3",
        "--num-classes", "3", "-bs", "2", "--test-index", "0", "--quant",
    ])
    assert rc == 0
    out = capsys.readouterr().out.strip()
    # variant sits before the _probabilities suffix
    # (probability_store.probability_cache_path convention)
    assert out.endswith("_int8_probabilities.npz") and os.path.exists(out)

    from crowded_scenes_ensemble_classification_tpu.ensemble.probability_store import (
        load_probabilities,
        probability_cache_path,
    )

    d = load_probabilities(out)
    assert d["probs"].shape == (2, 4, 3)
    np.testing.assert_allclose(d["probs"].sum(-1), 1.0, atol=1e-4)
    # the standard-window f32 cache is a DIFFERENT artifact
    std = probability_cache_path(layout.probs_dir, cfg.subfolder_name(), 0, "test")
    assert std != out and not os.path.exists(std)


def test_input_scale_resolution_from_saved_config(tmp_path):
    """probs/ensemble/report recover the input_scale that launch/train
    persisted for this config (WorkLayout.experiment_json); an explicit
    --input-scale flag overrides it (regression: probability caching
    silently ran at 1.0 for members trained at 1/255)."""
    from crowded_scenes_ensemble_classification_tpu.cli.main import (
        _config_from_args,
        build_parser,
    )
    from crowded_scenes_ensemble_classification_tpu.core.config import (
        ExperimentConfig,
    )
    from crowded_scenes_ensemble_classification_tpu.orchestration import WorkLayout

    work = str(tmp_path / "work")
    cfg = ExperimentConfig(model_type="C3D", folds_number=3, num_classes=3,
                           input_scale=1 / 255.0)
    saved = WorkLayout(work).experiment_json(cfg)
    cfg.save(saved)

    parser = build_parser()
    base = ["probs", "--work-dir", work, "-mt", "C3D", "-fn", "3",
            "--num-classes", "3"]
    assert _config_from_args(parser.parse_args(base)).input_scale == (
        pytest.approx(1 / 255.0)
    )
    # explicit flag wins
    args = parser.parse_args(base + ["--input-scale", "1.0"])
    assert _config_from_args(args).input_scale == 1.0
    # a DIFFERENT config in the same work dir does not inherit it
    other = parser.parse_args(
        ["probs", "--work-dir", work, "-mt", "I3D", "-fn", "3",
         "--num-classes", "3"]
    )
    assert _config_from_args(other).input_scale == 1.0


def test_mesh_data_flag_builds_mesh_and_threads_through(tmp_path, monkeypatch):
    """--mesh-data N constructs an N-device data mesh and passes it to
    train_member (multi-chip training drivable from the CLI)."""
    from crowded_scenes_ensemble_classification_tpu import orchestration

    captured = {}

    def fake_prepare(config, table, work_dir):
        return orchestration.WorkLayout(str(tmp_path / "work"))

    def fake_train_member(config, layout, t, v, **kw):
        captured["mesh"] = kw.get("mesh")
        captured["resident"] = kw.get("resident")
        return {"test_accuracy": 0.5, "test_loss": 1.0, "best_val_loss": 1.0,
                "history": {}, "checkpoint_dir": str(tmp_path)}

    monkeypatch.setattr(orchestration, "prepare_ensemble", fake_prepare)
    monkeypatch.setattr(orchestration, "train_member", fake_train_member)
    rc = main([
        "train", "--work-dir", str(tmp_path / "work"), "-mt", "C3D",
        "-fn", "3", "-t", "0", "-v", "1", "--mesh-data", "-1", "--resident",
    ])
    assert rc == 0
    mesh = captured["mesh"]
    assert mesh is not None and mesh.shape["data"] == 8  # virtual CPU mesh
    assert captured["resident"] is True

    # no flag → no mesh
    rc = main([
        "train", "--work-dir", str(tmp_path / "work"), "-mt", "C3D",
        "-fn", "3", "-t", "0", "-v", "1",
    ])
    assert rc == 0
    assert captured["mesh"] is None


def test_probs_quant_static_long_video_cli(tmp_path, capsys, monkeypatch):
    """`probs --quant static --long-video` calibrates BEFORE the
    window-scan: a 'static' bundle applied with uncalibrated variables
    has an empty 'qstats' collection and crashes (regression: the
    calibration leg used to live only in the standard-window branch)."""
    import jax

    from crowded_scenes_ensemble_classification_tpu.core.config import (
        ExperimentConfig,
    )
    from crowded_scenes_ensemble_classification_tpu.orchestration import WorkLayout
    from crowded_scenes_ensemble_classification_tpu.train.checkpoints import (
        save_best,
    )

    build_model = _tiny_c3d_builds(monkeypatch)
    work = str(tmp_path / "work")
    cfg = ExperimentConfig(model_type="C3D", folds_number=3, num_classes=3,
                           batch_size=2)
    layout = WorkLayout(work)

    rng = np.random.default_rng(5)
    clip_dir = tmp_path / "clips"
    clip_dir.mkdir()
    rows = []
    for i in range(4):
        # 40 frames > the 16-frame C3D window → a true long-video scan
        clip = rng.integers(0, 255, (40, 64, 64, 3)).astype(np.uint8)
        p = str(clip_dir / f"clip{i}.npy")
        np.save(p, clip)
        rows.append({"rgbclips_path": p, "x_axis_flowclips_path": "",
                     "y_axis_flowclips_path": "", "class": i % 3})
    csv_path = layout.split_csv(0, 1, "test")
    os.makedirs(os.path.dirname(csv_path), exist_ok=True)
    pd.DataFrame(rows).to_csv(csv_path, index=False)

    bundle = build_model("C3D", 3)
    for v in (1, 2):
        save_best(layout.checkpoint_dir(cfg, 0, v),
                  bundle.init(jax.random.key(v)))

    rc = main([
        "probs", "--work-dir", work, "-mt", "C3D", "-fn", "3",
        "--num-classes", "3", "-bs", "2", "--test-index", "0",
        "--quant", "static", "--long-video", "--window-stride", "8",
        "--long-frames", "40",
    ])
    assert rc == 0
    out = capsys.readouterr().out.strip()
    assert "_long40s8_int8static" in os.path.basename(out)
    assert os.path.exists(out)

    from crowded_scenes_ensemble_classification_tpu.ensemble.probability_store import (
        load_probabilities,
    )

    d = load_probabilities(out)
    assert d["probs"].shape == (2, 4, 3)
    np.testing.assert_allclose(d["probs"].sum(-1), 1.0, atol=1e-4)

    # the standard-window static path restores the same plain-f32
    # checkpoints (regression: a 'static' restore template refused them)
    rc = main([
        "probs", "--work-dir", work, "-mt", "C3D", "-fn", "3",
        "--num-classes", "3", "-bs", "2", "--test-index", "0",
        "--quant", "static",
    ])
    assert rc == 0
    out2 = capsys.readouterr().out.strip()
    assert out2.endswith("_int8static_probabilities.npz")
    assert os.path.exists(out2)
    d2 = load_probabilities(out2)
    assert d2["probs"].shape == (2, 4, 3)


def test_flow_schedule_resolution_from_saved_config(tmp_path):
    """probs/ensemble/report recover the flow_schedule that launch/train
    persisted for this config (same contract as input_scale: members
    trained with turbo flow must be evaluated with turbo flow); an
    explicit --flow-schedule flag overrides it."""
    from crowded_scenes_ensemble_classification_tpu.cli.main import (
        _config_from_args,
        build_parser,
    )
    from crowded_scenes_ensemble_classification_tpu.core.config import (
        ExperimentConfig,
    )
    from crowded_scenes_ensemble_classification_tpu.orchestration import WorkLayout

    work = str(tmp_path / "work")
    cfg = ExperimentConfig(
        model_type="TWOSTREAM_I3D", folds_number=3, num_classes=3,
        flow_schedule="turbo",
    )
    cfg.save(WorkLayout(work).experiment_json(cfg))

    parser = build_parser()
    base = ["probs", "--work-dir", work, "-mt", "TWOSTREAM_I3D", "-fn", "3",
            "--num-classes", "3"]
    assert _config_from_args(parser.parse_args(base)).flow_schedule == "turbo"
    # explicit flag wins
    args = parser.parse_args(base + ["--flow-schedule", "full"])
    assert _config_from_args(args).flow_schedule == "full"
    # a DIFFERENT config in the same work dir does not inherit it
    other = parser.parse_args(
        ["probs", "--work-dir", work, "-mt", "I3D", "-fn", "3",
         "--num-classes", "3"]
    )
    assert _config_from_args(other).flow_schedule == "full"
