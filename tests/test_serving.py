"""Serving-export tests: the fused ensemble round-trips through a
StableHLO artifact (jax.export) and reproduces the production member
forward exactly; TPU artifacts can be lowered on this CPU host.

Replaces the reference's deployment story — rebuilding the Keras graph
and running predict_generator per member (evaluate_ensemble.py:1032-1063)
— with a self-contained versioned module.
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from crowded_scenes_ensemble_classification_tpu.core.config import ClipSpec
from crowded_scenes_ensemble_classification_tpu.ensemble.members import (
    make_member_forward,
    stack_variables,
)
from crowded_scenes_ensemble_classification_tpu.models import C3D
from crowded_scenes_ensemble_classification_tpu.models.registry import ModelBundle
from crowded_scenes_ensemble_classification_tpu.serving import (
    export_ensemble,
    load_serving_artifact,
    save_serving_artifact,
    serving_batch_example,
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
def ensemble():
    bundle = tiny_bundle()
    variables = [bundle.init(jax.random.key(i)) for i in range(2)]
    return bundle, variables


def test_export_roundtrip_matches_member_forward(ensemble, tmp_path):
    bundle, variables = ensemble
    example = serving_batch_example(bundle, batch_size=4)
    rng = np.random.default_rng(0)
    batch = {"rgb": rng.integers(0, 255, example["rgb"].shape).astype(np.uint8)}

    blob = export_ensemble(
        bundle, variables, example, input_scale=1 / 255.0, platforms=("cpu",)
    )
    path = save_serving_artifact(
        str(tmp_path / "ens.zip"), blob,
        {"model_type": "C3D", "members": ["m0", "m1"]},
    )
    serve, meta = load_serving_artifact(path)
    assert meta["members"] == ["m0", "m1"]
    assert serve.platforms == ("cpu",)
    out = serve(batch)

    fwd = make_member_forward(bundle, (32, 32), input_scale=1 / 255.0)
    want = np.asarray(fwd(stack_variables(variables), batch))
    np.testing.assert_allclose(np.asarray(out["probs"]), want, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(out["fused"]), want.sum(0), atol=1e-6
    )
    assert np.asarray(out["preds"]).shape == (4,)
    np.testing.assert_array_equal(
        np.asarray(out["preds"]), want.sum(0).argmax(-1)
    )


def test_export_share_stem_staging_matches_canonical(tmp_path):
    """share_stem_staging=True export (the CLI default for I3D-family
    since round 5 — matches member_probabilities' production graph, 1.2×
    the M-member stem on v5e): the exported artifact's probabilities
    match the canonical unshared member forward."""
    from crowded_scenes_ensemble_classification_tpu.models import I3D

    bundle = ModelBundle(
        model_type="I3D",
        module=I3D(num_classes=3),
        clip=ClipSpec(frames=16, height=64, width=64),
        num_classes=3,
        two_stream=False,
    )
    variables = [bundle.init(jax.random.key(i)) for i in range(2)]
    example = serving_batch_example(bundle, batch_size=2)
    rng = np.random.default_rng(5)
    batch = {"rgb": rng.integers(0, 255, example["rgb"].shape).astype(np.uint8)}

    blob = export_ensemble(
        bundle, variables, example, input_scale=1 / 255.0,
        platforms=("cpu",), share_stem_staging=True,
    )
    serve, _ = load_serving_artifact(
        save_serving_artifact(str(tmp_path / "shared.zip"), blob, {})
    )
    out = serve(batch)

    fwd = make_member_forward(bundle, (64, 64), input_scale=1 / 255.0)
    want = np.asarray(fwd(stack_variables(variables), batch))
    np.testing.assert_allclose(np.asarray(out["probs"]), want, atol=2e-5)


def test_export_custom_fusion_weights(ensemble, tmp_path):
    bundle, variables = ensemble
    example = serving_batch_example(bundle, batch_size=2)
    w = np.asarray([0.75, 0.25], np.float32)
    blob = export_ensemble(
        bundle, variables, example, weights=w, input_scale=1 / 255.0,
        platforms=("cpu",),
    )
    serve, _ = load_serving_artifact(
        save_serving_artifact(str(tmp_path / "w.zip"), blob, {})
    )
    rng = np.random.default_rng(1)
    batch = {"rgb": rng.integers(0, 255, example["rgb"].shape).astype(np.uint8)}
    out = serve(batch)
    probs = np.asarray(out["probs"])
    np.testing.assert_allclose(
        np.asarray(out["fused"]), np.einsum("mbc,m->bc", probs, w), atol=1e-6
    )


def test_export_tpu_platform_lowering_on_cpu_host(ensemble):
    """TPU serving artifacts must be producible on a CPU-only host —
    jax.export lowering is ahead-of-time and cross-platform."""
    bundle, variables = ensemble
    example = serving_batch_example(bundle, batch_size=1)
    blob = export_ensemble(
        bundle, variables, example, input_scale=1 / 255.0, platforms=("tpu",)
    )
    assert len(blob) > 1000
    exp = jax.export.deserialize(blob)
    assert exp.platforms == ("tpu",)


def test_serving_batch_example_two_stream_shapes():
    bundle = ModelBundle(
        model_type="TWOSTREAM_I3D",
        module=None,
        clip=ClipSpec(frames=8, height=16, width=16),
        num_classes=3,
        two_stream=True,
    )
    ex = serving_batch_example(bundle, 2, flow_precomputed=True)
    assert ex["flow"].shape == (2, 8, 16, 16, 2)
    ex = serving_batch_example(bundle, 2, flow_precomputed=False)
    assert ex["gray"].shape == (2, 8, 16, 16, 1)
    assert ex["gray_next"].shape == (2, 8, 16, 16, 1)


def test_export_two_stream_with_device_flow(tmp_path):
    """The flow-inclusive serving artifact: the exported module contains
    the on-device Farnebäck solver (gray pairs in, flow computed inside)
    plus both trunks and fusion — the reference's whole TwoStream predict
    path (train.py:148-242 + evaluate_ensemble.py:1032-1063) as one
    deployable module."""
    from crowded_scenes_ensemble_classification_tpu.models import TwoStreamI3D

    bundle = ModelBundle(
        model_type="TWOSTREAM_I3D",
        module=TwoStreamI3D(num_classes=2),
        clip=ClipSpec(frames=16, height=64, width=64, flow_channels=2),
        num_classes=2,
        two_stream=True,
    )
    variables = [
        bundle.module.init(
            jax.random.key(i),
            jnp.zeros((1, 16, 64, 64, 3)),
            jnp.zeros((1, 16, 64, 64, 2)),
            train=False,
        )
        for i in range(2)
    ]
    example = serving_batch_example(bundle, 2, flow_precomputed=False)
    blob = export_ensemble(
        bundle, variables, example, input_scale=1 / 255.0, platforms=("cpu",)
    )
    serve, _ = load_serving_artifact(
        save_serving_artifact(str(tmp_path / "ts.zip"), blob, {})
    )
    rng = np.random.default_rng(3)
    batch = {
        "rgb": rng.integers(0, 255, (2, 16, 64, 64, 3)).astype(np.uint8),
        "gray": rng.integers(0, 255, (2, 16, 64, 64, 1)).astype(np.uint8),
        "gray_next": rng.integers(0, 255, (2, 16, 64, 64, 1)).astype(np.uint8),
    }
    out = serve(batch)
    fwd = make_member_forward(bundle, (64, 64), input_scale=1 / 255.0)
    want = np.asarray(fwd(stack_variables(variables), batch))
    np.testing.assert_allclose(np.asarray(out["probs"]), want, atol=1e-5)


def test_export_unbaked_params(ensemble, tmp_path):
    """bake_params=False: lean module, parameters supplied at call time —
    artifact is small and outputs match the baked form exactly."""
    bundle, variables = ensemble
    example = serving_batch_example(bundle, batch_size=2)
    baked = export_ensemble(
        bundle, variables, example, input_scale=1 / 255.0, platforms=("cpu",)
    )
    lean = export_ensemble(
        bundle, variables, example, input_scale=1 / 255.0, platforms=("cpu",),
        bake_params=False,
    )
    assert len(lean) < len(baked)
    serve, _ = load_serving_artifact(
        save_serving_artifact(str(tmp_path / "lean.zip"), lean, {})
    )
    rng = np.random.default_rng(5)
    batch = {"rgb": rng.integers(0, 255, example["rgb"].shape).astype(np.uint8)}
    out = serve(stack_variables(variables), batch)
    sb, _ = load_serving_artifact(
        save_serving_artifact(str(tmp_path / "baked.zip"), baked, {})
    )
    np.testing.assert_allclose(
        np.asarray(out["probs"]), np.asarray(sb(batch)["probs"]), atol=1e-6
    )


def test_export_sharded_multichip_artifact(ensemble, tmp_path):
    """Mesh-exported serving artifact: SPMD member×data shardings are
    recorded in the module (nr_devices), the runtime supplies the sharded
    params, and outputs match the single-chip artifact exactly."""
    from crowded_scenes_ensemble_classification_tpu.core.mesh import make_mesh
    from crowded_scenes_ensemble_classification_tpu.ensemble.members import (
        shard_stacked,
    )

    bundle, variables = ensemble
    mesh = make_mesh((("member", 2), ("data", -1)))
    example = serving_batch_example(bundle, batch_size=4)
    blob = export_ensemble(
        bundle, variables, example, input_scale=1 / 255.0, mesh=mesh
    )
    serve, _ = load_serving_artifact(
        save_serving_artifact(str(tmp_path / "sharded.zip"), blob, {})
    )
    assert serve.nr_devices == 8

    rng = np.random.default_rng(4)
    batch = {"rgb": rng.integers(0, 255, example["rgb"].shape).astype(np.uint8)}
    stacked = shard_stacked(stack_variables(variables), mesh)
    out = serve(stacked, batch)

    fwd = make_member_forward(bundle, (32, 32), input_scale=1 / 255.0)
    want = np.asarray(fwd(stack_variables(variables), batch))
    np.testing.assert_allclose(np.asarray(out["probs"]), want, atol=2e-5)


@pytest.fixture(scope="module")
def trained_workdir(tmp_path_factory):
    """A tiny trained 2-member fold-0 ensemble + its work dir and test CSV
    (shared by the export/serve CLI end-to-end tests)."""
    import optax

    from crowded_scenes_ensemble_classification_tpu.core.config import (
        ExperimentConfig,
    )
    from crowded_scenes_ensemble_classification_tpu.data import (
        generate_synthetic_dataset,
    )
    from crowded_scenes_ensemble_classification_tpu.orchestration import (
        prepare_ensemble,
        train_member,
    )

    root = tmp_path_factory.mktemp("serve_cli")
    df = generate_synthetic_dataset(
        str(root / "data"), num_scenes=6, clips_per_scene=2,
        num_classes=3, num_frames=16, hw=(40, 40), as_videos=False,
    )
    config = ExperimentConfig(
        model_type="C3D", folds_number=3, num_classes=3, batch_size=4,
        epochs=1, input_scale=1 / 255.0,
    )
    layout = prepare_ensemble(config, df, str(root / "work"))
    bundle = tiny_bundle()
    for v in (1, 2):
        train_member(
            config, layout, 0, v, epochs=1, bundle=bundle,
            staging_hw=(40, 40), num_workers=2,
            optimizer=optax.inject_hyperparams(optax.adam)(learning_rate=2e-3),
        )
    return root, layout.split_csv(0, 1, "test")


def _cli(argv):
    """Run the CLI with build_model patched to the tiny C3D: the real CLI
    builds the FULL-size model, but the fixture's checkpoints are
    tiny-width — patching keeps these CPU-friendly e2e of the real
    dispatch path."""
    import crowded_scenes_ensemble_classification_tpu.models as models_pkg
    from crowded_scenes_ensemble_classification_tpu.cli.main import main

    orig = models_pkg.build_model
    models_pkg.build_model = lambda mt, nc, **kw: tiny_bundle(nc)
    try:
        return main(argv)
    finally:
        models_pkg.build_model = orig


def test_export_cli_end_to_end(trained_workdir):
    """The export subcommand: train-member checkpoints → one artifact."""
    root, _ = trained_workdir
    out_path = str(root / "fold0.zip")
    rc = _cli([
        "export", "--work-dir", str(root / "work"), "-mt", "C3D",
        "-fn", "3", "--num-classes", "3", "-t", "0",
        "--out", out_path, "--serve-batch", "2", "--platforms", "cpu",
    ])
    assert rc == 0
    serve, meta = load_serving_artifact(out_path)
    assert len(meta["members"]) == 2
    assert meta["input_scale"] == pytest.approx(1 / 255.0)
    assert meta["params_baked"] is True
    assert meta["experiment"]["model_type"] == "C3D"
    rng = np.random.default_rng(2)
    out = serve({"rgb": rng.integers(0, 255, (2, 16, 32, 32, 3)).astype(np.uint8)})
    probs = np.asarray(out["probs"])
    assert probs.shape == (2, 2, 3)
    np.testing.assert_allclose(probs.sum(-1), 1.0, rtol=1e-4)


def test_serve_cli_end_to_end(trained_workdir, capsys):
    """export → serve: the artifact classifies the fold's test CSV with no
    framework model code on the serving side (the reference's deployment
    story, evaluate_ensemble.py:1032-1063, as two commands)."""
    import pandas as pd

    root, test_csv = trained_workdir
    art = str(root / "serve.zip")
    assert _cli([
        "export", "--work-dir", str(root / "work"), "-mt", "C3D",
        "-fn", "3", "--num-classes", "3", "-t", "0",
        "--out", art, "--serve-batch", "2", "--platforms", "cpu",
    ]) == 0
    out_csv = str(root / "preds.csv")
    rc = _cli([
        "serve", "--artifact", art, "--csv", test_csv,
        "--out", out_csv, "--num-workers", "2",
    ])
    assert rc == 0
    printed = capsys.readouterr().out
    assert "accuracy:" in printed

    got = pd.read_csv(out_csv)
    src = pd.read_csv(test_csv)
    assert len(got) == len(src)  # final partial batch unpadded in the CSV
    assert list(got["rgbclips_path"]) == list(src["rgbclips_path"])
    assert got["prediction"].between(0, 2).all()

    # cross-check one batch against the raw artifact call
    from crowded_scenes_ensemble_classification_tpu.data.pipeline import (
        BatchPipeline,
        SampleSpec,
    )

    serve, meta = load_serving_artifact(art)
    spec = SampleSpec(num_frames=16, staging_hw=(32, 32))
    pipe = BatchPipeline(src, spec, batch_size=2, shuffle=False, num_workers=2)
    want = []
    for batch in pipe.batches(0):
        out = serve({"rgb": batch["rgb"]})
        want.append(np.asarray(out["preds"])[np.asarray(batch["valid"])])
    np.testing.assert_array_equal(got["prediction"].values, np.concatenate(want))


def test_serve_cli_lean_artifact(trained_workdir):
    """--no-bake-params round trip: serve reloads the member checkpoints
    from --work-dir (metadata carries the full experiment config) and
    matches the baked artifact's predictions."""
    import pandas as pd

    root, test_csv = trained_workdir
    lean = str(root / "lean.zip")
    assert _cli([
        "export", "--work-dir", str(root / "work"), "-mt", "C3D",
        "-fn", "3", "--num-classes", "3", "-t", "0",
        "--out", lean, "--serve-batch", "2", "--platforms", "cpu",
        "--no-bake-params",
    ]) == 0
    _, meta = load_serving_artifact(lean)
    assert meta["params_baked"] is False

    # without --work-dir the CLI must refuse, not crash
    assert _cli(["serve", "--artifact", lean, "--csv", test_csv]) == 2

    out_csv = str(root / "lean_preds.csv")
    assert _cli([
        "serve", "--artifact", lean, "--csv", test_csv,
        "--out", out_csv, "--work-dir", str(root / "work"),
        "--num-workers", "2",
    ]) == 0
    baked_csv = str(root / "preds.csv")
    if os.path.exists(baked_csv):  # produced by the baked serve test
        np.testing.assert_array_equal(
            pd.read_csv(out_csv)["prediction"].values,
            pd.read_csv(baked_csv)["prediction"].values,
        )
