"""HBM-resident dataset tests: device-side gather batching matches the
dense path exactly, shards cleanly over the virtual mesh, and drives the
standard fit/evaluate loops (data.resident + train.engine resident steps).

The capability under test replaces the reference's per-epoch decode+feed
hot loop (reference train.py:257-269) with a one-time upload: epochs ≥2
ship only int32 indices to the device.
"""

import numpy as np
import optax
import pytest

import jax

from crowded_scenes_ensemble_classification_tpu.core.config import ClipSpec
from crowded_scenes_ensemble_classification_tpu.core.mesh import make_mesh
from crowded_scenes_ensemble_classification_tpu.data import (
    BatchPipeline,
    ResidentClips,
    SampleSpec,
    generate_synthetic_dataset,
)
from crowded_scenes_ensemble_classification_tpu.models import C3D
from crowded_scenes_ensemble_classification_tpu.models.registry import ModelBundle
from crowded_scenes_ensemble_classification_tpu.train import (
    LRPolicy,
    TrainState,
    evaluate_model,
    fit,
    make_eval_step,
    make_resident_eval_step,
    make_resident_train_step,
    make_train_step,
)


def tiny_bundle(num_classes=3):
    return ModelBundle(
        model_type="C3D",
        module=C3D(num_classes=num_classes, width=0.125),
        clip=ClipSpec(frames=16, height=32, width=32),
        num_classes=num_classes,
        two_stream=False,
    )


def _adam(lr=2e-3):
    return optax.inject_hyperparams(optax.adam)(learning_rate=lr)


def _data(n=16, staging=(40, 40), frames=16, seed=0):
    rng = np.random.default_rng(seed)
    # class-correlated stripes so fit() can actually learn
    rgb = np.empty((n, frames, *staging, 3), np.uint8)
    for i in range(n):
        base = rng.integers(0, 80, (frames, *staging, 3))
        stripe = ((np.arange(staging[1]) // 4) % 3 == i % 3) * 120
        rgb[i] = np.clip(base + stripe[None, None, :, None], 0, 255)
    labels = (np.arange(n) % 3).astype(np.int32)
    return rgb, labels


def _fresh_state(bundle, tx, seed=0):
    variables = bundle.init(jax.random.key(seed), batch_size=1)
    return TrainState.create(variables, tx, jax.random.key(seed + 1))


def test_resident_step_matches_dense():
    """Gather-then-body must equal dense make_train_step bit-for-bit on the
    same rows (same state ⇒ same fold-in rng ⇒ same augment/dropout keys)."""
    bundle = tiny_bundle()
    tx = _adam()
    rgb, labels = _data()
    rc = ResidentClips({"rgb": rgb}, labels, batch_size=8, shuffle=False)
    batch = next(iter(rc.batches(0)))

    rstep = make_resident_train_step(
        bundle, tx, (32, 32), augment=True, input_scale=1 / 255.0
    )
    dstep = make_train_step(
        bundle, tx, (32, 32), augment=True, input_scale=1 / 255.0
    )
    cw = np.ones(3, np.float32)
    s_r, m_r = rstep(_fresh_state(bundle, tx), batch, cw)

    idx = np.asarray(batch["index"])
    dense_batch = {
        "rgb": rgb[idx],
        "label": labels[idx],
        "valid": np.asarray(batch["valid"]),
    }
    s_d, m_d = dstep(_fresh_state(bundle, tx), dense_batch, cw)

    np.testing.assert_allclose(
        float(m_r["loss"]), float(m_d["loss"]), rtol=1e-6
    )
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-6
        ),
        s_r.params,
        s_d.params,
    )


def test_resident_sharded_matches_dense():
    """Sharded resident step (per-shard local gather under shard_map) vs
    the dense step on the same global rows (batch['index'])."""
    bundle = tiny_bundle()
    tx = _adam()
    mesh = make_mesh((("data", -1),))
    rgb, labels = _data(n=16)
    rc = ResidentClips({"rgb": rgb}, labels, batch_size=8, mesh=mesh, shuffle=False)
    assert rc.n_shards == mesh.devices.size
    batch = next(iter(rc.batches(0)))

    rstep = make_resident_train_step(
        bundle, tx, (32, 32), augment=False, input_scale=1 / 255.0, mesh=mesh
    )
    dstep = make_train_step(
        bundle, tx, (32, 32), augment=False, input_scale=1 / 255.0
    )
    cw = np.ones(3, np.float32)
    s_r, m_r = rstep(_fresh_state(bundle, tx), batch, cw)

    idx = np.asarray(batch["index"])
    dense_batch = {
        "rgb": rgb[idx],
        "label": labels[idx],
        "valid": np.asarray(batch["valid"]),
    }
    s_d, m_d = dstep(_fresh_state(bundle, tx), dense_batch, cw)

    np.testing.assert_allclose(
        float(m_r["loss"]), float(m_d["loss"]), rtol=1e-5
    )
    # SPMD reduction-order noise is amplified by Adam's g/√v normalization
    # on the first step — allow a few e-5 absolute on the updated params.
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-5
        ),
        s_r.params,
        s_d.params,
    )


def test_resident_epoch_coverage_and_padding():
    """Every clip appears exactly once per epoch; the padded tail batch is
    masked; shuffling is deterministic per (seed, epoch) and differs
    across epochs."""
    rgb, labels = _data(n=10)
    rc = ResidentClips({"rgb": rgb}, labels, batch_size=4, shuffle=True, seed=3)
    assert len(rc) == 3
    seen = []
    for batch in rc.batches(0):
        seen.extend(np.asarray(batch["index"])[np.asarray(batch["valid"])])
    assert sorted(seen) == list(range(10))
    e0 = [np.asarray(b["indices"]).tolist() for b in rc.batches(0)]
    e0b = [np.asarray(b["indices"]).tolist() for b in rc.batches(0)]
    e1 = [np.asarray(b["indices"]).tolist() for b in rc.batches(1)]
    assert e0 == e0b and e0 != e1


def test_resident_fit_and_eval_end_to_end(tmp_path):
    """fit() + evaluate_model() run unchanged over ResidentClips (built
    from a BatchPipeline via from_pipeline) with the resident steps: the
    model learns the synthetic classes and eval counts every clip once."""
    bundle = tiny_bundle()
    tx = _adam()
    df = generate_synthetic_dataset(
        str(tmp_path), num_scenes=9, clips_per_scene=4, num_classes=3,
        num_frames=16, hw=(40, 40), as_videos=False,
    )
    df = df.rename(columns={"label": "class"})
    spec = SampleSpec(num_frames=16, staging_hw=(40, 40))
    n_train = len(df) * 2 // 3
    rc_train = ResidentClips.from_pipeline(
        BatchPipeline(df.iloc[:n_train].reset_index(drop=True), spec,
                      batch_size=8, seed=1, num_workers=2)
    )
    rc_val = ResidentClips.from_pipeline(
        BatchPipeline(df.iloc[n_train:].reset_index(drop=True), spec,
                      batch_size=8, shuffle=False, num_workers=2)
    )
    n_val = len(df) - n_train

    tstep = make_resident_train_step(
        bundle, tx, (32, 32), augment=False, input_scale=1 / 255.0
    )
    estep = make_resident_eval_step(bundle, (32, 32), input_scale=1 / 255.0)
    result = fit(
        bundle,
        rc_train,
        rc_val,
        epochs=8,
        seed=0,
        balanced_classes=True,
        input_scale=1 / 255.0,
        lr_policy=LRPolicy(initial_lr=2e-3),
        optimizer=tx,
        train_step=tstep,
        eval_step=estep,
    )
    hist = result["history"]
    assert hist["loss"][-1] < hist["loss"][0]
    # same signal/budget as test_fit_learns_synthetic: clearly above chance
    assert hist["accuracy"][-1] > 0.5

    out = evaluate_model(
        bundle,
        result["state"].variables(),
        rc_val,
        (32, 32),
        collect_probs=True,
        eval_step=estep,
    )
    assert out["count"] == n_val
    assert out["probs"].shape == (n_val, 3)
    np.testing.assert_allclose(out["probs"].sum(-1), 1.0, rtol=1e-4)


def test_resident_eval_matches_dense_eval():
    bundle = tiny_bundle()
    rgb, labels = _data(n=8)
    variables = bundle.init(jax.random.key(0), batch_size=1)
    rc = ResidentClips({"rgb": rgb}, labels, batch_size=8, shuffle=False)
    r_out = evaluate_model(
        bundle, variables, rc, (32, 32),
        eval_step=make_resident_eval_step(bundle, (32, 32), input_scale=1 / 255.0),
    )
    pipe_batch = {
        "rgb": rgb,
        "label": labels,
        "valid": np.ones(8, bool),
    }
    d_step = make_eval_step(bundle, (32, 32), input_scale=1 / 255.0)
    d_out = d_step(variables, pipe_batch)
    np.testing.assert_allclose(
        r_out["loss"], float(d_out["loss_sum"]) / 8.0, rtol=1e-5
    )


def test_resident_pixels_stored_flat():
    """Pixel arrays live FLAT on device (FlatRows): the TPU default tiled
    layout pads a dense (N, T, H, W, 3) u8 buffer's 3-channel lane dim to
    128 — 42.7× HBM (measured on v5e: a 1.9 GB split allocated 80 GB and
    OOMed).  The logical views (shape / indexing / __array__) stay dense."""
    from crowded_scenes_ensemble_classification_tpu.data.resident import (
        FlatRows,
    )

    rgb, labels = _data(n=8)
    rc = ResidentClips({"rgb": rgb}, labels, batch_size=4, shuffle=False)
    fr = rc.resident["rgb"]
    assert isinstance(fr, FlatRows)
    assert fr.flat.ndim == 2  # the on-device array truly is 2-D
    assert fr.flat.shape == (8, int(np.prod(rgb.shape[1:])))
    assert fr.shape == rgb.shape and fr.dtype == rgb.dtype
    assert len(fr) == 8 and fr.nbytes == rgb.nbytes
    np.testing.assert_array_equal(np.asarray(fr), rgb)
    np.testing.assert_array_equal(np.asarray(fr[3]), rgb[3])
    # labels stay plain 1-D device arrays
    assert not isinstance(rc.resident["label"], FlatRows)


def test_from_pipeline_roundtrip(tmp_path):
    df = generate_synthetic_dataset(
        str(tmp_path), num_scenes=3, clips_per_scene=2, num_classes=3,
        num_frames=8, hw=(24, 24), as_videos=False,
    )
    df = df.rename(columns={"label": "class"})
    spec = SampleSpec(num_frames=8, staging_hw=(24, 24))
    pipe = BatchPipeline(df, spec, batch_size=4, seed=7, num_workers=2)
    rc = ResidentClips.from_pipeline(pipe)
    assert rc.n == len(df)
    assert rc.batch_size == 4 and rc.seed == 7 and rc.shuffle
    first = pipe.source(pipe.df.iloc[0])
    np.testing.assert_array_equal(np.asarray(rc.resident["rgb"][0]), first["rgb"])
    assert rc.nbytes >= rc.resident["rgb"].nbytes


def test_resident_tiny_dataset_on_big_mesh():
    """pad > n regression: a dataset smaller than the shard count must
    construct (cycled pad rows) and still cover every real clip once."""
    rgb, labels = _data(n=3)
    mesh = make_mesh((("data", -1),))
    rc = ResidentClips({"rgb": rgb}, labels, batch_size=8, mesh=mesh)
    assert rc.n_padded == 8
    seen = []
    for batch in rc.batches(0):
        v = np.asarray(batch["valid"])
        seen.extend(np.asarray(batch["index"])[v])
    assert sorted(seen) == [0, 1, 2]


def test_resident_preshuffle_and_pad_to():
    """preshuffle permutes rows once (index reports ORIGINAL ids; labels
    follow their pixels) and pad_to pins the padded size so differently
    sized datasets share one step shape."""
    rgb, labels = _data(n=10)
    rc = ResidentClips(
        {"rgb": rgb}, labels, batch_size=4, shuffle=False, preshuffle=7,
        pad_to=16,
    )
    assert rc.n_padded == 16
    seen = {}
    for batch in rc.batches(0):
        v = np.asarray(batch["valid"])
        ids = np.asarray(batch["index"])[v]
        rows = np.asarray(batch["indices"])[v]
        for i, r in zip(ids, rows):
            seen[int(i)] = int(r)
    assert sorted(seen) == list(range(10))
    # labels/pixels moved together under the permutation
    for orig, row in seen.items():
        assert int(np.asarray(rc.resident["label"])[row]) == labels[orig]
        np.testing.assert_array_equal(
            np.asarray(rc.resident["rgb"])[row], rgb[orig]
        )

    rc2 = ResidentClips(
        {"rgb": rgb[:7]}, labels[:7], batch_size=4, shuffle=False, pad_to=16
    )
    assert rc2.resident["rgb"].shape == rc.resident["rgb"].shape


def test_sharded_eval_probs_restore_dataset_order():
    """evaluate_model(collect_probs=True) must return probs in clip-id
    order even though a mesh-sharded ResidentClips yields rows
    shard-interleaved."""
    bundle = tiny_bundle()
    rgb, labels = _data(n=16)
    variables = bundle.init(jax.random.key(0), batch_size=1)
    mesh = make_mesh((("data", -1),))
    rc = ResidentClips({"rgb": rgb}, labels, batch_size=8, mesh=mesh, shuffle=False)
    estep = make_resident_eval_step(bundle, (32, 32), mesh=mesh, input_scale=1 / 255.0)
    out = evaluate_model(
        bundle, variables, rc, (32, 32), mesh=mesh, collect_probs=True,
        eval_step=estep,
    )
    # reference: dense eval on the clips in dataset order
    dstep = make_eval_step(bundle, (32, 32), input_scale=1 / 255.0)
    ref = dstep(
        variables,
        {"rgb": rgb, "label": labels, "valid": np.ones(16, bool)},
    )
    np.testing.assert_allclose(
        out["probs"], np.asarray(ref["probs"]), atol=2e-5
    )


def test_resident_validation_errors():
    rgb, labels = _data(n=10)
    mesh = make_mesh((("data", -1),))
    with pytest.raises(ValueError, match="not divisible"):
        ResidentClips({"rgb": rgb}, labels, batch_size=12, mesh=mesh)
    with pytest.raises(ValueError, match="rows"):
        ResidentClips({"rgb": rgb[:5]}, labels, batch_size=4)


def test_train_member_resident_e2e(tmp_path):
    """Orchestration-level resident mode: train_member(resident=True)
    pins the split's staged clips once and trains/evals through the
    resident steps (the `--resident` CLI path), producing the standard
    checkpoint + history artifacts."""
    import os

    from crowded_scenes_ensemble_classification_tpu.core.config import (
        ExperimentConfig,
    )
    from crowded_scenes_ensemble_classification_tpu.orchestration import (
        member_cli_commands,
        prepare_ensemble,
        train_member,
    )

    df = generate_synthetic_dataset(
        str(tmp_path / "data"), num_scenes=6, clips_per_scene=3,
        num_classes=3, num_frames=16, hw=(40, 40), as_videos=False,
    )
    config = ExperimentConfig(
        model_type="C3D", training_condition="_SCRATCH", folds_number=3,
        num_classes=3, batch_size=6, epochs=2,
    )
    layout = prepare_ensemble(config, df, str(tmp_path / "work"))
    out = train_member(
        config, layout, 0, 1,
        epochs=2,
        bundle=tiny_bundle(),
        input_scale=1 / 255.0,
        staging_hw=(40, 40),
        num_workers=2,
        optimizer=_adam(),
        resident=True,
    )
    assert np.isfinite(out["test_loss"])
    assert os.path.exists(out["checkpoint_dir"])
    assert os.path.exists(layout.history_path(config, 0, 1))

    # the sbatch-parity command list forwards the flag
    cmds = member_cli_commands(config, layout.root, resident=True)
    assert all("--resident" in c for c in cmds)


def test_resident_uneven_shards_coverage_and_parity():
    """Datasets that don't divide evenly over the mesh: pad rows are never
    valid, every real clip is seen exactly once per epoch, and the sharded
    step's loss matches the dense step on the same (masked) rows."""
    bundle = tiny_bundle()
    tx = _adam()
    mesh = make_mesh((("data", -1),))
    rgb, labels = _data(n=12)  # 12 over 8 shards → 2 rows/shard, 4 pad rows
    rc = ResidentClips({"rgb": rgb}, labels, batch_size=8, mesh=mesh, shuffle=False)
    assert rc.n_padded == 16
    seen = []
    for batch in rc.batches(0):
        v = np.asarray(batch["valid"])
        seen.extend(np.asarray(batch["index"])[v])
    assert sorted(seen) == list(range(12))

    rstep = make_resident_train_step(
        bundle, tx, (32, 32), augment=False, input_scale=1 / 255.0, mesh=mesh
    )
    dstep = make_train_step(
        bundle, tx, (32, 32), augment=False, input_scale=1 / 255.0
    )
    cw = np.ones(3, np.float32)
    batch = next(iter(rc.batches(0)))
    s_r, m_r = rstep(_fresh_state(bundle, tx), batch, cw)
    idx = np.asarray(batch["index"]) % 12  # pad rows cycle from the front
    dense_batch = {
        "rgb": rgb[idx],
        "label": labels[idx],
        "valid": np.asarray(batch["valid"]),
    }
    s_d, m_d = dstep(_fresh_state(bundle, tx), dense_batch, cw)
    np.testing.assert_allclose(
        float(m_r["loss"]), float(m_d["loss"]), rtol=1e-5
    )
