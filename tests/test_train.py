"""Train engine tests: a tiny C3D learns synthetic classes end-to-end on
CPU; callbacks mirror reference semantics (SURVEY.md §4f)."""

import math
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from crowded_scenes_ensemble_classification_tpu.core.config import ClipSpec
from crowded_scenes_ensemble_classification_tpu.core.mesh import make_mesh
from crowded_scenes_ensemble_classification_tpu.data import (
    BatchPipeline,
    SampleSpec,
    generate_synthetic_dataset,
)
from crowded_scenes_ensemble_classification_tpu.models import C3D
from crowded_scenes_ensemble_classification_tpu.models.registry import ModelBundle
from crowded_scenes_ensemble_classification_tpu.train import (
    EarlyStopping,
    LRPolicy,
    ReduceLROnPlateau,
    StepDecayEvery4,
    evaluate_model,
    fit,
    lr_policy_for,
    restore_best,
    save_best,
)


def tiny_c3d_bundle(num_classes=3):
    """C3D shrunk to 16x32x32 / width 0.125 so CPU CI is fast; same topology."""
    return ModelBundle(
        model_type="C3D",
        module=C3D(num_classes=num_classes, width=0.125),
        clip=ClipSpec(frames=16, height=32, width=32),
        num_classes=num_classes,
        two_stream=False,
    )


def _adam_for_tests(lr=2e-3):
    import optax

    return optax.inject_hyperparams(optax.adam)(learning_rate=lr)


@pytest.fixture(scope="module")
def synth(tmp_path_factory):
    root = tmp_path_factory.mktemp("train_synth")
    df = generate_synthetic_dataset(
        str(root), num_scenes=9, clips_per_scene=4, num_classes=3,
        num_frames=16, hw=(40, 40), as_videos=False,
    )
    df = df.rename(columns={"label": "class"})
    return df


def make_pipes(df, bundle):
    spec = SampleSpec(num_frames=bundle.clip.frames, staging_hw=(40, 40))
    train_df = df.iloc[: len(df) * 2 // 3].reset_index(drop=True)
    val_df = df.iloc[len(df) * 2 // 3 :].reset_index(drop=True)
    return (
        BatchPipeline(train_df, spec, batch_size=8, seed=1, num_workers=2),
        BatchPipeline(val_df, spec, batch_size=8, shuffle=False, num_workers=2),
    )


def test_fit_learns_synthetic(synth, tmp_path):
    bundle = tiny_c3d_bundle()
    train_pipe, val_pipe = make_pipes(synth, bundle)
    result = fit(
        bundle,
        train_pipe,
        val_pipe,
        epochs=8,
        seed=0,
        augment=False,
        checkpoint_dir=str(tmp_path / "ckpt"),
        input_scale=1 / 255.0,
        lr_policy=LRPolicy(initial_lr=2e-3),
        optimizer=_adam_for_tests(),
    )
    hist = result["history"]
    assert len(hist["val_loss"]) >= 1
    assert hist["loss"][-1] < hist["loss"][0]
    # synthetic stripes are easy: expect clearly-above-chance train accuracy
    assert hist["accuracy"][-1] > 0.5

    # best checkpoint restorable and evaluable
    variables = restore_best(str(tmp_path / "ckpt"), result["state"].variables())
    out = evaluate_model(
        bundle, variables, val_pipe, (32, 32), collect_probs=True,
        input_scale=1 / 255.0,
    )
    assert out["count"] == len(val_pipe.df)
    assert out["probs"].shape == (out["count"], 3)
    np.testing.assert_allclose(out["probs"].sum(-1), 1.0, rtol=1e-4)


def test_fit_on_virtual_mesh(synth, tmp_path):
    """Data-parallel fit over the 8-device virtual CPU mesh."""
    bundle = tiny_c3d_bundle()
    mesh = make_mesh((("data", -1),))
    assert mesh.devices.size == 8
    train_pipe, val_pipe = make_pipes(synth, bundle)
    result = fit(
        bundle, train_pipe, val_pipe, epochs=1, seed=0, mesh=mesh,
        input_scale=1 / 255.0, optimizer=_adam_for_tests(),
    )
    assert len(result["history"]["loss"]) == 1
    assert math.isfinite(result["history"]["loss"][0])


def test_fit_balanced_and_augmented(synth):
    bundle = tiny_c3d_bundle()
    train_pipe, val_pipe = make_pipes(synth, bundle)
    result = fit(
        bundle,
        train_pipe,
        val_pipe,
        epochs=1,
        augment=True,
        augment_p=0.75,
        balanced_classes=True,
        input_scale=1 / 255.0,
        optimizer=_adam_for_tests(),
    )
    assert math.isfinite(result["history"]["loss"][0])


def test_fit_traces_eval_step_once(synth, monkeypatch):
    """Regression: fit must build/trace the jitted eval step ONCE per fit,
    not once per epoch (a full XLA recompile per epoch on backends without
    a persistent compile cache)."""
    from crowded_scenes_ensemble_classification_tpu.train import engine

    bundle = tiny_c3d_bundle()
    train_pipe, val_pipe = make_pipes(synth, bundle)

    build_calls = {"n": 0}
    real_make = engine.make_eval_step

    def counting_make(*args, **kwargs):
        build_calls["n"] += 1
        return real_make(*args, **kwargs)

    monkeypatch.setattr(engine, "make_eval_step", counting_make)
    fit(
        bundle, train_pipe, val_pipe, epochs=3, seed=0,
        input_scale=1 / 255.0, optimizer=_adam_for_tests(),
    )
    assert build_calls["n"] == 1


# ------------------------------------------------------------ callbacks


def test_step_decay_every_4():
    s = StepDecayEvery4()
    lr = 0.003
    seen = []
    for epoch in range(9):
        lr = s(epoch, lr)
        seen.append(lr)
    assert seen[0] == pytest.approx(0.003)
    assert seen[4] == pytest.approx(0.0003)
    assert seen[8] == pytest.approx(0.00003)


def test_reduce_on_plateau_patience0():
    """I3D policy: factor 0.1, patience 0 → halve-on-any-non-improvement
    immediately (train.py:1866-1871)."""
    p = ReduceLROnPlateau(factor=0.1, patience=0, min_lr=1e-6)
    lr = 0.003
    lr = p.update(1.0, lr)  # first epoch: improvement vs inf
    assert lr == pytest.approx(0.003)
    lr = p.update(1.1, lr)  # worse → immediate reduction
    assert lr == pytest.approx(0.0003)
    lr = p.update(0.5, lr)  # improvement → hold
    assert lr == pytest.approx(0.0003)


def test_early_stopping():
    e = EarlyStopping(patience=2)
    assert not e.update(1.0)
    assert not e.update(1.1)
    # Keras fires on wait >= patience: the 2nd consecutive non-improvement
    assert e.update(1.2)
    e2 = EarlyStopping(patience=2)
    assert not e2.update(1.0)
    assert not e2.update(1.1)
    assert not e2.update(0.5)  # improvement resets the counter
    assert not e2.update(0.6)
    assert e2.update(0.7)


def test_lr_policy_table():
    c3d = lr_policy_for("C3D")
    assert c3d.step_decay is not None and c3d.plateau.patience == 200
    i3d = lr_policy_for("I3D")
    assert i3d.initial_lr == 0.003 and i3d.plateau.patience == 0
    r3d = lr_policy_for("R3D_18")
    # dead-branch reproduction: R3D uses the I3D plateau policy
    assert r3d.initial_lr == 1e-3 and r3d.plateau.patience == 0


def test_restore_best_prefers_newest_format(tmp_path):
    """When BOTH checkpoint formats exist in one dir (single-process orbax
    run followed by a multi-process msgpack re-train, or vice versa), the
    NEWER save must win — format preference alone would silently
    resurrect stale weights (train.checkpoints._msgpack_wins)."""
    from crowded_scenes_ensemble_classification_tpu.train import checkpoints as cp

    ckpt = str(tmp_path / "ckpt")
    template = {"params": {"w": jnp.zeros((3,), jnp.float32)}}
    vars_a = {"params": {"w": jnp.full((3,), 1.0, jnp.float32)}}
    vars_b = {"params": {"w": jnp.full((3,), 2.0, jnp.float32)}}

    save_best(ckpt, vars_a)  # orbax (single-process path)
    mp_path = cp._best_msgpack(ckpt)
    cp._save_msgpack(mp_path, vars_b)  # simulate the multi-process writer

    orbax_path = os.path.join(ckpt, "best")
    # msgpack newer -> msgpack wins
    os.utime(orbax_path, (1_000_000, 1_000_000))
    os.utime(mp_path, (2_000_000, 2_000_000))
    got = restore_best(ckpt, template)
    np.testing.assert_array_equal(np.asarray(got["params"]["w"]), 2.0)

    # orbax newer (e.g. a later single-process re-train) -> orbax wins
    os.utime(orbax_path, (3_000_000, 3_000_000))
    got = restore_best(ckpt, template)
    np.testing.assert_array_equal(np.asarray(got["params"]["w"]), 1.0)


def test_wire_train_step_matches_dense_path():
    """Wire-fed training (transfer-constrained links) must reproduce the
    dense-batch step: with staging==out and p=0 the shipped windows equal
    the dense path's staged pixels exactly, so loss/metrics/updates match
    (dropout keys derive identically from state.rng/state.step)."""
    import jax
    import jax.numpy as jnp

    from crowded_scenes_ensemble_classification_tpu.data.wire_format import (
        pack_ragged_windows,
        plan_wire_steps,
    )
    from crowded_scenes_ensemble_classification_tpu.train import TrainState
    from crowded_scenes_ensemble_classification_tpu.train.engine import (
        make_train_step,
        make_wire_train_step,
    )

    bundle = tiny_c3d_bundle()
    tx = _adam_for_tests()
    variables = bundle.init(jax.random.key(0), batch_size=1)
    b, t, s = 4, 16, 32
    rng = np.random.default_rng(0)
    clips = rng.integers(0, 255, (b, t, s, s, 3)).astype(np.uint8)
    labels = rng.integers(0, 3, b).astype(np.int32)
    valid = np.ones(b, bool)
    cw = jnp.ones((3,), jnp.float32)

    dense = make_train_step(
        bundle, tx, (s, s), augment=True, augment_p=0.0, input_scale=1 / 255
    )
    batch = {"rgb": clips, "label": labels, "valid": valid, "index": np.arange(b)}
    def fresh_state():
        # deep-copy: the steps donate their state (donate_argnums), and
        # both states must not share donated buffers
        import jax.numpy as _jnp

        v = jax.tree_util.tree_map(_jnp.array, variables)
        return TrainState.create(v, tx, jax.random.key(1))

    s1, m1 = dense(fresh_state(), batch, cw)

    akey = jax.random.key(9)
    plan = plan_wire_steps(akey, 1, b, t, (s, s), (s, s), p=0.0, crop_margin=8)
    wire, offs = pack_ragged_windows(
        plan, 0, np.zeros((0, t, s, s, 3), np.uint8), clips
    )
    wstep = make_wire_train_step(bundle, tx, plan, akey, input_scale=1 / 255)
    s2, m2 = wstep(
        fresh_state(), wire, offs, jnp.uint32(0), labels, valid, cw,
    )
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=1e-5)
    np.testing.assert_allclose(float(m1["accuracy"]), float(m2["accuracy"]))
    for a, c in zip(
        jax.tree_util.tree_leaves(s1.params), jax.tree_util.tree_leaves(s2.params)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(c), atol=2e-6)


def test_wire_train_step_sharded_matches_single_buffer():
    """The sharded wire train step (per-device wire rows over the data
    mesh) must produce the same update as the single-buffer wire step on
    the same packed bytes, crops included."""
    import jax
    import jax.numpy as jnp

    from crowded_scenes_ensemble_classification_tpu.core.mesh import make_mesh
    from crowded_scenes_ensemble_classification_tpu.data.wire_format import (
        pack_ragged_windows,
        pack_sharded_wires,
        plan_wire_steps,
        shard_wire_plan,
    )
    from crowded_scenes_ensemble_classification_tpu.train import TrainState
    from crowded_scenes_ensemble_classification_tpu.train.engine import (
        make_wire_train_step,
    )

    bundle = tiny_c3d_bundle()
    tx = _adam_for_tests()
    variables = bundle.init(jax.random.key(0), batch_size=1)
    b, t, s, stg = 8, 16, 32, 40
    rng = np.random.default_rng(1)
    akey = jax.random.key(3)
    plan = plan_wire_steps(
        akey, 1, b, t, (stg, stg), (s, s), p=0.75, crop_margin=8
    )
    do_crop = plan.steps[0][0]
    staging = rng.integers(
        0, 255, (int(do_crop.sum()), t, stg, stg, 3)
    ).astype(np.uint8)
    eval_u8 = rng.integers(
        0, 255, (int((~do_crop).sum()), t, s, s, 3)
    ).astype(np.uint8)
    labels = rng.integers(0, 3, b).astype(np.int32)
    valid = np.ones(b, bool)
    cw = jnp.ones((3,), jnp.float32)

    wire, offs = pack_ragged_windows(plan, 0, staging, eval_u8)
    single = make_wire_train_step(bundle, tx, plan, akey, input_scale=1 / 255)
    def fresh_state():
        import jax.numpy as _jnp

        v = jax.tree_util.tree_map(_jnp.array, variables)
        return TrainState.create(v, tx, jax.random.key(1))

    s1, m1 = single(
        fresh_state(), wire, offs, jnp.uint32(0), labels, valid, cw,
    )

    mesh = make_mesh((("data", 8),))
    splan = shard_wire_plan(plan, 8)
    wires, soffs = pack_sharded_wires(splan, 0, staging, eval_u8)
    sharded = make_wire_train_step(
        bundle, tx, splan, akey, mesh=mesh, input_scale=1 / 255
    )
    s2, m2 = sharded(
        fresh_state(), wires, soffs, jnp.uint32(0), labels, valid, cw,
    )
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=1e-5)
    for a, c in zip(
        jax.tree_util.tree_leaves(s1.params), jax.tree_util.tree_leaves(s2.params)
    ):
        # SPMD reduction order differs from single-device by ~1e-5
        np.testing.assert_allclose(np.asarray(a), np.asarray(c), atol=5e-5)
