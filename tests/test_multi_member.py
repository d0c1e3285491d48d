"""Member-parallel training tests: vmapped multi-member step on the
(member, data) mesh equals per-member sequential training."""

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from crowded_scenes_ensemble_classification_tpu.core.config import ClipSpec
from crowded_scenes_ensemble_classification_tpu.core.mesh import make_mesh
from crowded_scenes_ensemble_classification_tpu.models import C3D
from crowded_scenes_ensemble_classification_tpu.models.registry import ModelBundle
from crowded_scenes_ensemble_classification_tpu.train import (
    TrainState,
    make_multi_member_train_step,
    make_train_step,
    stack_states,
    unstack_states,
    zip_member_batches,
)


def bundle3():
    return ModelBundle(
        "C3D", C3D(num_classes=3, width=0.125), ClipSpec(16, 32, 32), 3, False
    )


def make_batch(rng, B=4):
    return {
        "rgb": rng.integers(0, 255, (B, 16, 36, 36, 3)).astype(np.uint8),
        "label": rng.integers(0, 3, B).astype(np.int32),
        "valid": np.ones(B, bool),
        "index": np.arange(B),
    }


def test_multi_member_matches_sequential():
    bundle = bundle3()
    tx = optax.inject_hyperparams(optax.adam)(learning_rate=2e-3)
    rng = np.random.default_rng(0)
    M = 2
    states = [
        TrainState.create(bundle.init(jax.random.key(i)), tx, jax.random.key(100 + i))
        for i in range(M)
    ]
    batches = [make_batch(rng) for _ in range(M)]
    cw = jnp.ones((3,), jnp.float32)

    # sequential oracle
    seq_step = make_train_step(bundle, tx, (32, 32), augment=False, input_scale=1 / 255.0)
    seq_out = []
    for s, b in zip(states, batches):
        ns, m = seq_step(s, b, cw)
        seq_out.append((ns, float(m["loss"])))

    # vmapped (fresh states — the sequential step donated its inputs)
    states = [
        TrainState.create(bundle.init(jax.random.key(i)), tx, jax.random.key(100 + i))
        for i in range(M)
    ]
    stacked = stack_states(states)
    mstep = make_multi_member_train_step(
        bundle, tx, (32, 32), augment=False, input_scale=1 / 255.0
    )
    sb = {k: np.stack([b[k] for b in batches]) for k in batches[0]}
    new_stacked, metrics = mstep(stacked, sb, cw)

    np.testing.assert_allclose(
        np.asarray(metrics["loss"]), [l for _, l in seq_out], rtol=1e-4
    )
    unstacked = unstack_states(new_stacked, M)
    for i in range(M):
        a = jax.tree_util.tree_leaves(unstacked[i].params)
        b = jax.tree_util.tree_leaves(seq_out[i][0].params)
        for x, y in zip(a, b):
            np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=2e-5)


def test_multi_member_on_mesh():
    bundle = bundle3()
    tx = optax.inject_hyperparams(optax.adam)(learning_rate=2e-3)
    mesh = make_mesh((("member", 2), ("data", -1)))
    rng = np.random.default_rng(1)
    states = stack_states(
        [
            TrainState.create(bundle.init(jax.random.key(i)), tx, jax.random.key(i))
            for i in range(2)
        ]
    )
    step = make_multi_member_train_step(
        bundle, tx, (32, 32), augment=True, input_scale=1 / 255.0, mesh=mesh
    )
    sb = {k: np.stack([make_batch(rng)[k], make_batch(rng)[k]]) for k in make_batch(rng)}
    states, metrics = step(states, sb, jnp.ones((3,), jnp.float32))
    assert metrics["loss"].shape == (2,)
    assert np.isfinite(np.asarray(metrics["loss"])).all()


def test_zip_member_batches():
    def it(n, base):
        for i in range(n):
            yield {"rgb": np.full((2, 3), base + i), "label": np.array([base, base])}

    out = list(zip_member_batches([it(3, 0), it(2, 10)]))
    assert len(out) == 2  # shortest member
    assert out[0]["rgb"].shape == (2, 2, 3)
    np.testing.assert_array_equal(out[1]["label"][1], [10, 10])
