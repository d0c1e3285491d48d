"""Train state: params + batch_stats + optimizer state + step + PRNG.

The reference checkpointed only best-val-loss model weights
(train.py:1850-1853); optimizer state, epoch counter and RNG were lost on
resume.  Here the full state is a pytree checkpointed via orbax
(checkpoints.py), making resume exact (SURVEY.md §5 checkpoint plan).
"""

from __future__ import annotations

from typing import Any, Callable, Dict, NamedTuple, Optional

import flax.struct
import jax
import jax.numpy as jnp
import optax


@flax.struct.dataclass
class TrainState:
    step: jax.Array
    params: Any
    batch_stats: Any
    opt_state: Any
    rng: jax.Array

    @classmethod
    def create(cls, variables: Dict, tx: optax.GradientTransformation, rng: jax.Array):
        params = variables["params"]
        return cls(
            step=jnp.zeros((), jnp.int32),
            params=params,
            batch_stats=variables.get("batch_stats", {}),
            opt_state=tx.init(params),
            rng=rng,
        )

    def variables(self) -> Dict:
        v = {"params": self.params}
        if self.batch_stats:
            v["batch_stats"] = self.batch_stats
        return v


class KerasSGDState(NamedTuple):
    """Velocity ("moments") per parameter — Keras optimizers.SGD state."""

    velocity: optax.Updates


def keras_sgd(learning_rate, momentum: float = 0.0) -> optax.GradientTransformation:
    """Keras 2.2.4 SGD in its exact velocity form:

        v ← momentum·v − lr·g ;  p ← p + v

    optax.sgd's trace form (t ← g + momentum·t; update = −lr·t) is equal
    ONLY while the learning rate is constant: after a ReduceLROnPlateau
    drop — which the reference recipe fires constantly
    (train.py:1862-1871) — the trace form rescales the accumulated
    momentum by the new lr, while Keras keeps the old-lr-scaled velocity
    and only scales NEW gradient contributions.  The velocity form is
    what the reference trained with (keras/optimizers.py SGD.get_updates).
    """

    def init_fn(params):
        return KerasSGDState(velocity=jax.tree_util.tree_map(jnp.zeros_like, params))

    def update_fn(updates, state, params=None):
        del params
        lr = jnp.asarray(learning_rate, jnp.float32)
        mu = jnp.asarray(momentum, jnp.float32)
        new_v = jax.tree_util.tree_map(
            lambda v, g: mu * v - lr * g, state.velocity, updates
        )
        return new_v, KerasSGDState(velocity=new_v)

    return optax.GradientTransformation(init_fn, update_fn)


class KerasAdamState(NamedTuple):
    count: jax.Array  # t, int32; Keras iterations counter
    m: optax.Updates
    v: optax.Updates


def keras_adam(
    learning_rate,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-7,
) -> optax.GradientTransformation:
    """Keras 2.2.4 Adam, exact formulation (keras/optimizers.py Adam):

        lr_t = lr·sqrt(1−b2^t)/(1−b1^t)
        m ← b1·m + (1−b1)·g ;  v ← b2·v + (1−b2)·g²
        p ← p − lr_t·m/(sqrt(v) + eps)

    Differs from optax.adam, which applies eps to the bias-CORRECTED
    sqrt(v̂): Keras's effective eps is eps/sqrt(1−b2^t) — ~32× larger at
    step 1 with eps=1e-7, a ≫1e-5 relative update difference early in
    training.  eps default is Keras's K.epsilon()=1e-7 (the reference's
    Adam(lr=1e-3) for R3D, train.py:1880-1881)."""

    def init_fn(params):
        zeros = lambda: jax.tree_util.tree_map(jnp.zeros_like, params)
        return KerasAdamState(count=jnp.zeros((), jnp.int32), m=zeros(), v=zeros())

    def update_fn(updates, state, params=None):
        del params
        t = state.count + 1
        tf = t.astype(jnp.float32)
        lr = jnp.asarray(learning_rate, jnp.float32)
        lr_t = lr * jnp.sqrt(1.0 - jnp.float32(b2) ** tf) / (1.0 - jnp.float32(b1) ** tf)
        new_m = jax.tree_util.tree_map(
            lambda m, g: b1 * m + (1.0 - b1) * g, state.m, updates
        )
        new_v = jax.tree_util.tree_map(
            lambda v, g: b2 * v + (1.0 - b2) * jnp.square(g), state.v, updates
        )
        out = jax.tree_util.tree_map(
            lambda m, v: -lr_t * m / (jnp.sqrt(v) + eps), new_m, new_v
        )
        return out, KerasAdamState(count=t, m=new_m, v=new_v)

    return optax.GradientTransformation(init_fn, update_fn)


def make_optimizer(model_type: str, initial_lr: float) -> optax.GradientTransformation:
    """Reference optimizer table (train.py:1874-1885): SGD+momentum 0.9 for
    I3D/TwoStream, plain SGD for C3D, Adam(1e-3, Keras eps 1e-7) for R3D —
    each in the exact Keras 2.2.4 update formulation (keras_sgd/keras_adam
    above; see test_train_step_parity.py for the float64 oracle).
    Wrapped in inject_hyperparams so the epoch-level callbacks can mutate
    the learning rate in place."""
    if model_type in ("I3D", "TWOSTREAM_I3D"):
        tx = optax.inject_hyperparams(
            lambda learning_rate: keras_sgd(learning_rate, momentum=0.9)
        )(learning_rate=initial_lr)
    elif model_type == "C3D":
        tx = optax.inject_hyperparams(keras_sgd)(learning_rate=initial_lr)
    elif model_type.startswith("R3D"):
        tx = optax.inject_hyperparams(
            lambda learning_rate: keras_adam(learning_rate, eps=1e-7)
        )(learning_rate=initial_lr)
    else:
        raise ValueError(f"unknown model_type {model_type}")
    return tx


def set_learning_rate(opt_state, lr: float):
    """Mutate the injected learning-rate hyperparameter."""
    opt_state.hyperparams["learning_rate"] = jnp.asarray(lr, jnp.float32)
    return opt_state


def get_learning_rate(opt_state) -> float:
    return float(opt_state.hyperparams["learning_rate"])
