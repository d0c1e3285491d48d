"""Train state: params + batch_stats + optimizer state + step + PRNG.

The reference checkpointed only best-val-loss model weights
(train.py:1850-1853); optimizer state, epoch counter and RNG were lost on
resume.  Here the full state is a pytree checkpointed via orbax
(checkpoints.py), making resume exact (SURVEY.md §5 checkpoint plan).
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional

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


def make_optimizer(model_type: str, initial_lr: float) -> optax.GradientTransformation:
    """Reference optimizer table (train.py:1874-1885): SGD+momentum 0.9 for
    I3D/TwoStream, plain SGD for C3D, Adam(1e-3, Keras eps 1e-7) for R3D.
    Wrapped in inject_hyperparams so the epoch-level callbacks can mutate
    the learning rate in place."""
    if model_type in ("I3D", "TWOSTREAM_I3D"):
        tx = optax.inject_hyperparams(
            lambda learning_rate: optax.sgd(learning_rate, momentum=0.9)
        )(learning_rate=initial_lr)
    elif model_type == "C3D":
        tx = optax.inject_hyperparams(optax.sgd)(learning_rate=initial_lr)
    elif model_type.startswith("R3D"):
        tx = optax.inject_hyperparams(
            lambda learning_rate: optax.adam(learning_rate, eps=1e-7)
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
