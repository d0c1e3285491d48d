"""Deterministic PRNG threading for the data/augmentation pipeline.

The reference used Python's global `random` module inside vidaug
(vidaug/augmentors/group.py) and numpy's global RNG for salt/pepper — runs
were unreproducible.  Here every random decision derives from a single
`jax.random.key` folded with structural integers (epoch, clip index, op id),
so the pipeline is bitwise deterministic and safely parallel.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def experiment_key(seed: int) -> jax.Array:
    return jax.random.key(seed)


def fold_in(key: jax.Array, *ids: int) -> jax.Array:
    for i in ids:
        key = jax.random.fold_in(key, i)
    return key


def clip_key(key: jax.Array, epoch: int, clip_index: int) -> jax.Array:
    """Per-clip key: unique per (epoch, clip)."""
    return fold_in(key, epoch, clip_index)


def batch_keys(key: jax.Array, batch_size: int) -> jax.Array:
    """Split one key into a [B]-vector of per-sample keys (vmappable)."""
    return jax.random.split(key, batch_size)


def uniform_scalar(key: jax.Array) -> jax.Array:
    return jax.random.uniform(key, ())


def bernoulli_gate(key: jax.Array, p: float) -> jax.Array:
    """Bernoulli(p) gate as used by vidaug `Sometimes`
    (reference vidaug/augmentors/group.py:108-133)."""
    return jax.random.bernoulli(key, p)
