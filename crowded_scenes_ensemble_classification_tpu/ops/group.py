"""Transform-composition algebra (vidaug/augmentors/group.py equivalents).

A transform is a pure function ``(clip, key) -> clip``.  Combinators compose
transforms functionally; all randomness flows through explicit keys (the
reference used the global `random` module).  Under jit, combinators whose
branches must be traced (`sometimes`, `one_of`, `some_of`, random-order
`sequential`) require every member transform to be shape-preserving —
shape-changing policies (crop→resize) should use the fused
`ops.augment.crowd11_augment` instead.
"""

from __future__ import annotations

import itertools
import math
from typing import Callable, Sequence

import jax
import jax.numpy as jnp
from jax import lax

Transform = Callable[[jax.Array, jax.Array], jax.Array]


def _apply(transform: Transform, clip: jax.Array, key: jax.Array) -> jax.Array:
    return transform(clip, key)


def sequential(transforms: Sequence[Transform], random_order: bool = False) -> Transform:
    """Apply every transform in order; optionally in a random order
    (vidaug group.py:25-49).  Random order uses lax.switch over all
    permutations — fine for the ≤4-op policies used here."""

    transforms = list(transforms)

    def fixed(clip, key):
        keys = jax.random.split(key, len(transforms))
        for t, k in zip(transforms, keys):
            clip = t(clip, k)
        return clip

    if not random_order:
        return fixed

    perms = list(itertools.permutations(range(len(transforms))))

    def randomized(clip, key):
        k_pick, k_ops = jax.random.split(key)
        keys = jax.random.split(k_ops, len(transforms))

        def make_branch(perm):
            def branch(c):
                for i in perm:
                    c = transforms[i](c, keys[i])
                return c

            return branch

        idx = jax.random.randint(k_pick, (), 0, len(perms))
        return lax.switch(idx, [make_branch(p) for p in perms], clip)

    return randomized


def one_of(transforms: Sequence[Transform]) -> Transform:
    """Apply exactly one randomly chosen transform (vidaug group.py:52-66)."""
    transforms = list(transforms)

    def apply(clip, key):
        k_pick, k_op = jax.random.split(key)
        idx = jax.random.randint(k_pick, (), 0, len(transforms))
        return lax.switch(idx, [lambda c, t=t: t(c, k_op) for t in transforms], clip)

    return apply


def some_of(transforms: Sequence[Transform], n: int, random_order: bool = True) -> Transform:
    """Apply a random n-subset (vidaug group.py:69-105).  Each transform is
    independently gated so that exactly-n selection is approximated by a
    random permutation prefix: we shuffle, then apply the first n."""
    transforms = list(transforms)
    m = len(transforms)
    if n > m:
        raise ValueError(f"cannot pick {n} of {m} transforms")
    subsets = list(itertools.combinations(range(m), n))

    def apply(clip, key):
        k_pick, k_ops = jax.random.split(key)
        keys = jax.random.split(k_ops, m)

        def make_branch(subset):
            def branch(c):
                order = subset if random_order else sorted(subset)
                for i in order:
                    c = transforms[i](c, keys[i])
                return c

            return branch

        idx = jax.random.randint(k_pick, (), 0, len(subsets))
        return lax.switch(idx, [make_branch(s) for s in subsets], clip)

    return apply


def sometimes(p: float, transform: Transform) -> Transform:
    """Apply with probability p (vidaug group.py:108-133)."""

    def apply(clip, key):
        k_gate, k_op = jax.random.split(key)
        gate = jax.random.bernoulli(k_gate, p)
        return lax.cond(gate, lambda c: transform(c, k_op), lambda c: c, clip)

    return apply
