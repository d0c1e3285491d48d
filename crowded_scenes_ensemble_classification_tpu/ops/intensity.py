"""Pixel-intensity transforms (vidaug/augmentors/intensity.py equivalents).

All take/return float32 clips (T, H, W, C) with values in [0, 255]; the
reference worked on uint8 frames — we keep integer-valued floats so the
whole augmentation chain stays on device without dtype churn.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def invert_color(clip: jax.Array) -> jax.Array:
    """255 − x (vidaug intensity.py:26-40)."""
    return 255.0 - clip


def add(clip: jax.Array, value: float) -> jax.Array:
    """x + value, clamped to [0, 255] (vidaug intensity.py:43-75)."""
    return jnp.clip(clip + value, 0.0, 255.0)


def multiply(clip: jax.Array, value: float) -> jax.Array:
    """x * value, clamped to [0, 255] (vidaug intensity.py:78-110)."""
    return jnp.clip(clip * value, 0.0, 255.0)


def pepper(clip: jax.Array, key: jax.Array, ratio: int = 100) -> jax.Array:
    """Each element goes to 0 with probability 1/ratio — the reference drew
    `randint(ratio)` per element and zeroed where it hit 0
    (vidaug intensity.py:113-141)."""
    noise = jax.random.randint(key, clip.shape, 0, ratio)
    return jnp.where(noise == 0, 0.0, clip)


def salt(clip: jax.Array, key: jax.Array, ratio: int = 100) -> jax.Array:
    """Each element goes to 255 with probability 1/ratio
    (vidaug intensity.py:143-171)."""
    noise = jax.random.randint(key, clip.shape, 0, ratio)
    return jnp.where(noise == 0, 255.0, clip)
