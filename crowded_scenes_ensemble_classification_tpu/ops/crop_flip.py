"""Spatial crop and flip transforms (vidaug crop.py / flip.py equivalents).

Crops have static output sizes (required under jit); the crop *offset* may
be traced (random crops), implemented with `lax.dynamic_slice`.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax


def horizontal_flip(clip: jax.Array) -> jax.Array:
    """Mirror width axis (vidaug flip.py:20-32)."""
    return jnp.flip(clip, axis=2)


def vertical_flip(clip: jax.Array) -> jax.Array:
    """Mirror height axis (vidaug flip.py:36-48)."""
    return jnp.flip(clip, axis=1)


def _slice_hw(clip: jax.Array, y0, x0, size_hw: Tuple[int, int]) -> jax.Array:
    t, _, _, c = clip.shape
    return lax.dynamic_slice(
        clip,
        (0, jnp.asarray(y0, jnp.int32), jnp.asarray(x0, jnp.int32), 0),
        (t, size_hw[0], size_hw[1], c),
    )


def center_crop(clip: jax.Array, size_hw: Tuple[int, int]) -> jax.Array:
    """Round-half-even centered window — matches Python's
    `int(round((dim - crop)/2))` in vidaug crop.py:36-37."""
    _, h, w, _ = clip.shape
    ch, cw = size_hw
    if ch > h or cw > w:
        raise ValueError(f"crop {size_hw} larger than frame {(h, w)}")
    y0 = int(round((h - ch) / 2.0))
    x0 = int(round((w - cw) / 2.0))
    return _slice_hw(clip, y0, x0, size_hw)


CORNER_POSITIONS = ("c", "tl", "tr", "bl", "br")


def corner_crop(
    clip: jax.Array,
    size_hw: Tuple[int, int],
    position: str | None = None,
    key: jax.Array | None = None,
) -> jax.Array:
    """Fixed-corner or random-corner crop (vidaug crop.py:67-142).
    position=None requires a key and samples one of the five positions."""
    _, h, w, _ = clip.shape
    ch, cw = size_hw
    offsets = {
        "c": (int(round((h - ch) / 2.0)), int(round((w - cw) / 2.0))),
        "tl": (0, 0),
        "tr": (0, w - cw),
        "bl": (h - ch, 0),
        "br": (h - ch, w - cw),
    }
    if position is not None:
        y0, x0 = offsets[position]
        return _slice_hw(clip, y0, x0, size_hw)
    if key is None:
        raise ValueError("random corner crop needs a PRNG key")
    table = jnp.asarray([offsets[p] for p in CORNER_POSITIONS], jnp.int32)
    pick = jax.random.randint(key, (), 0, len(CORNER_POSITIONS))
    y0, x0 = table[pick, 0], table[pick, 1]
    return _slice_hw(clip, y0, x0, size_hw)


def random_crop(clip: jax.Array, size_hw: Tuple[int, int], key: jax.Array) -> jax.Array:
    """Uniform window position: x0 ∈ [0, W−cw], y0 ∈ [0, H−ch], inclusive
    (vidaug crop.py:145-191)."""
    _, h, w, _ = clip.shape
    ch, cw = size_hw
    if ch > h or cw > w:
        raise ValueError(f"crop {size_hw} larger than frame {(h, w)}")
    ky, kx = jax.random.split(key)
    y0 = jax.random.randint(ky, (), 0, h - ch + 1)
    x0 = jax.random.randint(kx, (), 0, w - cw + 1)
    return _slice_hw(clip, y0, x0, size_hw)
