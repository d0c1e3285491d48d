"""Device-side bilinear resize and fused crop-and-resize.

Replaces the reference's per-frame `cv2.resize` host loops
(train.py:283-289, 202-239; augment_dataset.py:79-83).  `resize_bilinear`
matches cv2.resize's INTER_LINEAR convention (half-pixel centers,
edge-clamped), which is also what `jax.image.resize(method='linear')`
implements.

`crop_resize` fuses the dominant augmentation policy — Sometimes(RandomCrop)
+ Sometimes(HorizontalFlip) followed by resize (augment_dataset.py:16-32,
train.py:174-192) — into ONE gather+lerp over the source clip: the crop
window and the flip are folded into the sampling grid, so the pixels are
touched once regardless of how many geometric ops are stacked.  The window
offsets may be traced values (dynamic), while output shape stays static —
exactly what XLA needs.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def resize_bilinear(clip: jax.Array, out_hw: Tuple[int, int]) -> jax.Array:
    """Resize (T, H, W, C) → (T, out_h, out_w, C), bilinear, half-pixel
    centers, NO antialiasing — cv2.resize INTER_LINEAR semantics exactly.
    (jax.image.resize is deliberately not used: it antialiases on
    downscale, which cv2 does not.)"""
    return crop_resize(clip, out_hw)


def _axis_coords(out_size: int, win_size, win_start, flip: jax.Array | bool = False):
    """Half-pixel-center source coordinates for sampling `out_size` pixels
    from a window [win_start, win_start + win_size)."""
    scale = win_size / out_size
    coords = (jnp.arange(out_size, dtype=jnp.float32) + 0.5) * scale - 0.5
    coords = jnp.where(flip, (win_size - 1.0) - coords, coords)
    # Clamp to the window interior so samples never blend with pixels
    # outside the crop (matches crop-then-resize edge behaviour).
    coords = jnp.clip(coords, 0.0, win_size - 1.0)
    return coords + win_start


def _gather_lerp_1d(x: jax.Array, coords: jax.Array, axis: int) -> jax.Array:
    """Bilinear interpolation along one axis via two gathers and a lerp."""
    n = x.shape[axis]
    c0 = jnp.clip(jnp.floor(coords), 0, n - 1)
    c1 = jnp.clip(c0 + 1, 0, n - 1)
    w = jnp.clip(coords - c0, 0.0, 1.0)
    x0 = jnp.take(x, c0.astype(jnp.int32), axis=axis)
    x1 = jnp.take(x, c1.astype(jnp.int32), axis=axis)
    shape = [1] * x.ndim
    shape[axis] = -1
    w = w.reshape(shape)
    return x0 * (1.0 - w) + x1 * w


def crop_resize(
    clip: jax.Array,
    out_hw: Tuple[int, int],
    win_start_yx=(0, 0),
    win_size_hw=None,
    flip_x: jax.Array | bool = False,
) -> jax.Array:
    """Sample an (out_h, out_w) image from the window
    `[y0, y0+wh) × [x0, x0+ww)` of every frame, optionally mirrored in x.

    win_start may be traced (dynamic crop offsets); win_size and out size
    must be static Python ints (for XLA).  Separable bilinear: H pass then
    W pass — two gathers per axis, fully fused by XLA.
    """
    t, h, w, c = clip.shape
    if win_size_hw is None:
        win_size_hw = (h, w)
    y0, x0 = win_start_yx
    wh, ww = win_size_hw

    clip = clip.astype(jnp.float32)
    ys = _axis_coords(out_hw[0], wh, y0, False)
    xs = _axis_coords(out_hw[1], ww, x0, flip_x)
    out = _gather_lerp_1d(clip, ys, axis=1)
    out = _gather_lerp_1d(out, xs, axis=2)
    return out
