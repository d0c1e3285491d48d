"""Affine warps (vidaug/augmentors/affine.py equivalents).

One generic inverse-mapped bilinear warp drives rotate / translate / shear /
scale.  The sampling grid is built from (possibly traced) scalar parameters,
so random-parameter variants stay inside jit; output shapes are static.

Convention parity:
- `translate` / `shear` use cv2.warpAffine's forward-matrix convention with
  origin at the top-left (vidaug affine.py:111-170), zero border fill,
  bilinear interpolation.
- `rotate` rotates about the frame center, zero fill (scipy imrotate
  behaviour used at vidaug affine.py:50-53).
- `random_resize` scales frame content by a uniform factor; the reference
  returned a different-sized clip which downstream always resized to the
  model input (train.py:283-289) — here the scale is folded into a fixed
  output geometry (deviation documented; composition is equivalent up to one
  resampling).
"""

from __future__ import annotations

import math
from typing import Tuple

import jax
import jax.numpy as jnp


def sample_bilinear(clip: jax.Array, src_y: jax.Array, src_x: jax.Array, fill: float = 0.0) -> jax.Array:
    """Sample every frame of (T, H, W, C) at real-valued source coordinates
    (H_out, W_out); out-of-bounds → `fill`."""
    t, h, w, c = clip.shape
    clip = clip.astype(jnp.float32)

    y0 = jnp.floor(src_y)
    x0 = jnp.floor(src_x)
    wy = src_y - y0
    wx = src_x - x0

    def gather(yy, xx):
        yc = jnp.clip(yy, 0, h - 1).astype(jnp.int32)
        xc = jnp.clip(xx, 0, w - 1).astype(jnp.int32)
        flat = clip.reshape(t, h * w, c)
        idx = (yc * w + xc).reshape(-1)
        out = jnp.take(flat, idx, axis=1)
        return out.reshape(t, *src_y.shape, c)

    v00 = gather(y0, x0)
    v01 = gather(y0, x0 + 1)
    v10 = gather(y0 + 1, x0)
    v11 = gather(y0 + 1, x0 + 1)
    wy = wy[None, :, :, None]
    wx = wx[None, :, :, None]
    out = (
        v00 * (1 - wy) * (1 - wx)
        + v01 * (1 - wy) * wx
        + v10 * wy * (1 - wx)
        + v11 * wy * wx
    )
    valid = (src_y >= 0) & (src_y <= h - 1) & (src_x >= 0) & (src_x <= w - 1)
    return jnp.where(valid[None, :, :, None], out, fill)


def _dst_grid(out_hw: Tuple[int, int]):
    ys = jnp.arange(out_hw[0], dtype=jnp.float32)
    xs = jnp.arange(out_hw[1], dtype=jnp.float32)
    return jnp.meshgrid(ys, xs, indexing="ij")


def warp_affine_inverse(clip: jax.Array, inv_mat, out_hw=None, fill: float = 0.0) -> jax.Array:
    """Warp with a 2×3 matrix mapping DST (x, y, 1) → SRC (x, y)."""
    if out_hw is None:
        out_hw = (int(clip.shape[1]), int(clip.shape[2]))
    gy, gx = _dst_grid(out_hw)
    m = jnp.asarray(inv_mat, jnp.float32)
    src_x = m[0, 0] * gx + m[0, 1] * gy + m[0, 2]
    src_y = m[1, 0] * gx + m[1, 1] * gy + m[1, 2]
    return sample_bilinear(clip, src_y, src_x, fill)


def _invert_2x3(m):
    """Invert a forward affine [[a,b,tx],[c,d,ty]] (src→dst) to dst→src."""
    a, b, tx = m[0]
    c, d, ty = m[1]
    det = a * d - b * c
    ia, ib = d / det, -b / det
    ic, id_ = -c / det, a / det
    itx = -(ia * tx + ib * ty)
    ity = -(ic * tx + id_ * ty)
    return jnp.stack(
        [jnp.stack([ia, ib, itx]), jnp.stack([ic, id_, ity])]
    )


def rotate(clip: jax.Array, angle_deg, fill: float = 0.0) -> jax.Array:
    """Rotate about the frame center by `angle_deg` (counter-clockwise,
    image convention of scipy imrotate)."""
    h, w = int(clip.shape[1]), int(clip.shape[2])
    theta = jnp.deg2rad(jnp.asarray(angle_deg, jnp.float32))
    cos, sin = jnp.cos(theta), jnp.sin(theta)
    cy, cx = (h - 1) / 2.0, (w - 1) / 2.0
    gy, gx = _dst_grid((h, w))
    dx, dy = gx - cx, gy - cy
    # inverse rotation of the centered dst coordinates
    src_x = cos * dx - sin * dy + cx
    src_y = sin * dx + cos * dy + cy
    return sample_bilinear(clip, src_y, src_x, fill)


def random_rotate(clip: jax.Array, key: jax.Array, degrees: Tuple[float, float]) -> jax.Array:
    """angle ~ U[degrees] (vidaug affine.py:25-59)."""
    angle = jax.random.uniform(key, (), minval=degrees[0], maxval=degrees[1])
    return rotate(clip, angle)


def translate(clip: jax.Array, x_move, y_move, fill: float = 0.0) -> jax.Array:
    """Shift content by (+x, +y) pixels, zero fill (vidaug affine.py:111-139)."""
    gy, gx = _dst_grid((int(clip.shape[1]), int(clip.shape[2])))
    return sample_bilinear(clip, gy - y_move, gx - x_move, fill)


def random_translate(clip: jax.Array, key: jax.Array, x: int, y: int) -> jax.Array:
    kx, ky = jax.random.split(key)
    x_move = jax.random.randint(kx, (), -x, x + 1)
    y_move = jax.random.randint(ky, (), -y, y + 1)
    return translate(clip, x_move.astype(jnp.float32), y_move.astype(jnp.float32))


def shear(clip: jax.Array, x_shear, y_shear, fill: float = 0.0) -> jax.Array:
    """Forward matrix [[1, sx, 0], [sy, 1, 0]], origin top-left
    (vidaug affine.py:142-170)."""
    sx = jnp.asarray(x_shear, jnp.float32)
    sy = jnp.asarray(y_shear, jnp.float32)
    one = jnp.ones_like(sx)
    zero = jnp.zeros_like(sx)
    fwd = [[one, sx, zero], [sy, one, zero]]
    inv = _invert_2x3(fwd)
    return warp_affine_inverse(clip, inv, fill=fill)


def random_shear(clip: jax.Array, key: jax.Array, x: float, y: float) -> jax.Array:
    kx, ky = jax.random.split(key)
    sx = jax.random.uniform(kx, (), minval=-x, maxval=x)
    sy = jax.random.uniform(ky, (), minval=-y, maxval=y)
    return shear(clip, sx, sy)


def scale(clip: jax.Array, factor, fill: float = 0.0) -> jax.Array:
    """Zoom about the top-left origin by `factor` (content scaled, canvas
    fixed)."""
    gy, gx = _dst_grid((int(clip.shape[1]), int(clip.shape[2])))
    f = jnp.asarray(factor, jnp.float32)
    return sample_bilinear(clip, gy / f, gx / f, fill)


def random_resize(clip: jax.Array, key: jax.Array, rate: float) -> jax.Array:
    """factor ~ U[1−rate, 1+rate] (vidaug affine.py:62-108; see module
    docstring for the fixed-canvas deviation)."""
    factor = jax.random.uniform(key, (), minval=1.0 - rate, maxval=1.0 + rate)
    return scale(clip, factor)
