"""Shared image-pyramid / warping primitives for the dense-flow kernels.

Functions operate on single-channel float32 images (H, W) and are jit/vmap
friendly (static shapes per pyramid level).  The two production warps
(`warp_image_mxu`, `warp_image_separable`) additionally accept
CHANNELS-LEADING (C, H, W) stacks that share one weight field — channels
lead so W stays on the TPU lane axis.
"""

from __future__ import annotations

from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


def _sep_conv2d(img: jax.Array, ky: np.ndarray, kx: np.ndarray, mode: str = "edge") -> jax.Array:
    """TRULY separable 2-D correlation (two 1-D passes — k+k taps instead
    of k·k) with edge-replicated borders.  The Farnebäck inner loop runs
    dozens of these per frame pair; separability is a ~5× FLOP cut for the
    winsize-11 box smoothing."""
    ry, rx = (len(ky) - 1) // 2, (len(kx) - 1) // 2
    x = jnp.pad(img, ((ry, ry), (rx, rx)), mode=mode)
    x = x[None, None]  # NCHW
    kyj = jnp.asarray(ky, jnp.float32).reshape(1, 1, -1, 1)
    kxj = jnp.asarray(kx, jnp.float32).reshape(1, 1, 1, -1)
    out = lax.conv_general_dilated(
        x, kyj, (1, 1), "VALID", dimension_numbers=("NCHW", "OIHW", "NCHW")
    )
    out = lax.conv_general_dilated(
        out, kxj, (1, 1), "VALID", dimension_numbers=("NCHW", "OIHW", "NCHW")
    )
    return out[0, 0]


def _sep_conv2d_multi(x_hwc: jax.Array, ky_stack: np.ndarray, kx_stack: np.ndarray,
                      mode: str = "edge") -> jax.Array:
    """Depthwise separable 2-D correlation over a multi-channel (H, W, C)
    image: channel c is correlated with (ky_stack[c], kx_stack[c]).  Packs
    what would be C independent single-channel convs into ONE depthwise
    conv pair — the difference between 1-channel convs (VPU-starved) and
    C-channel ones on TPU."""
    h, w, c = x_hwc.shape
    ry = (ky_stack.shape[1] - 1) // 2
    rx = (kx_stack.shape[1] - 1) // 2
    x = jnp.pad(x_hwc, ((ry, ry), (rx, rx), (0, 0)), mode=mode)
    x = x.transpose(2, 0, 1)[None]  # NCHW, N=1
    ky = jnp.asarray(ky_stack, x.dtype).reshape(c, 1, -1, 1)
    kx = jnp.asarray(kx_stack, x.dtype).reshape(c, 1, 1, -1)
    out = lax.conv_general_dilated(
        x, ky, (1, 1), "VALID", feature_group_count=c,
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )
    out = lax.conv_general_dilated(
        out, kx, (1, 1), "VALID", feature_group_count=c,
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )
    return out[0].transpose(1, 2, 0)


def gaussian_kernel(sigma: float, radius: int | None = None) -> np.ndarray:
    if radius is None:
        radius = int(4.0 * sigma + 0.5)
    x = np.arange(-radius, radius + 1, dtype=np.float64)
    k = np.exp(-0.5 * (x / sigma) ** 2)
    return (k / k.sum()).astype(np.float32)


def box_kernel(size: int) -> np.ndarray:
    return (np.ones(size) / size).astype(np.float32)


def blur(img: jax.Array, kernel: np.ndarray) -> jax.Array:
    return _sep_conv2d(img, kernel, kernel)


def pyr_down(img: jax.Array) -> jax.Array:
    """Gaussian blur + 2× decimation (cv2.pyrDown-style 5-tap kernel)."""
    k = np.asarray([1, 4, 6, 4, 1], np.float32) / 16.0
    sm = _sep_conv2d(img, k, k)
    return sm[::2, ::2]


def build_pyramid(img: jax.Array, levels: int, min_size: int = 16) -> List[jax.Array]:
    """[level0 = full res, level1 = /2, ...], stopping early when small."""
    pyr = [img]
    for _ in range(1, levels):
        h, w = pyr[-1].shape
        if min(h, w) // 2 < min_size:
            break
        pyr.append(pyr_down(pyr[-1]))
    return pyr


def resize_bilinear_2d(img: jax.Array, out_hw: Tuple[int, int]) -> jax.Array:
    return jax.image.resize(img, out_hw, method="linear")


def upsample_flow(flow: jax.Array, out_hw: Tuple[int, int]) -> jax.Array:
    """(H, W, 2) → (out_h, out_w, 2) with displacement values rescaled."""
    h, w, _ = flow.shape
    scale_y = out_hw[0] / h
    scale_x = out_hw[1] / w
    up = jax.image.resize(flow, (out_hw[0], out_hw[1], 2), method="linear")
    return up * jnp.asarray([scale_x, scale_y], jnp.float32)


def warp_image(img: jax.Array, flow: jax.Array) -> jax.Array:
    """Sample img at (x + u, y + v); edge-clamped bilinear.
    flow[..., 0] = u (x-displacement), flow[..., 1] = v (y)."""
    h, w = img.shape
    gy, gx = jnp.meshgrid(
        jnp.arange(h, dtype=jnp.float32), jnp.arange(w, dtype=jnp.float32), indexing="ij"
    )
    sx = gx + flow[..., 0]
    sy = gy + flow[..., 1]
    sx = jnp.clip(sx, 0.0, w - 1.0)
    sy = jnp.clip(sy, 0.0, h - 1.0)

    x0 = jnp.floor(sx)
    y0 = jnp.floor(sy)
    wx = sx - x0
    wy = sy - y0

    def gather(yy, xx):
        yc = jnp.clip(yy, 0, h - 1).astype(jnp.int32)
        xc = jnp.clip(xx, 0, w - 1).astype(jnp.int32)
        return img[yc, xc]

    v00 = gather(y0, x0)
    v01 = gather(y0, x0 + 1)
    v10 = gather(y0 + 1, x0)
    v11 = gather(y0 + 1, x0 + 1)
    # factored form (x-lerp then y-lerp) — matches warp_image_mxu's
    # accumulation order bit-for-bit
    top = v00 * (1 - wx) + v01 * wx
    bottom = v10 * (1 - wx) + v11 * wx
    return top * (1 - wy) + bottom * wy


def warp_image_mxu(
    img: jax.Array, flow: jax.Array, max_disp: int = 16, block_rows: int = 28
) -> jax.Array:
    """EXACT bilinear warp with NO gathers — TPU random gathers cost
    ~50 ms/Mpix, so instead:

    - the x-resample of each row becomes a one-hot-weighted matmul on the
      MXU:  XG[d, i, j] = Σ_k hat(sx[i,j] − k) · img[row(i,d), k], where
      hat(t) = max(0, 1 − |t|) has exactly the two bilinear taps nonzero,
    - the y-resample is a bounded shift-accumulate over the 2·max_disp+1
      candidate rows (displacements are clamped to ±max_disp, like
      warp_image_separable).

    Algebraically identical to `warp_image` (same clamped sample positions,
    same select-based bilinear tap weights, same factored accumulation
    top·(1−wy) + bottom·wy); the only float deviation is FMA rounding
    inside the matmul — measured ≤ 2e-4 absolute on 0-255 images (≈1e-6
    relative, last-ulp).  Rows are processed in `block_rows` chunks to
    bound the one-hot tensor at (block, W, W).

    img may be (H, W) or CHANNELS-LEADING (C, H, W): all channels are
    resampled with ONE shared one-hot matrix / weight field (TV-L1 warps
    the image and both gradients at identical positions — 3 warps for the
    price of ~1).  Channels lead so W stays on the lane axis.
    """
    squeeze = img.ndim == 2
    if squeeze:
        img = img[None]
    _, h, w = img.shape
    r = max_disp
    # largest divisor of h not exceeding block_rows (h is static)
    block_rows = min(block_rows, h)
    while h % block_rows:
        block_rows -= 1
    gy = jnp.arange(h, dtype=jnp.float32)[:, None]
    gx = jnp.arange(w, dtype=jnp.float32)[None, :]
    sx = jnp.clip(gx + jnp.clip(flow[..., 0], -r, r), 0.0, w - 1.0)
    sy = jnp.clip(gy + jnp.clip(flow[..., 1], -r, r), 0.0, h - 1.0)

    d_range = jnp.arange(2 * r + 1, dtype=jnp.float32)  # band offsets
    k_range = jnp.arange(w, dtype=jnp.float32)
    row_ids = jnp.arange(h)
    # edge-replicated row padding == index clamping at the borders, and it
    # turns every band access into a contiguous dynamic slice (no gather)
    img_p = jnp.pad(img, ((0, 0), (r, r), (0, 0)), mode="edge")

    def chunk(i0):
        rows = jax.lax.dynamic_slice_in_dim(row_ids, i0, block_rows)
        sx_c = jax.lax.dynamic_slice_in_dim(sx, i0, block_rows)  # (B, W)
        sy_c = jax.lax.dynamic_slice_in_dim(sy, i0, block_rows)
        # one-hot bilinear taps along x: (B, W, W), two nonzeros per row.
        # Select-based (not hat = 1−|·|) so the high tap is wx itself, not
        # the double-rounded 1−(1−wx) — keeps bit-parity with warp_image.
        x_lo = jnp.floor(sx_c)
        wx = (sx_c - x_lo)[..., None]
        oh = jnp.where(
            k_range == x_lo[..., None],
            1.0 - wx,
            jnp.where(k_range == x_lo[..., None] + 1.0, wx, 0.0),
        )
        # candidate source rows for the whole chunk: i0−r … i0+block+r−1
        band = jax.lax.dynamic_slice_in_dim(
            img_p, i0, block_rows + 2 * r, axis=1
        )  # (C, B + 2r, W)
        # x-resample every candidate row on the MXU:
        # xg[b, c, i, j] = Σ_k oh[i, j, k] · band[c, i + b, k]
        bands = jnp.stack(
            [
                jax.lax.dynamic_slice_in_dim(band, b, block_rows, axis=1)
                for b in range(2 * r + 1)
            ]
        )  # (D, C, B, W)
        xg = jnp.einsum(
            "ijk,dcik->dcij", oh, bands,
            precision=jax.lax.Precision.HIGHEST,
        )
        # y-combine: select-based bilinear weights over the 2r+1 bands
        vv = sy_c - rows[:, None].astype(jnp.float32) + r  # ∈ [0, 2r]
        d_lo = jnp.floor(vv)
        wyf = vv - d_lo
        dcol = d_range[:, None, None]
        wy = jnp.where(
            dcol == d_lo[None],
            1.0 - wyf[None],
            jnp.where(dcol == d_lo[None] + 1.0, wyf[None], 0.0),
        )
        return jnp.einsum("dij,dcij->cij", wy, xg)

    out = jax.lax.map(chunk, jnp.arange(0, h, block_rows))
    # (n_chunks, C, block, W) → (C, H, W)
    out = out.transpose(1, 0, 2, 3).reshape(-1, h, w)
    return out[0] if squeeze else out


def image_gradients(img: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Central-difference (∂x, ∂y) with edge replication."""
    xp = jnp.pad(img, ((0, 0), (1, 1)), mode="edge")
    gx = (xp[:, 2:] - xp[:, :-2]) * 0.5
    yp = jnp.pad(img, ((1, 1), (0, 0)), mode="edge")
    gy = (yp[2:, :] - yp[:-2, :]) * 0.5
    return gx, gy


def warp_image_separable(
    img: jax.Array, flow: jax.Array, max_disp: int = 16
) -> jax.Array:
    """Gather-free warp: TPU random gathers cost ~50ms per megapixel (the
    exact `warp_image` spends 97% of Farnebäck's time in them), so this
    variant decomposes the bilinear resample into shift-and-accumulate
    passes — Σ_d hat(disp − d) ⊙ shift(img, d) per axis — pure VPU
    multiply-adds over |2·max_disp+1| statically-shifted copies.

    Approximation: axis passes apply the TARGET pixel's displacement to
    both taps (exact for locally smooth flow — uniform motion is exact;
    error is O(∂flow/∂axis) at motion discontinuities).  Displacements are
    clamped to ±max_disp.  Used by farneback_flow_pair(fast_warp=True).

    img may be (H, W) or CHANNELS-LEADING (C, H, W) — channels share the
    weight fields.  (Channels-last would put C on the 128-lane axis —
    measured catastrophic for C=3.)
    """
    squeeze = img.ndim == 2
    if squeeze:
        img = img[None]
    c, h, w = img.shape
    r = max_disp
    u = jnp.clip(flow[..., 0], -r, r)[None]
    v = jnp.clip(flow[..., 1], -r, r)[None]

    # y pass: out_y[i, j] = Σ_dy hat(v[i,j] − dy) · img[i+dy, j]
    padded = jnp.pad(img, ((0, 0), (r, r), (0, 0)), mode="edge")
    acc = jnp.zeros_like(img)
    for dy in range(-r, r + 1):
        wgt = jnp.maximum(0.0, 1.0 - jnp.abs(v - dy))
        acc = acc + wgt * lax.dynamic_slice(padded, (0, r + dy, 0), (c, h, w))
    # x pass on the y-warped image
    padded = jnp.pad(acc, ((0, 0), (0, 0), (r, r)), mode="edge")
    out = jnp.zeros_like(img)
    for dx in range(-r, r + 1):
        wgt = jnp.maximum(0.0, 1.0 - jnp.abs(u - dx))
        out = out + wgt * lax.dynamic_slice(padded, (0, 0, r + dx), (c, h, w))
    return out[0] if squeeze else out
