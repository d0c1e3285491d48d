"""Dense Farnebäck optical flow, on device.

Replaces the reference's per-frame-pair host call to
cv2.calcOpticalFlowFarneback (train.py:294-332), using the same parameters:
pyr_scale=0.5, levels=5, winsize=11, iterations=5, poly_n=5, poly_sigma=1.1.
The algorithm (Farnebäck 2003, "Two-frame motion estimation based on
polynomial expansion"):

1. per level, fit a quadratic  f(x) ≈ xᵀAx + bᵀx + c  around every pixel
   via Gaussian-weighted least squares — 6 separable correlations with
   {g, x·g, x²·g} kernels and one constant 6×6 normal-matrix solve,
2. displacement from the expansion coefficients of the two frames
   (the second warped by the current flow):  A=(A₁+A₂)/2,
   Δb = −½(b₂−b₁) + A·d₀, then per-pixel 2×2 solve of
   (Σ_w AᵀA) d = Σ_w AᵀΔb with a winsize box average (cv2's default
   non-Gaussian mode),
3. coarse-to-fine: upsample & rescale flow between pyramid levels,
   `iterations` refinement passes per level.

Everything is separable convs + elementwise math + one tiny linear solve —
the whole (T−1)-pair extraction jits into a single XLA program (vmapped over
pairs), so the flow stream never touches the host (BASELINE.json
north-star).

Accuracy is validated against synthetic translations and cv2 on CPU
(tests/test_flow.py) rather than bit-matched — cv2's implementation differs
in border handling and uses separable fixed-point tricks.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .pyramid import (
    box_kernel,
    build_pyramid,
    gaussian_kernel,
    upsample_flow,
    warp_image_mxu,
    warp_image_separable,
    _sep_conv2d,
    _sep_conv2d_multi,
)

# reference call-site parameters (train.py:322-324)
REFERENCE_PARAMS = dict(
    pyr_scale=0.5, levels=5, winsize=11, iterations=5, poly_n=5, poly_sigma=1.1
)

# Throughput preset: coarse-to-fine means the finest levels start from an
# already-good estimate, so they need fewer refinement passes and only a
# small residual displacement bound (the separable warp's cost is linear
# in max_disp).  EPE-gated on the synthetic motion suite
# (tests/test_flow_motions.py) — same ceilings as the reference schedule,
# measured within 0.01 px of it on every motion (small AND 8-14 px
# large-motion cases, test_farneback_turbo_large_motion_224).  v5e,
# 80-pair flat-batch 224² chunks with the elementwise solver core:
# 4205 fields/s in-pipeline (bench.py reports the full-schedule and
# turbo rates it measures each run).
TURBO_PARAMS = dict(
    fast_warp=True, fine_iterations=1, fine_max_disp=4, fine_levels=3
)
# NOTE: with fine_iterations=1 only the i=0 (exact, full-range) warp of
# the residual loop runs, so fine_max_disp is inert in this preset — it
# takes effect when callers raise fine_iterations ≥ 2.

# Memory-bounding chunk for farneback_flow_batch in the clip pipelines:
# 80 pairs ≈ 4 GB of pyramid intermediates at 224² and the measured
# throughput sweet spot (842 fields/s in-pipeline on v5e).
FLOW_CHUNK_PAIRS = 80

# The reference computes Farnebäck on frames scaled to max-dim 224 BEFORE
# flow (opticalflow_FarneBack_extractor, train.py:302-318: scale =
# 224/max(shape), applied to every frame; the flow fields are resized to
# the model geometry afterwards with VALUES unchanged, train.py:236-238).
FLOW_RESIZE_DIM = 224


def reference_flow_hw(staging_hw) -> tuple:
    """The resolution the reference computes Farnebäck at, for frames
    staged at `staging_hw`: max-dim scaled to FLOW_RESIZE_DIM
    (train.py:304-307).  Downscale-only: staged frames smaller than 224
    are used as-is — the clip pipelines stage at (model + crop margin)
    ≥ the model size, so production staging is always ≥ 224 and the
    upscale branch of the reference's `scale = 224/max_dim` never runs
    at a different resolution than this returns; tiny test geometries
    keep their native size instead of paying a 224² solve."""
    h, w = int(staging_hw[0]), int(staging_hw[1])
    m = max(h, w)
    if m <= FLOW_RESIZE_DIM:
        return (h, w)
    scale = FLOW_RESIZE_DIM / m
    return (int(round(h * scale)), int(round(w * scale)))


def flow_schedule_params(schedule: str):
    """ExperimentConfig.flow_schedule → the flow_params dict every
    train/eval/member-forward builder accepts.  'full' → None (the
    reference's 5-iteration schedule, cv2 parity); 'turbo' →
    TURBO_PARAMS (EPE-gated adaptive schedule, ~2-3× throughput)."""
    if schedule == "turbo":
        return dict(TURBO_PARAMS)
    if schedule == "full":
        return None
    raise ValueError(f"unknown flow schedule {schedule!r}")


def _poly_exp_setup(poly_n: int, poly_sigma: float):
    """Precompute the 1-D moment kernels and the constant LS solve matrix.

    Basis order: [1, x, y, x², y², xy]; returns (kernels, Ginv) with
    kernels = (g, xg, x²g) and Ginv the 6×6 inverse normal matrix under the
    separable Gaussian weight."""
    r = (poly_n - 1) // 2
    xs = np.arange(-r, r + 1, dtype=np.float64)
    g = np.exp(-0.5 * (xs / poly_sigma) ** 2)
    g /= g.sum()
    xg = xs * g
    x2g = xs * xs * g

    # normal matrix G_ij = Σ_w basis_i · basis_j over the 2-D window
    W = np.outer(g, g)  # weights w(y, x)
    Y, X = np.meshgrid(xs, xs, indexing="ij")
    basis = np.stack([np.ones_like(X), X, Y, X * X, Y * Y, X * Y])  # (6, n, n)
    G = np.einsum("inm,jnm,nm->ij", basis, basis, W)
    Ginv = np.linalg.inv(G)
    return (
        g.astype(np.float32),
        xg.astype(np.float32),
        x2g.astype(np.float32),
    ), Ginv.astype(np.float32)


def _poly_exp_planes(img: jax.Array, kernels, Ginv: np.ndarray):
    """Local quadratic fit as five (H, W) PLANES: (axx, ayy, axy, bx, by)
    with A = [[axx, axy], [axy, ayy]] symmetric.

    The 6 weighted moments r_k = Σ w·basis_k·I are packed into ONE
    depthwise separable conv pair (channels = [r1, rx, rxx, ry, rxy, ryy]
    with per-channel (ky, kx) kernels) instead of 6 single-channel convs —
    1-channel convs starve the TPU VPU.  Planes (not packed (H, W, 2, 2)
    tensors) because per-pixel 2×2 einsums compile to huge batches of tiny
    matmuls — swapping them for elementwise plane arithmetic measured the
    fused polyexp+update 7.5× faster on v5e (65.3 → 8.7 ms for 80 224²
    pairs)."""
    g, xg, x2g = kernels
    ky = np.stack([g, g, g, xg, xg, x2g])
    kx = np.stack([g, xg, x2g, g, xg, g])
    x6 = jnp.broadcast_to(img[..., None], img.shape + (6,))
    m = _sep_conv2d_multi(x6, ky, kx)  # (H, W, 6): [r1, rx, rxx, ry, rxy, ryy]
    r1, rx, rxx, ry, rxy, ryy = (m[..., i] for i in range(6))
    r = jnp.stack([r1, rx, ry, rxx, ryy, rxy], axis=-1)  # (H, W, 6)
    coef = r @ jnp.asarray(Ginv).T  # (H, W, 6): [c, bx, by, axx, ayy, axy]
    return (
        coef[..., 3],  # axx
        coef[..., 4],  # ayy
        coef[..., 5] * 0.5,  # axy
        coef[..., 1],  # bx
        coef[..., 2],  # by
    )


def polynomial_expansion(
    img: jax.Array, kernels, Ginv: np.ndarray
) -> Tuple[jax.Array, jax.Array]:
    """→ (A (H,W,2,2), b (H,W,2)) of the local quadratic fit — packed-API
    wrapper over `_poly_exp_planes` (the solver consumes the planes
    directly)."""
    axx, ayy, axy, bx, by = _poly_exp_planes(img, kernels, Ginv)
    A = jnp.stack(
        [
            jnp.stack([axx, axy], -1),
            jnp.stack([axy, ayy], -1),
        ],
        -2,
    )  # (H, W, 2, 2)
    b = jnp.stack([bx, by], -1)  # (H, W, 2)
    return A, b


def _displacement_update_planes(
    p1, p2, flow: jax.Array, win: np.ndarray, eps: float = 1e-6
) -> jax.Array:
    """One Farnebäck displacement solve given both plane expansions and the
    current flow estimate.

    Every per-pixel tensor contraction of the textbook form (A·d₀, AᵀA,
    AᵀΔb) is expanded to elementwise plane arithmetic using the symmetry
    of A — per-pixel einsums over (H, W, 2, 2) tensors lower to batched
    2×2 matmuls that run 7.5× slower on TPU (probe record in
    _poly_exp_planes).  Math identical to cv2's non-Gaussian default
    (winsize box average; reference call train.py:322-324)."""
    axx1, ayy1, axy1, bx1, by1 = p1
    axx2, ayy2, axy2, bx2, by2 = p2
    axx = 0.5 * (axx1 + axx2)
    ayy = 0.5 * (ayy1 + ayy2)
    axy = 0.5 * (axy1 + axy2)
    u0, v0 = flow[..., 0], flow[..., 1]
    # Δb = −½(b₂−b₁) + A·d₀
    db1 = -0.5 * (bx2 - bx1) + axx * u0 + axy * v0
    db2 = -0.5 * (by2 - by1) + axy * u0 + ayy * v0
    # least-squares over the window: (Σ AᵀA) d = Σ AᵀΔb, A symmetric so
    # AᵀA = A² and AᵀΔb = A·Δb — all elementwise
    g11 = axx * axx + axy * axy
    g12 = axy * (axx + ayy)
    g22 = axy * axy + ayy * ayy
    h1 = axx * db1 + axy * db2
    h2 = axy * db1 + ayy * db2

    # all 5 window averages in one depthwise conv pair
    stacked = jnp.stack([g11, g12, g22, h1, h2], axis=-1)
    win5 = np.stack([win] * 5)
    sm = _sep_conv2d_multi(stacked, win5, win5)
    G11, G12, G22, H1, H2 = (sm[..., i] for i in range(5))

    det = G11 * G22 - G12 * G12
    det = jnp.where(jnp.abs(det) < eps, eps, det)
    u = (G22 * H1 - G12 * H2) / det
    v = (G11 * H2 - G12 * H1) / det
    return jnp.stack([u, v], -1)


@functools.partial(
    jax.jit,
    static_argnames=(
        "levels", "winsize", "iterations", "poly_n", "poly_sigma", "fast_warp",
        "max_disp", "fine_iterations", "fine_max_disp", "fine_levels",
    ),
)
def farneback_flow_pair(
    prev: jax.Array,
    curr: jax.Array,
    levels: int = 5,
    winsize: int = 11,
    iterations: int = 5,
    poly_n: int = 5,
    poly_sigma: float = 1.1,
    fast_warp: bool = False,
    max_disp: int = 32,
    fine_iterations: int | None = None,
    fine_max_disp: int | None = None,
    fine_levels: int = 1,
) -> jax.Array:
    """Dense flow prev→curr for two gray float images (H, W) → (H, W, 2).

    The default (fast_warp=False) warp is EXACT bilinear resampling via the
    gather-free MXU kernel (pyramid.warp_image_mxu) — 9× faster than the
    gather path it replaced, and faster than the separable approximation
    at the single-warp level (0.29 vs 0.76 ms at 224²).  Inside the full
    coarse-to-fine solver the separable form still wins overall (re-A/B'd
    after the elementwise-core rewrite: 915 vs 762 fields/s on the
    80-pair turbo chunk — small pyramid levels favour shifts), so
    fast_warp=True remains the throughput knob; both bound displacements
    per warp, and the e2e TwoStream test shows predictions are identical
    either way.

    max_disp bounds the PER-WARP displacement: motions beyond ±max_disp px
    at a pyramid level saturate (PARITY.md).  The default 32 comfortably
    covers Crowd-11-scale motion; raise it for large-motion footage (cost
    grows linearly in the y shift-accumulate).

    fine_iterations / fine_max_disp (TURBO_PARAMS) override the schedule
    at the `fine_levels` finest pyramid levels (the coarsest level always
    keeps the full schedule, even when build_pyramid truncates on small
    inputs): there the coarse-level estimate is already close, so a
    single residual pass (r = 0, exact; fine_max_disp bounds the extra
    passes when fine_iterations ≥ 2) matches the full schedule within
    the EPE suite bounds while skipping most of the work at the
    resolutions that dominate cost (level 0 alone is ~75% of the
    pixels)."""
    kernels, Ginv = _poly_exp_setup(poly_n, poly_sigma)
    win = box_kernel(winsize)

    def make_warp(disp: int):
        return (
            functools.partial(warp_image_separable, max_disp=disp)
            if fast_warp
            else functools.partial(warp_image_mxu, max_disp=disp)
        )

    pyr_prev = build_pyramid(prev.astype(jnp.float32), levels)
    pyr_curr = build_pyramid(curr.astype(jnp.float32), levels)

    flow = jnp.zeros(pyr_prev[-1].shape + (2,), jnp.float32)
    # The coarsest level ALWAYS runs the full schedule: the fine-level
    # residual refinement assumes an incoming estimate from above, and a
    # truncated pyramid (build_pyramid stops at min_size — small inputs
    # yield < fine_levels+1 levels) must not demote every level to the
    # single-pass schedule starting from zero flow.
    n_fine = min(fine_levels, len(pyr_prev) - 1)
    for lvl in range(len(pyr_prev) - 1, -1, -1):
        p, c = pyr_prev[lvl], pyr_curr[lvl]
        if flow.shape[:2] != p.shape:
            flow = upsample_flow(flow, p.shape)
        p1 = _poly_exp_planes(p, kernels, Ginv)
        fine = lvl < n_fine and (fine_iterations or fine_max_disp)
        if fine:
            # Residual refinement: ONE full-range warp with the incoming
            # coarse estimate, then cheap small-range warps of the
            # residual only.  warp(warp(c, flow0), r) differs from
            # warp(c, flow0 + r) by O(r·∇flow0) — the same smooth-flow
            # approximation order as the separable warp itself, and the
            # first iteration (r = 0) is exact.
            iters = fine_iterations or iterations
            flow0 = flow
            cw0 = make_warp(max_disp)(c, flow0)
            small_warp = make_warp(fine_max_disp or max_disp)
            for i in range(iters):
                cw = cw0 if i == 0 else small_warp(cw0, flow - flow0)
                p2 = _poly_exp_planes(cw, kernels, Ginv)
                flow = _displacement_update_planes(p1, p2, flow, win)
        else:
            warp = make_warp(max_disp)
            for _ in range(iterations):
                cw = warp(c, flow)
                p2 = _poly_exp_planes(cw, kernels, Ginv)
                flow = _displacement_update_planes(p1, p2, flow, win)
    return flow


def farneback_flow_clip(gray_clip: jax.Array, **params) -> jax.Array:
    """(T, H, W) gray frames → (T−1, H, W, 2) flow for consecutive pairs —
    the reference's per-pair loop (train.py:294-332), vmapped."""
    prevs = gray_clip[:-1]
    currs = gray_clip[1:]
    return jax.vmap(lambda p, c: farneback_flow_pair(p, c, **params))(prevs, currs)


def farneback_flow_batch(
    prevs: jax.Array,
    currs: jax.Array,
    chunk_pairs: int | None = None,
    **params,
) -> jax.Array:
    """Flow for pairs with ARBITRARY leading batch dims:
    (..., H, W) → (..., H, W, 2).

    Flattens every leading dim into ONE vmap axis before mapping the
    solver.  Nested vmaps — e.g. vmap(vmap(pair)) over (B, T, H, W), the
    natural shape in the clip pipelines — carry the un-flattened batch
    dims into every conv of the pyramid and HALVE throughput on TPU:
    measured 243 fields/s nested vs 532 flat for the identical 80 224²
    pairs on v5e.  Always batch flow through this helper.

    chunk_pairs bounds peak memory: the pyramid intermediates of a fully
    vmapped batch are materialized for every pair at once (~51 MB/pair at
    224² — 480 pairs OOMs a 16 GB chip), so the flat batch is processed
    in lax.map chunks of `chunk_pairs` pairs (padded to a multiple; the
    pad rows compute throwaway zero-flow).  80-pair chunks measured 842
    fields/s inside the TwoStream pipeline on v5e."""
    h, w = prevs.shape[-2:]
    lead = prevs.shape[:-2]
    p = prevs.reshape((-1, h, w))
    c = currs.reshape((-1, h, w))
    n = p.shape[0]
    solve = jax.vmap(lambda a, b: farneback_flow_pair(a, b, **params))
    if chunk_pairs and n > chunk_pairs:
        pad = (-n) % chunk_pairs
        if pad:
            p = jnp.concatenate([p, jnp.zeros((pad, h, w), p.dtype)])
            c = jnp.concatenate([c, jnp.zeros((pad, h, w), c.dtype)])
        flows = jax.lax.map(
            lambda ab: solve(ab[0], ab[1]),
            (p.reshape(-1, chunk_pairs, h, w), c.reshape(-1, chunk_pairs, h, w)),
        ).reshape(-1, h, w, 2)[:n]
    else:
        flows = solve(p, c)
    return flows.reshape(lead + (h, w, 2))


def rgb_to_gray(clip: jax.Array) -> jax.Array:
    """BGR (reference decode order) → gray with cv2's Rec.601 weights."""
    b, g, r = clip[..., 0], clip[..., 1], clip[..., 2]
    return 0.114 * b + 0.587 * g + 0.299 * r
