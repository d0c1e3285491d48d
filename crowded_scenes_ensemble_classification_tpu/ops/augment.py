"""The fused Crowd-11 augmentation policy, batched and device-resident.

The experiment policy (reference augment_dataset.py:16-32, reused on-the-fly
at train.py:177-178) is:

    Sequential([ Sometimes(p, RandomCrop(H−60, W−60)),
                 Sometimes(p, HorizontalFlip),
                 Sometimes(p, Salt(ratio=100)),
                 Sometimes(p, Pepper(ratio=100)) ])
    followed by per-frame resize to the model input size
    (augment_dataset.py:79-83 / train.py:283-289),

with p = 0.85 offline / 0.75 on-the-fly.

TPU-first design: instead of materializing the crop, the crop window AND the
flip are folded into the bilinear resize sampling grid — one gather+lerp
touches the pixels exactly once — and the salt/pepper masks are fused
elementwise epilogues.  The whole policy is one jit region, vmapped over the
batch; under bf16 models this is the only fp32 stage.

Deviation note: the reference applies salt/pepper at the source resolution
*before* the resize (the noise then gets low-pass filtered); here noise is
applied after the resize at target resolution.  Same expected density, very
slightly different texture — documented as a deliberate deviation
(SURVEY.md §7.3.4-style parity note).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from .resize import crop_resize

CROP_MARGIN = 60  # reference crops to (H−60, W−60): augment_dataset.py:25-27
NOISE_RATIO = 100  # salt/pepper density 1/100: augment_dataset.py:29-31


def crowd11_augment(
    clip: jax.Array,
    key: jax.Array,
    out_hw: Tuple[int, int],
    p: float = 0.75,
    crop_margin: int = CROP_MARGIN,
    noise_ratio: int = NOISE_RATIO,
    apply_noise: bool = True,
) -> jax.Array:
    """Augment one (T, H, W, C) float clip → (T, out_h, out_w, C).

    All four Bernoulli gates and the crop offset are derived from `key`;
    the output shape is static.  apply_noise=False skips the salt/pepper
    tail (used when the batched Pallas noise kernel runs instead).
    """
    t, h, w, c = clip.shape
    k_crop_gate, k_crop_pos, k_flip, k_salt_gate, k_salt, k_pep_gate, k_pep = (
        jax.random.split(key, 7)
    )

    ch, cw = max(h - crop_margin, 1), max(w - crop_margin, 1)
    do_crop = jax.random.bernoulli(k_crop_gate, p)
    ky, kx = jax.random.split(k_crop_pos)
    y0 = jax.random.randint(ky, (), 0, h - ch + 1)
    x0 = jax.random.randint(kx, (), 0, w - cw + 1)

    # Fold "maybe crop" into the sampling window: full frame when gate off.
    win_y0 = jnp.where(do_crop, y0, 0).astype(jnp.float32)
    win_x0 = jnp.where(do_crop, x0, 0).astype(jnp.float32)
    win_h = jnp.where(do_crop, float(ch), float(h))
    win_w = jnp.where(do_crop, float(cw), float(w))

    do_flip = jax.random.bernoulli(k_flip, p)

    out = crop_resize(
        clip,
        out_hw,
        win_start_yx=(win_y0, win_x0),
        win_size_hw=(win_h, win_w),
        flip_x=do_flip,
    )

    if apply_noise:
        do_salt = jax.random.bernoulli(k_salt_gate, p)
        salt_hits = jax.random.randint(k_salt, out.shape, 0, noise_ratio) == 0
        out = jnp.where(do_salt & salt_hits, 255.0, out)

        do_pepper = jax.random.bernoulli(k_pep_gate, p)
        pepper_hits = jax.random.randint(k_pep, out.shape, 0, noise_ratio) == 0
        out = jnp.where(do_pepper & pepper_hits, 0.0, out)
    return out


def crowd11_augment_batch(
    clips: jax.Array,
    key: jax.Array,
    out_hw: Tuple[int, int],
    p: float = 0.75,
    noise_impl: str = "xla",
    crop_margin: int = CROP_MARGIN,
) -> jax.Array:
    """vmapped policy over a batch (B, T, H, W, C) with independent
    per-sample keys.

    noise_impl='pallas' runs the salt/pepper tail as the fused Pallas
    kernel (ops.pallas.noise) — one HBM pass with on-core PRNG instead of
    materialized randint tensors; 'xla' is the pure-XLA path (default —
    portable to CPU tests)."""
    keys = jax.random.split(key, clips.shape[0])
    if noise_impl == "pallas":
        out = jax.vmap(
            lambda c, k: crowd11_augment(
                c, k, out_hw, p, crop_margin, apply_noise=False
            )
        )(clips, keys)
        from .pallas.noise import crowd11_noise_pallas

        return crowd11_noise_pallas(out, jax.random.fold_in(key, 1), p)
    return jax.vmap(lambda c, k: crowd11_augment(c, k, out_hw, p, crop_margin))(
        clips, keys
    )


def identity_resize_batch(clips: jax.Array, out_hw: Tuple[int, int]) -> jax.Array:
    """The non-augmented path: plain per-clip resize (train.py:283-289)."""
    return jax.vmap(lambda c: crop_resize(c, out_hw))(clips)


def crowd11_augment_gray_pair_batch(
    gray: jax.Array,
    gray_next: jax.Array,
    key: jax.Array,
    p: float = 0.75,
    crop_margin: int = CROP_MARGIN,
    noise_ratio: int = NOISE_RATIO,
    apply_noise: bool = True,
) -> Tuple[jax.Array, jax.Array]:
    """Apply the rgb stream's augmentation to the Farnebäck gray staging
    pairs — the reference's augmented-Farnebäck TwoStream mode, where flow
    is computed from the AUGMENTED frames (train.py:176-184: the whole
    decoded clip is augmented first, then opticalflow_FarneBack_extractor
    runs on the augmented frames).

    `gray`/`gray_next` are (B, T, H, W, 1) float staging frames at the SAME
    resolution as the rgb staging.  Per-clip keys are split exactly like
    `crowd11_augment_batch` (split key into B, then split 7 per clip), so
    the crop window and flip decisions are bit-identical to the ones the
    rgb stream applies — the two streams stay geometrically aligned, like
    the reference's single augmented frame list feeding both.

    Deviations (documented in PARITY.md): salt/pepper draws here are
    per-gray-pixel at staging resolution with stream-tagged subkeys
    (fold_in(k_salt, 0|1)), not the grayscale projection of the rgb
    stream's per-channel draws (the staged pipeline no longer has the rgb
    channels of the flow frames); the crop window is resampled back to
    staging resolution before flow (the reference ran flow on the cropped
    frames rescaled to max-dim-224 — both paths resample once).
    """

    def one(g, gn, kk):
        t, h, w, _ = g.shape
        k_crop_gate, k_crop_pos, k_flip, k_salt_gate, k_salt, k_pep_gate, k_pep = (
            jax.random.split(kk, 7)
        )
        ch, cw = max(h - crop_margin, 1), max(w - crop_margin, 1)
        do_crop = jax.random.bernoulli(k_crop_gate, p)
        ky, kx = jax.random.split(k_crop_pos)
        y0 = jax.random.randint(ky, (), 0, h - ch + 1)
        x0 = jax.random.randint(kx, (), 0, w - cw + 1)
        win_y0 = jnp.where(do_crop, y0, 0).astype(jnp.float32)
        win_x0 = jnp.where(do_crop, x0, 0).astype(jnp.float32)
        win_h = jnp.where(do_crop, float(ch), float(h))
        win_w = jnp.where(do_crop, float(cw), float(w))
        do_flip = jax.random.bernoulli(k_flip, p)

        def spatial(frames):
            return crop_resize(
                frames,
                (h, w),
                win_start_yx=(win_y0, win_x0),
                win_size_hw=(win_h, win_w),
                flip_x=do_flip,
            )

        g_out, gn_out = spatial(g), spatial(gn)
        if apply_noise:
            do_salt = jax.random.bernoulli(k_salt_gate, p)
            do_pepper = jax.random.bernoulli(k_pep_gate, p)

            def noise(frames, stream):
                ks = jax.random.fold_in(k_salt, stream)
                kp = jax.random.fold_in(k_pep, stream)
                salt = jax.random.randint(ks, frames.shape, 0, noise_ratio) == 0
                out = jnp.where(do_salt & salt, 255.0, frames)
                pep = jax.random.randint(kp, frames.shape, 0, noise_ratio) == 0
                return jnp.where(do_pepper & pep, 0.0, out)

            g_out, gn_out = noise(g_out, 0), noise(gn_out, 1)
        return g_out, gn_out

    keys = jax.random.split(key, gray.shape[0])
    return jax.vmap(one)(gray, gray_next, keys)


# ----------------------------------------------------------------------
# Window transfers: host slices the crop window, device does the math.
#
# Through a slow host→device link the full staging frames dominate the
# wire; but the crop DECISION is pure key math and the slice is pure
# indexing, so the host can pre-slice the exact window the device will
# sample and send ~(H−60)² instead of H² pixels — no pixel arithmetic
# moves to the host and determinism is unchanged (threefry bits are
# backend-independent, so the host and device derive identical gates
# from the same key).
# ----------------------------------------------------------------------


def augment_crop_decisions(
    key: jax.Array,
    batch_size: int,
    staging_hw: Tuple[int, int],
    p: float = 0.75,
    crop_margin: int = CROP_MARGIN,
    fold_step: int | None = None,
):
    """Host-side replica of crowd11_augment's crop decisions.

    Performs EXACTLY the same key splits as `crowd11_augment` (split 7,
    gate from k_crop_gate, offsets from k_crop_pos) so a host that slices
    windows with these decisions agrees bit-for-bit with a device that
    re-derives them from the same `key`.  Returns numpy
    (do_crop (B,) bool, y0 (B,) int32, x0 (B,) int32).

    Runs ENTIRELY on the host CPU backend — `key` may live on an
    accelerator; it is copied once and all math (including the optional
    `fold_step` fold-in, which must match the device-side
    `jax.random.fold_in(key, step)`) happens on CPU so a feeder thread
    never enqueues accelerator work (threefry bits are identical across
    backends).
    """
    import numpy as np

    h, w = staging_hw
    fn = _decisions_jit(
        batch_size, h, w, float(p), crop_margin, fold_step is not None
    )
    cpu = jax.local_devices(backend="cpu")[0]
    key_cpu = jax.device_put(jax.device_get(key), cpu)
    step_cpu = jax.device_put(np.uint32(fold_step or 0), cpu)
    with jax.default_device(cpu):
        do_crop, y0, x0 = fn(key_cpu, step_cpu)
    return np.asarray(do_crop), np.asarray(y0), np.asarray(x0)


@functools.lru_cache(maxsize=None)
def _decisions_jit(batch_size: int, h: int, w: int, p: float,
                   crop_margin: int, folded: bool):
    """One cached jit per decision geometry; the fold step is a TRACED
    argument so per-step calls reuse the same executable."""
    ch, cw = max(h - crop_margin, 1), max(w - crop_margin, 1)

    def decisions(k, step):
        if folded:
            k = jax.random.fold_in(k, step)

        def one(kk):
            k_crop_gate, k_crop_pos = jax.random.split(kk, 7)[:2]
            do_crop = jax.random.bernoulli(k_crop_gate, p)
            ky, kx = jax.random.split(k_crop_pos)
            y0 = jax.random.randint(ky, (), 0, h - ch + 1)
            x0 = jax.random.randint(kx, (), 0, w - cw + 1)
            return do_crop, y0, x0

        return jax.vmap(one)(jax.random.split(k, batch_size))

    return jax.jit(decisions)


def crowd11_augment_windowed(
    window: jax.Array,
    key: jax.Array,
    out_hw: Tuple[int, int],
    staging_hw: Tuple[int, int],
    p: float = 0.75,
    crop_margin: int = CROP_MARGIN,
    noise_ratio: int = NOISE_RATIO,
) -> jax.Array:
    """crowd11_augment on a PRE-SLICED staging window.

    `window` is (T, out_h, out_w, C): for a cropped clip the host wrote the
    (H−60)×(W−60) crop window (chosen by `augment_crop_decisions` from this
    same `key`) into the top-left corner; for an uncropped clip it wrote
    the full frame already resized to out_hw (decode-time u8 resize — the
    reference's own cv2.resize-on-uint8 semantics, train.py:283-289).

    The crop gate, flip and salt/pepper gates are re-derived from `key`
    with the same splits as `crowd11_augment`; for cropped clips the
    result selects the same source pixels with tap weights within 1 ulp
    of the unwindowed path (≤2e-3 on the 0-255 scale — the full path adds
    the window origin to the sampling coords before taking frac, the
    windowed path doesn't).  Uncropped clips see the identity window
    (out_hw at offset 0 → bilinear weights collapse to exact copies), so
    flip/noise still apply on-device.
    """
    t, bh, bw_, c = window.shape
    h, w = staging_hw
    ch, cw = max(h - crop_margin, 1), max(w - crop_margin, 1)
    k_crop_gate, _k_crop_pos, k_flip, k_salt_gate, k_salt, k_pep_gate, k_pep = (
        jax.random.split(key, 7)
    )
    do_crop = jax.random.bernoulli(k_crop_gate, p)
    win_h = jnp.where(do_crop, float(ch), float(bh))
    win_w = jnp.where(do_crop, float(cw), float(bw_))
    do_flip = jax.random.bernoulli(k_flip, p)

    out = crop_resize(
        window,
        out_hw,
        win_start_yx=(jnp.float32(0.0), jnp.float32(0.0)),
        win_size_hw=(win_h, win_w),
        flip_x=do_flip,
    )
    do_salt = jax.random.bernoulli(k_salt_gate, p)
    salt_hits = jax.random.randint(k_salt, out.shape, 0, noise_ratio) == 0
    out = jnp.where(do_salt & salt_hits, 255.0, out)
    do_pepper = jax.random.bernoulli(k_pep_gate, p)
    pepper_hits = jax.random.randint(k_pep, out.shape, 0, noise_ratio) == 0
    out = jnp.where(do_pepper & pepper_hits, 0.0, out)
    return out


def crowd11_augment_windowed_batch(
    windows: jax.Array,
    key: jax.Array,
    out_hw: Tuple[int, int],
    staging_hw: Tuple[int, int],
    p: float = 0.75,
    crop_margin: int = CROP_MARGIN,
) -> jax.Array:
    """vmapped windowed policy over (B, T, out_h, out_w, C) pre-sliced
    buffers, per-sample keys split exactly like crowd11_augment_batch."""
    keys = jax.random.split(key, windows.shape[0])
    return jax.vmap(
        lambda wnd, k: crowd11_augment_windowed(
            wnd, k, out_hw, staging_hw, p, crop_margin
        )
    )(windows, keys)


def decode_time_eval_resize_u8(clip_u8, out_hw: Tuple[int, int]):
    """Decode-time resize of a u8 (T, H, W, C) clip to u8 out_hw frames —
    the reference's own preprocessing (cv2.resize on uint8 frames,
    train.py:283-289, rounds to u8).  Run ONCE at decode/cache-build time
    so eval-path transfers carry exactly the bytes the model consumes;
    per-step math stays on device."""
    import numpy as np

    cpu = jax.local_devices(backend="cpu")[0]
    with jax.default_device(cpu):
        out = crop_resize(jnp.asarray(np.asarray(clip_u8), jnp.float32), out_hw)
    return np.clip(np.rint(np.asarray(out)), 0, 255).astype(np.uint8)


def pack_windows_host(
    staging: "np.ndarray",
    eval_resized: "np.ndarray",
    do_crop: "np.ndarray",
    y0: "np.ndarray",
    x0: "np.ndarray",
    out_hw: Tuple[int, int],
    crop_margin: int = CROP_MARGIN,
) -> "np.ndarray":
    """Assemble the (B, T, out_h, out_w, C) u8 transfer buffer on host.

    Pure indexing: cropped clips get their staging crop window in the
    top-left corner (zero border — long runs compress on the wire);
    uncropped clips get their precomputed decode-time u8 resize."""
    import numpy as np

    b, t, h, w, c = staging.shape
    ch, cw = max(h - crop_margin, 1), max(w - crop_margin, 1)
    buf = np.zeros((b, t) + tuple(out_hw) + (c,), np.uint8)
    for i in range(b):
        if do_crop[i]:
            buf[i, :, :ch, :cw] = staging[
                i, :, y0[i] : y0[i] + ch, x0[i] : x0[i] + cw
            ]
        else:
            buf[i] = eval_resized[i]
    return buf
