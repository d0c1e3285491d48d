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
            lambda c, k: crowd11_augment(c, k, out_hw, p, apply_noise=False)
        )(clips, keys)
        from .pallas.noise import crowd11_noise_pallas

        return crowd11_noise_pallas(out, jax.random.fold_in(key, 1), p)
    return jax.vmap(lambda c, k: crowd11_augment(c, k, out_hw, p))(clips, keys)


def identity_resize_batch(clips: jax.Array, out_hw: Tuple[int, int]) -> jax.Array:
    """The non-augmented path: plain per-clip resize (train.py:283-289)."""
    return jax.vmap(lambda c: crop_resize(c, out_hw))(clips)
