"""Ragged window wire format for transfer-constrained host→device links.

On a TPU host the PCIe link (~16 GB/s) never bottlenecks the input
pipeline, but remote-device links (the axon relay tunnel: ~0.03 GB/s) or
DCN-fed setups can.  This module ships each clip with exactly the bytes
its augmentation decision needs:

- a clip whose key-derived gate says CROP ships only its (H−margin)²
  staging window (the host slices it — pure indexing; the decision comes
  from the same threefry bits the device derives, ops.augment),
- an uncropped clip ships its decode-time u8 eval resize (the
  reference's own cv2-resize-on-uint8 preprocessing, train.py:283-289),

concatenated into ONE buffer whose static size is the exact maximum over
a key-determined step plan — a single executable, no padding waste, no
reliance on transport compression.  The device re-derives the gates from
the same fold and unpacks with static-size dynamic slices; the unpacked
batch feeds ops.augment.crowd11_augment_windowed_batch unchanged.

Measured end-to-end (bench.py, v5e through the 0.033 GB/s axon tunnel):
2.54 MB/clip on the wire vs 3.93 dense → 13.1 clips/s decode-inclusive,
1.26× the north-star per-chip rate, cleanly transfer-bound.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.augment import CROP_MARGIN, augment_crop_decisions


@dataclasses.dataclass(frozen=True)
class WirePlan:
    """Key-determined transfer plan: per-step decisions/offsets + the
    static wire capacity (exact max over the planned steps)."""

    batch_size: int
    frames: int
    staging_hw: Tuple[int, int]
    out_hw: Tuple[int, int]
    p: float
    crop_margin: int
    cap: int
    steps: Dict[int, Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]]

    @property
    def crop_hw(self) -> int:
        return max(self.staging_hw[0] - self.crop_margin, 1)

    @property
    def crop_bytes(self) -> int:
        return self.frames * self.crop_hw * self.crop_hw * 3

    @property
    def full_bytes(self) -> int:
        return self.frames * self.out_hw[0] * self.out_hw[1] * 3


def plan_wire_steps(
    key: jax.Array,
    num_steps: int,
    batch_size: int,
    frames: int,
    staging_hw: Tuple[int, int],
    out_hw: Tuple[int, int],
    p: float = 0.75,
    crop_margin: int = CROP_MARGIN,
) -> WirePlan:
    """Precompute every step's decisions/offsets (pure key math on the
    host CPU backend) and the exact max wire size."""
    ch = max(staging_hw[0] - crop_margin, 1)
    crop_bytes = frames * ch * ch * 3
    full_bytes = frames * out_hw[0] * out_hw[1] * 3
    steps = {}
    cap = 0
    for s in range(num_steps):
        do_crop, y0, x0 = augment_crop_decisions(
            key, batch_size, staging_hw, p=p, crop_margin=crop_margin,
            fold_step=s,
        )
        sizes = np.where(do_crop, crop_bytes, full_bytes).astype(np.int64)
        offsets = np.concatenate([[0], np.cumsum(sizes)[:-1]]).astype(np.int32)
        steps[s] = (do_crop, y0, x0, offsets)
        cap = max(cap, int(sizes.sum()))
    return WirePlan(
        batch_size=batch_size,
        frames=frames,
        staging_hw=staging_hw,
        out_hw=out_hw,
        p=p,
        crop_margin=crop_margin,
        cap=cap,
        steps=steps,
    )


def pack_ragged_windows(
    plan: WirePlan,
    step: int,
    staging: np.ndarray,
    eval_u8: np.ndarray,
) -> Tuple[np.ndarray, np.ndarray]:
    """Host-side ragged pack — pure indexing.  `staging` holds the
    cropped clips' staging frames in decision order (only those clips);
    `eval_u8` the uncropped clips' decode-time resizes (only those).
    Returns (wire (cap,) u8, offsets (B,) i32)."""
    do_crop, y0, x0, offsets = plan.steps[step]
    ch = plan.crop_hw
    wire = np.zeros(plan.cap, np.uint8)
    crop_pos = np.nonzero(do_crop)[0]
    full_pos = np.nonzero(~do_crop)[0]
    for j, i in enumerate(crop_pos):
        window = staging[j, :, y0[i] : y0[i] + ch, x0[i] : x0[i] + ch]
        o = offsets[i]
        wire[o : o + plan.crop_bytes] = window.ravel()
    for j, i in enumerate(full_pos):
        o = offsets[i]
        wire[o : o + plan.full_bytes] = eval_u8[j].ravel()
    return wire, offsets


def make_wire_unpack(plan: WirePlan):
    """Returns a jit-friendly fn(wire_u8, offsets, step_key) →
    (B, T, out_h, out_w, 3) u8 padded window batch (the input
    crowd11_augment_windowed_batch expects).  Gates are re-derived from
    step_key with the same splits as the host plan."""
    ch = plan.crop_hw
    frames = plan.frames
    oh, ow = plan.out_hw
    crop_bytes = plan.crop_bytes
    full_bytes = plan.full_bytes
    cap = plan.cap
    p = plan.p
    batch_size = plan.batch_size

    def unpack(wire_u8, offsets, step_key):
        clip_keys = jax.random.split(step_key, batch_size)

        def one(args):
            off, k = args
            gate = jax.random.bernoulli(
                jax.random.split(k, 7)[0], p
            )  # k_crop_gate — same derivation as crowd11_augment
            crop_flat = jax.lax.dynamic_slice(wire_u8, (off,), (crop_bytes,))
            crop_img = jnp.zeros((frames, oh, ow, 3), jnp.uint8)
            crop_img = jax.lax.dynamic_update_slice(
                crop_img, crop_flat.reshape(frames, ch, ch, 3), (0, 0, 0, 0)
            )
            full_off = jnp.minimum(off, cap - full_bytes)
            full_img = jax.lax.dynamic_slice(
                wire_u8, (full_off,), (full_bytes,)
            ).reshape(frames, oh, ow, 3)
            return jnp.where(gate, crop_img, full_img)

        return jax.lax.map(one, (offsets, clip_keys))

    return unpack
