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

colorspace="yuv420" additionally ships 4:2:0 chroma-subsampled YUV
(cv2's I420 layout, studio-swing BT.601 — the SAME representation the
source mp4 stores and every hardware decoder emits; the reference's
cv2.VideoCapture upconverts it to BGR at decode, train.py:257-269):
1.5 bytes/px instead of 3 → half the wire bytes again.  The device
undoes cv2's own conversion (nearest chroma upsample + BT.601
studio-swing matrix, matched to cv2.COLOR_YUV2BGR_I420 within ±1 DN).
Chroma of a 4:2:0 source survives the round-trip by construction; for
content that was RGB at pack time this is the standard lossy-chroma
video representation (PARITY.md).  Crop windows ship from an
even-aligned superwindow (+2 px) so chroma blocks stay intact; the
device re-derives the exact (y0, x0) from the same key splits and
slices the requested window bit-exactly in Y.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.augment import CROP_MARGIN, augment_crop_decisions


def _ship_dim(c: int, limit: int) -> int:
    """Smallest even superwindow length that covers an even-aligned
    origin shift (≤ 2+parity px) of a c-px window, clamped to the even
    staging extent."""
    return min(c + 2 + (c % 2), limit - (limit % 2))


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
    colorspace: str = "rgb"

    @property
    def crop_hw(self) -> Tuple[int, int]:
        """Per-axis crop window — (H−margin, W−margin), matching
        ops.augment's win_h/win_w derivation for non-square staging."""
        return (
            max(self.staging_hw[0] - self.crop_margin, 1),
            max(self.staging_hw[1] - self.crop_margin, 1),
        )

    @property
    def crop_ship_hw(self) -> Tuple[int, int]:
        """The window actually shipped.  rgb: the crop window itself.
        yuv420: the even-aligned superwindow containing it (even origin +
        even dims keep every 2×2 chroma block intact)."""
        ch, cw = self.crop_hw
        if self.colorspace == "rgb":
            return (ch, cw)
        return (
            _ship_dim(ch, self.staging_hw[0]),
            _ship_dim(cw, self.staging_hw[1]),
        )

    @property
    def crop_bytes(self) -> int:
        sh, sw = self.crop_ship_hw
        if self.colorspace == "rgb":
            return self.frames * sh * sw * 3
        return self.frames * sh * sw * 3 // 2

    @property
    def full_bytes(self) -> int:
        px = self.frames * self.out_hw[0] * self.out_hw[1]
        return px * 3 if self.colorspace == "rgb" else px * 3 // 2


def plan_wire_steps(
    key: jax.Array,
    num_steps: int,
    batch_size: int,
    frames: int,
    staging_hw: Tuple[int, int],
    out_hw: Tuple[int, int],
    p: float = 0.75,
    crop_margin: int = CROP_MARGIN,
    colorspace: str = "rgb",
) -> WirePlan:
    """Precompute every step's decisions/offsets (pure key math on the
    host CPU backend) and the exact max wire size."""
    if colorspace not in ("rgb", "yuv420"):
        raise ValueError(f"unknown wire colorspace {colorspace!r}")
    ch = max(staging_hw[0] - crop_margin, 1)
    cw = max(staging_hw[1] - crop_margin, 1)
    if ch > out_hw[0] or cw > out_hw[1]:
        # The windowed-augment protocol ships each crop window inside an
        # out_hw-sized buffer (ops.augment.crowd11_augment_windowed), so
        # the window must fit.  E.g. C3D (out 112²) needs staging_hw ≤
        # (112+margin)² = 172² on the wire path; I3D's 256²→224² fits.
        raise ValueError(
            f"crop window {(ch, cw)} (staging−margin) exceeds out_hw "
            f"{tuple(out_hw)} — the wire ships crop windows inside an "
            "out_hw buffer; lower staging_hw or raise crop_margin"
        )
    if colorspace == "yuv420":
        if any(d % 2 for d in (*staging_hw, *out_hw)):
            raise ValueError(
                "yuv420 wire requires even staging/output dims, got "
                f"staging={staging_hw} out={out_hw}"
            )
    plan = WirePlan(
        batch_size=batch_size,
        frames=frames,
        staging_hw=staging_hw,
        out_hw=out_hw,
        p=p,
        crop_margin=crop_margin,
        cap=0,
        steps={},
        colorspace=colorspace,
    )
    crop_bytes = plan.crop_bytes
    full_bytes = plan.full_bytes
    steps = {}
    # Floor at max(full, crop) bytes: the device unpack dynamic-slices
    # BOTH a crop-size and a full-size window at every offset, so an
    # all-crop plan (small batches / high p) must still leave room for
    # one full slice — and an all-full plan for one crop slice (crop can
    # exceed full when staging−margin is larger than out_hw).
    cap = max(full_bytes, crop_bytes)
    for s in range(num_steps):
        do_crop, y0, x0 = augment_crop_decisions(
            key, batch_size, staging_hw, p=p, crop_margin=crop_margin,
            fold_step=s,
        )
        sizes = np.where(do_crop, crop_bytes, full_bytes).astype(np.int64)
        offsets = np.concatenate([[0], np.cumsum(sizes)[:-1]]).astype(np.int32)
        steps[s] = (do_crop, y0, x0, offsets)
        cap = max(cap, int(sizes.sum()))
    return dataclasses.replace(plan, cap=cap, steps=steps)


@dataclasses.dataclass(frozen=True)
class ShardedWirePlan:
    """Per-data-shard view of a global WirePlan: shard d owns the
    contiguous clip range [d·B/n, (d+1)·B/n) of every step, each shard
    gets its own ragged wire buffer (one static per-shard capacity =
    exact max over shards AND steps), and the device unpacks each
    shard's buffer locally under shard_map — no cross-device bytes."""

    base: WirePlan
    n_shards: int
    cap: int  # per-shard wire capacity
    steps: Dict[int, np.ndarray]  # step → (n_shards, B/n) int32 offsets

    @property
    def shard_batch(self) -> int:
        return self.base.batch_size // self.n_shards

    def shard_view(self, step: int, d: int) -> WirePlan:
        """A WirePlan describing shard d of one step — lets the packer
        reuse pack_ragged_windows verbatim per shard."""
        do_crop, y0, x0, _ = self.base.steps[step]
        bs = self.shard_batch
        sl = slice(d * bs, (d + 1) * bs)
        return dataclasses.replace(
            self.base,
            batch_size=bs,
            cap=self.cap,
            steps={step: (do_crop[sl], y0[sl], x0[sl], self.steps[step][d])},
        )


def shard_wire_plan(plan: WirePlan, n_shards: int) -> ShardedWirePlan:
    """Split a global plan across n_shards data shards (batch_size must
    divide evenly).  Decisions are unchanged — the same global clip keys
    drive both the host pack and the device-side re-derivation."""
    if plan.batch_size % n_shards:
        raise ValueError(
            f"batch_size {plan.batch_size} not divisible by {n_shards} shards"
        )
    bs = plan.batch_size // n_shards
    crop_bytes, full_bytes = plan.crop_bytes, plan.full_bytes
    cap = max(full_bytes, crop_bytes)
    steps: Dict[int, np.ndarray] = {}
    for s, (do_crop, _y0, _x0, _off) in plan.steps.items():
        sizes = np.where(do_crop, crop_bytes, full_bytes).astype(np.int64)
        per_shard = sizes.reshape(n_shards, bs)
        offs = np.zeros((n_shards, bs), np.int32)
        offs[:, 1:] = np.cumsum(per_shard, axis=1)[:, :-1]
        steps[s] = offs
        cap = max(cap, int(per_shard.sum(axis=1).max()))
    return ShardedWirePlan(base=plan, n_shards=n_shards, cap=cap, steps=steps)


def pack_sharded_wires(
    splan: ShardedWirePlan,
    step: int,
    staging: np.ndarray,
    eval_u8: np.ndarray,
) -> Tuple[np.ndarray, np.ndarray]:
    """Host-side pack of one step into per-shard wires.

    `staging`/`eval_u8` hold the cropped/uncropped clips in GLOBAL
    decision order (exactly as for pack_ragged_windows on the base plan).
    Returns (wires (n_shards, cap) u8, offsets (n_shards, B/n) i32)."""
    do_crop = splan.base.steps[step][0]
    bs = splan.shard_batch
    wires = np.zeros((splan.n_shards, splan.cap), np.uint8)
    # global→per-shard row bookkeeping for the ragged staging/eval inputs
    crop_cum = np.concatenate([[0], np.cumsum(do_crop.reshape(splan.n_shards, bs).sum(axis=1))])
    full_cum = np.concatenate([[0], np.cumsum((~do_crop).reshape(splan.n_shards, bs).sum(axis=1))])
    for d in range(splan.n_shards):
        view = splan.shard_view(step, d)
        pack_ragged_windows(
            view,
            step,
            staging[crop_cum[d] : crop_cum[d + 1]],
            eval_u8[full_cum[d] : full_cum[d + 1]],
            out=wires[d],
        )
    return wires, splan.steps[step]


def make_sharded_wire_unpack(splan: ShardedWirePlan, mesh, data_axis: str = "data"):
    """Returns fn(wires (n_shards, cap) u8, offsets (n_shards, B/n) i32,
    step_key) → (B, T, out_h, out_w, 3) u8, batch-sharded over
    `data_axis`.  Each device unpacks only its own wire row (shard_map —
    the ragged buffer never crosses devices); clip keys are the SAME
    global split the single-buffer unpack and the augment stage use, so
    downstream crowd11_augment_windowed_batch needs no changes."""
    try:
        from jax import shard_map  # jax ≥ 0.7 public API
    except ImportError:  # pragma: no cover
        from jax.experimental.shard_map import shard_map

    from jax.sharding import PartitionSpec as P

    axis_size = mesh.shape[data_axis]
    if axis_size != splan.n_shards:
        # A divisor mesh would silently read only wire_rows[0] per block
        # and pair kept rows with the wrong clip keys — refuse loudly.
        raise ValueError(
            f"plan sharded {splan.n_shards} ways but mesh axis "
            f"{data_axis!r} has {axis_size} devices"
        )

    one = _make_clip_unpack(dataclasses.replace(splan.base, cap=splan.cap))
    batch_size = splan.base.batch_size
    bs = splan.shard_batch

    def _unpack_shard(wire_rows, off_rows, step_key):
        # inside shard_map: wire_rows (1, cap), off_rows (1, bs)
        d = jax.lax.axis_index(data_axis)
        all_keys = jax.random.split(step_key, batch_size)
        kd = jax.lax.dynamic_slice_in_dim(
            jax.random.key_data(all_keys), d * bs, bs
        )
        keys = jax.random.wrap_key_data(kd)
        wire = wire_rows[0]
        return jax.lax.map(
            lambda args: one(wire, args[0], args[1]), (off_rows[0], keys)
        )

    return shard_map(
        _unpack_shard,
        mesh=mesh,
        in_specs=(P(data_axis, None), P(data_axis, None), P()),
        out_specs=P(data_axis),
    )


def _even_origin(o: int, ship: int, limit: int) -> int:
    """Even-aligned superwindow origin covering [o, o+window) — the same
    arithmetic the device unpack re-derives (keep in lockstep)."""
    return min(o - (o % 2), limit - ship)


def bgr_clip_to_i420(clip_u8: np.ndarray) -> np.ndarray:
    """u8 (T, H, W, 3) BGR → flat u8 I420 bytes (T · H·W·3/2,) via cv2 —
    the exact forward conversion the device inverse is matched to."""
    import cv2

    return np.concatenate(
        [
            cv2.cvtColor(np.ascontiguousarray(f), cv2.COLOR_BGR2YUV_I420).ravel()
            for f in clip_u8
        ]
    )


def bgr_clips_to_i420_batch(clips_u8: np.ndarray) -> np.ndarray:
    """u8 (B, T, H, W, 3) BGR → u8 (B, T·H·W·3/2) per-frame I420 rows,
    BYTE-IDENTICAL to stacking `bgr_clip_to_i420` per clip but ~20·B×
    fewer cv2 calls: ALL frames convert in ONE cvtColor on a vertically
    stacked (B·T·H, W, 3) image.  Valid because H is even, so cv2's 2×2
    chroma-subsample blocks never straddle a frame boundary; the single
    call's plane-major output (all Y, all U, all V) is then reshuffled
    to the per-frame [Y|U|V] layout the device decoder consumes
    (`i420_to_bgr_u8`).  This is the pack the resident ingest runs
    (once, at decode-cache build): ~0.13 s per 48 staged clips vs ~3 s
    for the per-clip loop on the 1-core bench host."""
    import cv2

    B, T, H, W, _ = clips_u8.shape
    if H % 2 or W % 2:
        raise ValueError(f"I420 needs even frame dims, got {H}x{W}")
    stacked = np.ascontiguousarray(clips_u8.reshape(B * T * H, W, 3))
    buf = cv2.cvtColor(stacked, cv2.COLOR_BGR2YUV_I420).ravel()
    n_y = B * T * H * W
    n_c = n_y // 4
    y = buf[:n_y].reshape(B, T, H * W)
    u = buf[n_y : n_y + n_c].reshape(B, T, H * W // 4)
    v = buf[n_y + n_c :].reshape(B, T, H * W // 4)
    return np.concatenate([y, u, v], axis=-1).reshape(B, T * H * W * 3 // 2)


def pack_ragged_windows(
    plan: WirePlan,
    step: int,
    staging: np.ndarray,
    eval_u8: np.ndarray,
    out: "np.ndarray | None" = None,
) -> Tuple[np.ndarray, np.ndarray]:
    """Host-side ragged pack — pure indexing (rgb) or indexing + the
    decoder's native I420 representation (yuv420).  `staging` holds the
    cropped clips' staging frames in decision order (only those clips);
    `eval_u8` the uncropped clips' decode-time resizes (only those).
    Returns (wire (cap,) u8, offsets (B,) i32).  `out`: preallocated
    zeroed (cap,) u8 buffer to fill in place (pack_sharded_wires passes
    its per-shard rows to avoid a second cap-sized alloc+copy on the
    feeder path)."""
    do_crop, y0, x0, offsets = plan.steps[step]
    yuv = plan.colorspace == "yuv420"
    sh, sw = plan.crop_ship_hw
    hh, ww = plan.staging_hw
    wire = np.zeros(plan.cap, np.uint8) if out is None else out
    crop_pos = np.nonzero(do_crop)[0]
    full_pos = np.nonzero(~do_crop)[0]
    for j, i in enumerate(crop_pos):
        o = offsets[i]
        if yuv:
            ye = _even_origin(int(y0[i]), sh, hh)
            xe = _even_origin(int(x0[i]), sw, ww)
            window = staging[j, :, ye : ye + sh, xe : xe + sw]
            wire[o : o + plan.crop_bytes] = bgr_clip_to_i420(window)
        else:
            window = staging[j, :, y0[i] : y0[i] + sh, x0[i] : x0[i] + sw]
            wire[o : o + plan.crop_bytes] = window.ravel()
    for j, i in enumerate(full_pos):
        o = offsets[i]
        payload = bgr_clip_to_i420(eval_u8[j]) if yuv else eval_u8[j].ravel()
        wire[o : o + plan.full_bytes] = payload
    return wire, offsets


def i420_to_bgr_u8(flat_u8: jax.Array, frames: int, h: int, w: int) -> jax.Array:
    """Device inverse of cv2.COLOR_YUV2BGR_I420: flat I420 bytes →
    u8 (frames, h, w, 3) BGR.  Nearest (2×2 replication) chroma upsample
    + studio-swing BT.601 — matched to cv2 within ±1 DN (cv2 evaluates
    the same matrix in Q20 fixed point; we round the float form)."""
    fr = flat_u8.reshape(frames, h * 3 // 2, w).astype(jnp.float32)
    y = fr[:, :h, :]
    chroma = fr[:, h:, :].reshape(frames, 2, h // 2, w // 2)
    up = jnp.repeat(jnp.repeat(chroma, 2, axis=-2), 2, axis=-1)
    u = up[:, 0] - 128.0
    v = up[:, 1] - 128.0
    # 1220542/2^20 = cv2's ITUR_BT_601_CY; cv2 clamps (Y-16) at 0 BEFORE
    # scaling (sub-black Y never drives the matrix negative)
    yy = 1.1640625 * jnp.maximum(y - 16.0, 0.0)
    b = yy + 2.0178222656 * u
    g = yy - 0.3909912109 * u - 0.8129882812 * v
    r = yy + 1.5959472656 * v
    bgr = jnp.stack([b, g, r], axis=-1)
    return jnp.clip(jnp.round(bgr), 0.0, 255.0).astype(jnp.uint8)


def _make_clip_unpack(plan: WirePlan):
    """fn(wire_u8 (cap,), off scalar, k clip-key) → (T, oh, ow, 3) u8 —
    the per-clip device unpack shared by the single-buffer and sharded
    ingest paths.  Gates (and, for yuv420, the crop origins) are
    re-derived from the clip key with the same splits as the host plan."""
    ch, cw = plan.crop_hw
    sh, sw = plan.crop_ship_hw
    hh, ww = plan.staging_hw
    frames = plan.frames
    oh, ow = plan.out_hw
    crop_bytes = plan.crop_bytes
    full_bytes = plan.full_bytes
    cap = plan.cap
    p = plan.p
    yuv = plan.colorspace == "yuv420"

    def one(wire_u8, off, k):
        # same derivation as crowd11_augment / augment_crop_decisions
        k_crop_gate, k_crop_pos = jax.random.split(k, 7)[:2]
        gate = jax.random.bernoulli(k_crop_gate, p)
        crop_flat = jax.lax.dynamic_slice(wire_u8, (off,), (crop_bytes,))
        crop_img = jnp.zeros((frames, oh, ow, 3), jnp.uint8)
        if yuv:
            ky, kx = jax.random.split(k_crop_pos)
            y0 = jax.random.randint(ky, (), 0, hh - ch + 1)
            x0 = jax.random.randint(kx, (), 0, ww - cw + 1)
            dy = y0 - jnp.minimum(y0 - y0 % 2, hh - sh)
            dx = x0 - jnp.minimum(x0 - x0 % 2, ww - sw)
            super_img = i420_to_bgr_u8(crop_flat, frames, sh, sw)
            window = jax.lax.dynamic_slice(
                super_img, (0, dy, dx, 0), (frames, ch, cw, 3)
            )
        else:
            window = crop_flat.reshape(frames, ch, cw, 3)
        crop_img = jax.lax.dynamic_update_slice(
            crop_img, window, (0, 0, 0, 0)
        )
        full_off = jnp.minimum(off, cap - full_bytes)
        full_flat = jax.lax.dynamic_slice(wire_u8, (full_off,), (full_bytes,))
        full_img = (
            i420_to_bgr_u8(full_flat, frames, oh, ow)
            if yuv
            else full_flat.reshape(frames, oh, ow, 3)
        )
        return jnp.where(gate, crop_img, full_img)

    return one


def make_wire_unpack(plan: WirePlan):
    """Returns a jit-friendly fn(wire_u8, offsets, step_key) →
    (B, T, out_h, out_w, 3) u8 padded window batch (the input
    crowd11_augment_windowed_batch expects)."""
    one = _make_clip_unpack(plan)
    batch_size = plan.batch_size

    def unpack(wire_u8, offsets, step_key):
        clip_keys = jax.random.split(step_key, batch_size)
        return jax.lax.map(
            lambda args: one(wire_u8, args[0], args[1]), (offsets, clip_keys)
        )

    return unpack
