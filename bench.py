"""Headline benchmark: END-TO-END ensemble inference clips/sec/chip.

Measures the BASELINE.json north-star path on one chip, decode-inclusive.
Default ingest (round-3 final) is RESIDENT: clip-cache host reads (the
framework's decode-once store, replacing the reference's per-epoch cv2
decode loop, train.py:257-269) → host i420 pack (the store's own 4:2:0
layout) → ONE-TIME upload of the staged split to device HBM → per epoch,
fully on device: fresh key-derived augmentation over the resident staging
buffer (ops.augment.crowd11_augment_batch) → 4-member sequential
(lax.map) I3D forward (bf16) → on-device score fusion.  The host→device
link is paid once per clip per experiment — the TPU-native architecture
(data.resident) — which also detaches the headline from the axon relay
tunnel's 3× minute-to-minute bandwidth swings (measured 0.014-0.044 GB/s
within one hour; the link does NOT overlap compute and its LZ-style
transport compression rewards smooth video, not low-entropy deltas —
/tmp probe, round 3 session 5).  BENCH_INGEST=wire selects the per-step
ragged crop-window wire path instead (every epoch re-ships each clip's
exact decision bytes, transfer in a feeder thread):

Wire-format engineering (round-3, VERDICT items 1a/1b): the host never
does per-step pixel math, but it DOES slice the exact crop window the
device will sample — the crop decisions come from the same fold-in keys
(threefry bits are backend-independent), so determinism and the
device-side math are unchanged.  The wire format is RAGGED: each clip
ships exactly the bytes its decision needs — the (H−60)² crop window,
or its decode-time u8 resize (the reference's own cv2-resize-on-uint8
preprocessing, train.py:283-289) — concatenated into one buffer whose
static size is the exact maximum over the bench's (fully key-determined)
steps.  Clips ship in the mp4's own 4:2:0 chroma-subsampled I420 layout
(data.wire_format colorspace="yuv420": 1.5 B/px; the device inverts
cv2's YUV→BGR conversion within ±1 DN) — ~1.3 MB/clip on the wire
instead of the dense 3.9, with no reliance on transport compression;
the device re-derives the gates and unpacks with static-size dynamic
slices.  device_put runs inside the feeder thread with a bounded queue,
so transfers overlap member compute.  BENCH_WIRE=rgb selects the
full-chroma ragged wire (~2.5 MB/clip) instead.

Bench data has REAL decoded-video statistics: synthetic moving scenes
(textured background + pan + sensor noise) are encoded to mp4 and decoded
back, so the cache holds codec-quantized frames — exactly what a
production decode-once store holds.  Uniform-random pixels (8 bits/px of
entropy, unlike any decodable video) would pessimize transport
compression on the host→device link.

The north-star target is ≥5000 clips/min end-to-end on a v5e-8, i.e.
≈10.42 clips/sec/chip; vs_baseline is measured against that per-chip rate.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...} where
`value` is the decode-inclusive rate; extra fields break out the
device-only pipeline rate, host cache-read rate, measured effective
host→device bandwidth, and (round-3) the flow stream: vmapped Farnebäck
fields/s and the TwoStream (on-device flow + 2-trunk forward) device
pipeline rate — the north-star path includes flow (VERDICT r2 item 2).
"""

from __future__ import annotations

import json
import os
import queue
import threading
import time

import numpy as np

BASELINE_CLIPS_PER_SEC_PER_CHIP = 5000.0 / 60.0 / 8.0  # north-star, per chip

NUM_MEMBERS = 4
# Members run as a sequential lax.map (NOT vmap): one member's activations
# at a time quarters peak memory, which both schedules better (+11% at
# B=48) and unlocks larger batches.  Measured on v5e (device pipeline):
# vmap@48 153.3 -> scan@48 169.7 -> scan@96 195.2 -> scan@128 215.2 clips/s.
# B=96 is the shipping default: B=128 is ~10% faster but its XLA compile
# alone takes >20 min through the axon compile helper (no persistent-cache
# reuse with this PJRT plugin — verified again round 3: a cached trivial
# kernel still recompiled for 336 s), which risks the driver's bench
# window.  Since round 3 the e2e number is transfer-bound anyway.
# BENCH_* env overrides exist so tests/test_bench_smoke.py can drive this
# exact file (tiny sizes, CPU) — the driver's run uses the defaults.
BATCH = int(os.environ.get("BENCH_BATCH", "96"))
FRAMES, SIZE, STAGING = 20, 224, 256
CACHE_BATCHES = int(os.environ.get("BENCH_CACHE_BATCHES", "5"))
EPOCHS = int(os.environ.get("BENCH_EPOCHS", "2"))  # measured cache passes
DEVICE_ITERS = int(os.environ.get("BENCH_DEVICE_ITERS", "20"))
AUGMENT_P = 0.75

# flow-stream breakout (north-star includes flow): modest sizes so the
# extra compiles can't threaten the primary headline's bench window
FLOW_PAIRS = 76  # = 4 clips x 19 pairs, vmapped as the train path does
# Flow in 4-clip chunks (80 concurrent pairs — bounds the pyramid
# intermediates; the unchunked 480-pair vmap OOMs at 24.7 GB; 8-clip
# chunks measured 2.4× SLOWER — memory pressure).  v5e progression at
# B=48: 11.46 (nested-vmap flow) → 31.20 (flat-batch flow, shared stem
# staging) → 77.46 (elementwise Farnebäck solver core; compile 169 s).
TWOSTREAM_BATCH = 48
TWOSTREAM_FLOW_CHUNK = 4

# Wire colorspace: "yuv420" ships the mp4's own 4:2:0 representation
# (half the bytes of full-chroma rgb — decisive through the ~0.03 GB/s
# axon tunnel); BENCH_WIRE=rgb keeps the full-chroma ragged wire.
WIRE_COLORSPACE = os.environ.get("BENCH_WIRE", "yuv420")

# Ingest architecture for the headline e2e:
#   "resident" (default): the staged split uploads to device HBM ONCE
#     (i420, the decode-once store's own 4:2:0 layout) and every epoch
#     augments + classifies entirely on device — the TPU-native
#     replacement for the reference's per-epoch decode+feed loop
#     (train.py:257-269), and the architecture that detaches the
#     headline from the axon tunnel's 3x minute-to-minute swings
#     (measured 0.014-0.044 GB/s within one hour, round 3).
#   "wire": every step ships its ragged crop-window wire (the round-3
#     per-step transfer path), kept for per-step-ingest measurement.
INGEST = os.environ.get("BENCH_INGEST", "resident")

# BENCH_FUSE_1X1=1 builds the I3D family with fused block-input 1×1
# convs (models/i3d.py fuse_1x1 — exact rewrite, identical param tree).
# Default OFF: a same-process A/B on the real chip (round 4, B=96
# 4-member ensemble forward) measured bf16 249.9 clips/s unfused vs
# 237.6 fused and static-int8 259.9 vs 241.7 — XLA already keeps the
# block input in registers across the three 1×1 contractions, and the
# fused form's per-branch BN over misaligned channel slices breaks its
# epilogue fusion.  (An earlier "+21%" compared a fused forward-only
# probe against the decode-inclusive device number.)
FUSE_1X1 = os.environ.get("BENCH_FUSE_1X1", "0") == "1"

CACHE_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".bench_cache")


def _scene_frames(rng: np.random.Generator, frames: int, size: int) -> np.ndarray:
    """Synthetic moving scene: smooth textured background, global pan,
    ±3 DN sensor noise — raw camera-ish statistics before encoding."""
    yy, xx = np.mgrid[0:size, 0:size].astype(np.float32)
    f1, f2 = rng.uniform(8, 30, 2)
    ph1, ph2 = rng.uniform(0, 6.28, 2)
    base = (
        128.0
        + 55.0 * np.sin(xx / f1 + ph1)
        + 45.0 * np.cos(yy / f2 + ph2)
        + 20.0 * np.sin((xx + yy) / 13.0)
    )
    dx, dy = rng.uniform(-2.0, 2.0, 2)
    out = np.empty((frames, size, size, 3), np.uint8)
    for t in range(frames):
        sh = np.roll(base, (int(round(t * dy)), int(round(t * dx))), (0, 1))
        for c in range(3):
            noise = rng.integers(-3, 4, (size, size)).astype(np.float32)
            out[t, :, :, c] = np.clip(sh + 8.0 * c + noise, 0, 255).astype(np.uint8)
    return out


def _realistic_clip(rng: np.random.Generator, frames: int, size: int) -> np.ndarray:
    """A clip with REAL decoded-video statistics: the synthetic scene is
    encoded to mp4 (the reference's own mp4v writer convention,
    augment_dataset.py:34-50) and decoded back, so the cache holds exactly
    what a production decode-once store holds — quantized, codec-smoothed
    frames.  (Uniform-random pixels are 8 bits/px of entropy; no decoded
    video looks like that.)  Falls back to the raw scene if cv2 is absent."""
    raw = _scene_frames(rng, frames, size)
    try:
        import tempfile

        from crowded_scenes_ensemble_classification_tpu.data.video_io import (
            decode_clip,
            write_video,
        )

        with tempfile.TemporaryDirectory() as td:
            path = os.path.join(td, "clip.mp4")
            write_video(path, raw)
            decoded = decode_clip(path, frames, (size, size))
        if decoded.shape == raw.shape:
            return decoded
    except Exception:
        pass
    return raw


def _build_caches(n_clips: int):
    """Decode-once stores: 256² staging frames AND their decode-time u8
    eval resize (what the reference's own host preprocessing produces,
    train.py:283-289) — built once, reused across bench runs."""
    from crowded_scenes_ensemble_classification_tpu.data.clip_cache import (
        ClipCacheReader,
        ClipCacheWriter,
    )
    from crowded_scenes_ensemble_classification_tpu.ops.augment import (
        decode_time_eval_resize_u8,
    )

    spath = os.path.join(CACHE_DIR, f"bench4_{n_clips}x{FRAMES}x{STAGING}.ccache")
    epath = os.path.join(CACHE_DIR, f"bench4_{n_clips}x{FRAMES}x{SIZE}_eval.ccache")
    if os.path.exists(spath) and os.path.exists(epath):
        try:
            rs, re = ClipCacheReader(spath), ClipCacheReader(epath)
            if len(rs) == n_clips and len(re) == n_clips:
                return rs, re
            rs.close(), re.close()
        except IOError:
            pass
        for p in (spath, epath):
            if os.path.exists(p):
                os.remove(p)
    rng = np.random.default_rng(0)
    ws, we = ClipCacheWriter(spath), ClipCacheWriter(epath)
    for i in range(n_clips):
        clip = _realistic_clip(rng, FRAMES, STAGING)
        ws.add(str(i), clip, label=i % 11)
        we.add(str(i), decode_time_eval_resize_u8(clip, (SIZE, SIZE)), label=i % 11)
    ws.finish(), we.finish()
    return ClipCacheReader(spath), ClipCacheReader(epath)


def _build_i420_cache(staging_reader, n_clips: int):
    """Decode-once store in the RESIDENT wire layout: each staged clip as
    flat i420 bytes (1.5 B/px — the mp4's own 4:2:0 representation, which
    a production decoder emits natively; the dense-BGR staging store is
    cv2's full-chroma detour).  Halves the per-experiment DISK bytes the
    resident ingest reads: the r4 'upload' was 45 s of 1.89 GB dense-BGR
    reads at ~42 MB/s with ~24 s of async transfers hiding inside
    (tools/perf_probe_ingest*.py), i.e. read-bound, not link-bound."""
    from crowded_scenes_ensemble_classification_tpu.data.clip_cache import (
        ClipCacheReader,
        ClipCacheWriter,
    )
    from crowded_scenes_ensemble_classification_tpu.data.wire_format import (
        bgr_clips_to_i420_batch,
    )

    ipath = os.path.join(
        CACHE_DIR, f"bench5_{n_clips}x{FRAMES}x{STAGING}_i420.ccache"
    )
    if os.path.exists(ipath):
        try:
            ri = ClipCacheReader(ipath)
            if len(ri) == n_clips:
                return ri
            ri.close()
        except IOError:
            pass
        os.remove(ipath)
    wi = ClipCacheWriter(ipath)
    step = 48
    for lo in range(0, n_clips, step):
        idx = np.arange(lo, min(lo + step, n_clips))
        clips, labels = staging_reader.read_batch(idx)
        rows = bgr_clips_to_i420_batch(clips)
        for j, i in enumerate(idx):
            wi.add(str(i), rows[j].reshape(-1, 1, 1, 1), label=int(labels[j]))
    wi.finish()
    return ClipCacheReader(ipath)


def _stream_resident(
    read_rows, n_rows, row_bytes, chunk, batch, steps_per_epoch, epochs,
    step_fn,
):
    """Overlapped resident ingest (VERDICT r4 item 1): reader thread keeps
    disk reads ahead of the link; the main thread streams `chunk`-row
    device_puts into the resident buffer via a DONATED
    dynamic_update_slice, and dispatches every epoch-0 step whose batch
    rows are already resident (device execution is in-order: a step
    dispatched after update k sees exactly chunks 0..k).  Remaining
    epochs run pure on-device.

    `step_fn(resident, step:int, carry) -> carry` must already be
    compiled for the (n_rows, row_bytes) buffer shape (its compile is
    NOT part of the measured window; the updater/sync compiles here,
    also before the clock).  Returns a dict of phase timings plus the
    final resident buffer and carry."""
    import jax
    import jax.numpy as jnp

    update = jax.jit(
        lambda buf, rows, off: jax.lax.dynamic_update_slice(
            buf, rows, (off, 0)
        ),
        donate_argnums=0,
    )
    resident = jnp.zeros((n_rows, row_bytes), jnp.uint8)
    resident = update(
        resident, jnp.zeros((chunk, row_bytes), jnp.uint8), np.int32(0)
    )  # compile
    sync = jax.jit(lambda x: jnp.sum(x[:64].astype(jnp.int32)))
    _ = float(sync(resident[0]))  # compile sync kernel

    rq: "queue.Queue" = queue.Queue(maxsize=4)
    read_busy = [0.0]

    def reader():
        for lo in range(0, n_rows, chunk):
            tr = time.perf_counter()
            rows = read_rows(lo, lo + chunk)
            read_busy[0] += time.perf_counter() - tr
            rq.put(rows)
        rq.put(None)

    carry = jnp.int32(0)
    next_step = 0
    off = 0
    t0 = time.perf_counter()
    th = threading.Thread(target=reader, daemon=True)
    th.start()
    while True:
        rows = rq.get()
        if rows is None:
            break
        resident = update(resident, jax.device_put(rows), np.int32(off))
        off += chunk
        while next_step < steps_per_epoch and off >= (next_step + 1) * batch:
            carry = step_fn(resident, next_step, carry)
            next_step += 1
    _ = float(sync(resident[0]))  # sync upload + epoch-0 chain
    upload_s = time.perf_counter() - t0

    t1 = time.perf_counter()
    for s_i in range(steps_per_epoch, epochs * steps_per_epoch):
        carry = step_fn(resident, s_i, carry)
    float(carry)
    steps_s = time.perf_counter() - t1
    return {
        "upload_s": upload_s,
        "steps_s": steps_s,
        "read_s": read_busy[0],
        "overlapped_steps": next_step,
        "resident": resident,
        "carry": carry,
    }


def _flow_breakouts(results: dict):
    """Flow-stream measurements (VERDICT r2 item 2).  Failures must not
    cost the primary headline — every metric is best-effort."""
    import jax
    import jax.numpy as jnp

    from crowded_scenes_ensemble_classification_tpu.flow.farneback import (
        TURBO_PARAMS,
        farneback_flow_batch,
        farneback_flow_pair,
        rgb_to_gray,
    )

    rng = np.random.default_rng(3)
    yy, xx = np.mgrid[0:SIZE, 0:SIZE].astype(np.float32)
    base = 128 + 60 * np.sin(xx / 17.0) + 50 * np.cos(yy / 23.0)
    prevs = jnp.asarray(
        np.stack([base + rng.integers(-3, 4, (SIZE, SIZE)) for _ in range(FLOW_PAIRS)])
    )
    currs = jnp.asarray(
        np.stack(
            [
                np.roll(base, (1, 2), (0, 1)) + rng.integers(-3, 4, (SIZE, SIZE))
                for _ in range(FLOW_PAIRS)
            ]
        )
    )

    def timed_fields(kw) -> float:
        f = jax.jit(
            lambda a, b: jnp.sum(
                jax.vmap(lambda p, c: farneback_flow_pair(p, c, **kw))(a, b)[
                    ..., 0
                ]
            )
        )
        _ = float(f(prevs, currs))  # compile
        iters = 3
        t0 = time.perf_counter()
        acc = 0.0
        for _i in range(iters):
            acc += float(f(prevs, currs))
        return FLOW_PAIRS * iters / (time.perf_counter() - t0)

    try:
        # reference schedule (5 iterations, all levels) and the EPE-gated
        # turbo schedule (flow/farneback.TURBO_PARAMS)
        results["flow_fields_per_sec"] = round(
            timed_fields(dict(fast_warp=True)), 1
        )
        results["flow_fields_per_sec_turbo"] = round(
            timed_fields(TURBO_PARAMS), 1
        )
    except Exception:
        pass

    # TwoStream device pipeline: staged gray pairs -> on-device Farnebäck
    # -> RGB+flow trunks x members -> fusion (train/engine.py:80-85 path)
    try:
        from crowded_scenes_ensemble_classification_tpu.ensemble.members import (
            stack_variables,
        )
        from crowded_scenes_ensemble_classification_tpu.models import build_model
        from crowded_scenes_ensemble_classification_tpu.models.common import (
            s2d_stem_stage,
        )

        bundle = build_model(
            "TWOSTREAM_I3D", num_classes=11, dtype=jnp.bfloat16,
            fuse_1x1=FUSE_1X1,
        )
        ts_prestaged = bundle.module.clone(stem_prestaged=True)
        keys = jax.random.split(jax.random.key(5), NUM_MEMBERS)
        b, t = TWOSTREAM_BATCH, FRAMES
        rgb_d = jnp.zeros((1, t, SIZE, SIZE, 3), jnp.bfloat16)
        flow_d = jnp.zeros((1, t, SIZE, SIZE, 2), jnp.bfloat16)
        stacked = stack_variables(
            [bundle.module.init(k, rgb_d, flow_d, train=False) for k in keys]
        )
        rgb = jnp.asarray(
            np.stack(
                [_realistic_clip(rng, t, SIZE) for _ in range(b)]
            ).astype(np.float32)
        )

        ch = TWOSTREAM_FLOW_CHUNK if b % TWOSTREAM_FLOW_CHUNK == 0 else 1

        @jax.jit
        def ts_pipeline(stacked_vars, rgb_f32, carry):
            gray = rgb_to_gray(rgb_f32)
            # T flow fields per clip — the engine's (gray, gray_next)
            # pair convention (train/engine._preprocess); the wrap pair
            # keeps the billing at exactly T fields/clip.  chunk_pairs
            # bounds the pyramid intermediates (the full B·T vmap OOMs
            # beyond ~10 clips — 24.7 GB at B=24); the library helper
            # does the flat-batch + lax.map chunking the pipelines use.
            gray_next = jnp.roll(gray, -1, axis=1)
            flows = farneback_flow_batch(
                gray, gray_next, chunk_pairs=ch * t, **TURBO_PARAMS
            )
            # both trunks' s2d stem stagings computed once, shared by all
            # members (models.common.s2d_stem_stage)
            xs_rgb = s2d_stem_stage(rgb_f32.astype(jnp.bfloat16))
            xs_flow = s2d_stem_stage(flows.astype(jnp.bfloat16))

            def member(v):
                logits = ts_prestaged.apply(v, xs_rgb, xs_flow, train=False)
                return jax.nn.softmax(logits, axis=-1)

            probs = jax.lax.map(member, stacked_vars)
            fused = jnp.einsum("mbc->bc", probs)
            return carry + jnp.sum(jnp.argmax(fused, -1))

        carry = jnp.int32(0)
        carry = ts_pipeline(stacked, rgb, carry)  # compile
        _ = float(carry)
        iters = 4
        carry = jnp.int32(0)
        t0 = time.perf_counter()
        for _i in range(iters):
            carry = ts_pipeline(stacked, rgb, carry)
        _ = float(carry)
        results["twostream_clips_per_sec"] = round(
            b * iters / (time.perf_counter() - t0), 2
        )
    except Exception:
        pass


def _resident_breakout(results: dict, staging_reader):
    """Opt-in (BENCH_RESIDENT=1): HBM-resident I3D TRAINING steady-state
    rate — the split's staged clips upload once, epochs gather batches on
    device (train.engine.make_resident_train_step), host ships int32
    indices only.  Off by default: the I3D fwd+bwd compile through the
    axon helper would risk the driver's bench window."""
    import jax
    import jax.numpy as jnp

    from crowded_scenes_ensemble_classification_tpu.data.resident import (
        ResidentClips,
    )
    from crowded_scenes_ensemble_classification_tpu.models import build_model
    from crowded_scenes_ensemble_classification_tpu.train import (
        TrainState,
        make_optimizer,
        make_resident_train_step,
    )

    b = int(os.environ.get("BENCH_RESIDENT_BATCH", "32"))
    n = min(5 * b, len(staging_reader))
    rgb, labels = staging_reader.read_batch(np.arange(n))
    t0 = time.perf_counter()
    rc = ResidentClips({"rgb": rgb}, labels, batch_size=b, seed=0)
    _ = float(jnp.sum(rc.resident["label"].astype(jnp.int32)))  # sync upload
    upload_s = time.perf_counter() - t0

    bundle = build_model("I3D", num_classes=11, dtype=jnp.bfloat16)
    tx = make_optimizer("I3D", 0.003)
    step = make_resident_train_step(
        bundle, tx, (SIZE, SIZE), augment=True, input_scale=1.0
    )
    state = TrainState.create(
        bundle.init(jax.random.key(0), batch_size=1), tx, jax.random.key(1)
    )
    cw = jnp.ones((11,), jnp.float32)
    state, m = step(state, next(iter(rc.batches(0))), cw)
    _ = float(m["loss"])  # compile + sync

    t0 = time.perf_counter()
    n_steps = 0
    for e in range(2):
        for batch in rc.batches(e):
            state, m = step(state, batch, cw)
            n_steps += 1
    _ = float(m["loss"])  # chain-sync
    results["resident_train_clips_per_sec"] = round(
        b * n_steps / (time.perf_counter() - t0), 2
    )
    results["resident_upload_s"] = round(upload_s, 1)


def _hetero_breakout(results: dict):
    """BASELINE config #5: the global heterogeneous ensemble — 16 members
    (C3D + I3D + TwoStream-I3D + R3D-18, 4 members each) classify the SAME
    clips and SUM-fuse on device (reference global_evaluate_ensembles,
    evaluate_ensemble.py:1329-1474, launched at :1455).  Device-pipeline
    rate: all four family forwards (incl. on-device Farnebäck for the
    TwoStream flow stream) + fusion in ONE executable.  Each family sees
    its own clip geometry derived on device from one 224² source (C3D/R3D
    subsample to 16×112² the way their pipelines stage clips)."""
    import jax
    import jax.numpy as jnp

    from crowded_scenes_ensemble_classification_tpu.ensemble.members import (
        stack_variables,
    )
    from crowded_scenes_ensemble_classification_tpu.flow.farneback import (
        TURBO_PARAMS,
        farneback_flow_batch,
        rgb_to_gray,
    )
    from crowded_scenes_ensemble_classification_tpu.models import build_model
    from crowded_scenes_ensemble_classification_tpu.models.common import (
        s2d_stem_stage,
    )

    # batch from the round-5 on-chip sweep: 41.79 / 45.82 / 48.58 clips/s
    # at B=16/32/64 — the 16-member lax.map keeps only one member's
    # intermediates live, so the larger batch amortizes per-member
    # dispatch and fills the MXU without memory pressure
    b = int(os.environ.get("BENCH_HETERO_BATCH", "64"))
    m = NUM_MEMBERS

    def family(mt):
        kw = {"fuse_1x1": FUSE_1X1} if mt.endswith("I3D") else {}
        bundle = build_model(mt, num_classes=11, dtype=jnp.bfloat16, **kw)
        v = bundle.init(jax.random.key(sum(map(ord, mt))), batch_size=1)
        # replicate one init across members — weight VALUES don't change
        # the rate, and one init compile per family instead of four keeps
        # the section inside the bench budget
        return bundle, stack_variables([v] * m)

    c3d_b, c3d_sv = family("C3D")
    i3d_b, i3d_sv = family("I3D")
    ts_b, ts_sv = family("TWOSTREAM_I3D")
    r3d_b, r3d_sv = family("R3D_18")
    i3d_pre = i3d_b.module.clone(stem_prestaged=True)
    ts_pre = ts_b.module.clone(stem_prestaged=True)

    @jax.jit
    def hetero_step(c3d_v, i3d_v, ts_v, r3d_v, rgb224, carry):
        x224 = rgb224.astype(jnp.bfloat16)
        xs = s2d_stem_stage(x224)  # shared by I3D AND the TS rgb trunk
        gray = rgb_to_gray(rgb224)
        flows = farneback_flow_batch(
            gray, jnp.roll(gray, -1, axis=1),
            chunk_pairs=TWOSTREAM_FLOW_CHUNK * FRAMES, **TURBO_PARAMS,
        )
        xs_flow = s2d_stem_stage(flows.astype(jnp.bfloat16))
        # C3D/R3D geometry: 16 frames, 112² decode-time resize ≈ 2×2
        # subsample of the 224² staging (their pipelines stage at the
        # model's own hw; content-equivalent for a rate measurement)
        rgb112 = rgb224[:, :16, ::2, ::2, :].astype(jnp.bfloat16)

        probs = jnp.concatenate(
            [
                jax.lax.map(
                    lambda v: jax.nn.softmax(
                        i3d_pre.apply(v, xs, train=False), -1
                    ),
                    i3d_v,
                ),
                jax.lax.map(
                    lambda v: jax.nn.softmax(
                        ts_pre.apply(v, xs, xs_flow, train=False), -1
                    ),
                    ts_v,
                ),
                jax.lax.map(
                    lambda v: jax.nn.softmax(
                        c3d_b.module.apply(v, rgb112, train=False), -1
                    ),
                    c3d_v,
                ),
                jax.lax.map(
                    lambda v: jax.nn.softmax(
                        r3d_b.module.apply(v, rgb112, train=False), -1
                    ),
                    r3d_v,
                ),
            ],
            axis=0,
        )  # (16, B, C)
        fused = jnp.einsum("mbc->bc", probs)  # SUM over ALL member models
        return carry + jnp.sum(jnp.argmax(fused, -1))

    rgb224 = jax.jit(
        lambda k: jax.random.uniform(
            k, (b, FRAMES, SIZE, SIZE, 3), jnp.float32, 0.0, 255.0
        )
    )(jax.random.key(7))
    carry = hetero_step(c3d_sv, i3d_sv, ts_sv, r3d_sv, rgb224, jnp.int32(0))
    _ = float(carry)  # compile + sync
    iters = int(os.environ.get("BENCH_HETERO_ITERS", "6"))
    carry = jnp.int32(0)
    t0 = time.perf_counter()
    for _i in range(iters):
        carry = hetero_step(c3d_sv, i3d_sv, ts_sv, r3d_sv, rgb224, carry)
    _ = float(carry)
    results["hetero_ensemble_clips_per_sec"] = round(
        b * iters / (time.perf_counter() - t0), 2
    )


def _train_rates_breakout(results: dict):
    """Per-family TRAINING throughput (VERDICT r3 weak-4): steady-state
    resident train-step rate for each architecture at its own clip
    geometry — the number that sizes the reference's 20-Slurm-day
    training runs (train.py:1978-2051) on TPU.  HBM-resident ingest
    (upload once, gather on device) so the rate is the device fwd+bwd,
    not the relay tunnel."""
    import jax
    import jax.numpy as jnp

    from crowded_scenes_ensemble_classification_tpu.data.resident import (
        ResidentClips,
    )
    from crowded_scenes_ensemble_classification_tpu.models import build_model
    from crowded_scenes_ensemble_classification_tpu.train import (
        TrainState,
        make_optimizer,
        make_resident_train_step,
    )

    rng = np.random.default_rng(9)
    fams = [
        ("c3d", "C3D", int(os.environ.get("BENCH_TRAIN_BATCH_C3D", "32"))),
        # I3D batch from the round-5 probe sweep (tools/perf_probe_train.py):
        # 142.7/166.3/171.1/178.9/174.2 clips/s at B=16/32/48/64/96 —
        # B=64 is the measured sweet spot (remat loses at every batch)
        ("i3d", "I3D", int(os.environ.get("BENCH_TRAIN_BATCH_I3D", "64"))),
        (
            "twostream",
            "TWOSTREAM_I3D",
            # B=16 measured 59.9 clips/s vs 49.1 at B=8 (round-3 on-chip
            # flow-inclusive train probe, NEXT.md)
            int(os.environ.get("BENCH_TRAIN_BATCH_TS", "16")),
        ),
        ("r3d18", "R3D_18", int(os.environ.get("BENCH_TRAIN_BATCH_R3D", "32"))),
    ]
    deadline = results.get("_deadline")
    for name, mt, b in fams:
        if deadline is not None and time.monotonic() > deadline:
            results[f"train_clips_per_sec_{name}_skipped"] = "budget"
            continue
        try:
            bundle = build_model(mt, num_classes=11, dtype=jnp.bfloat16)
            hw = (bundle.clip.height, bundle.clip.width)
            t = bundle.clip.frames
            n = 2 * b
            stage = (hw[0] + 32, hw[1] + 32)  # staging slack for the crop
            arrays = {
                "rgb": rng.integers(
                    0, 255, (n, t, stage[0], stage[1], 3), np.uint8
                )
            }
            if bundle.two_stream:
                # staged gray pairs carry a trailing channel dim, the
                # pipeline's staging convention (data.video_io; engine
                # _preprocess reads gray4[..., 0])
                gray = arrays["rgb"].mean(-1, keepdims=True).astype(np.float32)
                arrays["gray"] = gray
                arrays["gray_next"] = np.roll(gray, -1, axis=1)
            labels = rng.integers(0, 11, n)
            rc = ResidentClips(arrays, labels, batch_size=b, seed=0)
            _ = float(jnp.sum(rc.resident["label"].astype(jnp.int32)))

            tx = make_optimizer(mt, 0.003)
            # TwoStream trains with the production turbo schedule
            # (`train --flow-schedule turbo`; EPE-gated vs 'full') — the
            # full 5-iteration schedule at 256² staging would make the
            # rate a flow benchmark, not a train benchmark
            fp = None
            if bundle.two_stream:
                from crowded_scenes_ensemble_classification_tpu.flow.farneback import (
                    flow_schedule_params,
                )

                fp = flow_schedule_params("turbo")
                results["train_twostream_flow_schedule"] = "turbo"
            step = make_resident_train_step(
                bundle, tx, hw, augment=True, input_scale=1.0, flow_params=fp
            )
            state = TrainState.create(
                bundle.init(jax.random.key(0), batch_size=1), tx, jax.random.key(1)
            )
            cw = jnp.ones((11,), jnp.float32)
            state, mtr = step(state, next(iter(rc.batches(0))), cw)
            _ = float(mtr["loss"])  # compile + sync

            n_steps = 0
            t0 = time.perf_counter()
            for e in range(3):
                for batch in rc.batches(e + 1):
                    state, mtr = step(state, batch, cw)
                    n_steps += 1
            _ = float(mtr["loss"])  # chain-sync
            results[f"train_clips_per_sec_{name}"] = round(
                b * n_steps / (time.perf_counter() - t0), 2
            )
        except Exception as e:  # one family failing must not kill the rest
            results[f"train_clips_per_sec_{name}_error"] = (
                f"{type(e).__name__}: {e}"
            )[:200]


_BENCH_T0 = time.monotonic()  # reset at main() entry; budget anchor

_PROGRESS: list = []


def _mark(stage: str) -> None:
    """Record stage completion for the watchdog's diagnostic line — a
    killed run then says WHERE it was stuck (cache build vs compile vs
    measure vs breakouts), which is the difference between 'relay dead'
    and 'budget too small for this stage'."""
    _PROGRESS.append(f"{stage}@{time.strftime('%H:%M:%S')}")


def _serving_breakout(results: dict, eval_reader):
    """Default section since round 5 (VERDICT r4 item 7): throughput of
    the exported StableHLO serving artifact (serving.export,
    bake_params=False so the module stays lean through the compile relay)
    — 4-member I3D ensemble, u8 eval-resolution clips in, fused probs
    out.  Proves the deployment artifact runs at pipeline speed (done =
    serving_clips_per_sec within ~5% of the jit path)."""
    import jax
    import jax.numpy as jnp

    from crowded_scenes_ensemble_classification_tpu.core.config import ClipSpec
    from crowded_scenes_ensemble_classification_tpu.ensemble.members import (
        stack_variables,
    )
    from crowded_scenes_ensemble_classification_tpu.models import build_model
    from crowded_scenes_ensemble_classification_tpu.serving import (
        export_ensemble,
        serving_batch_example,
    )

    # Serve at the pipeline's batch with the pipeline's graph: the
    # artifact shares the s2d stem staging across members exactly like
    # member_probabilities does (an unshared export pays 4 stem
    # stagings — measured ~35% of serving throughput at B=32 in the
    # first round-5 run), and the in-section jit reference times the
    # IDENTICAL make_member_forward graph compiled directly so
    # serving_vs_jit states the artifact's true overhead at equal
    # batch/graph.
    b = int(os.environ.get("BENCH_SERVING_BATCH", str(BATCH)))
    b = min(b, len(eval_reader))
    bundle = build_model(
        "I3D", num_classes=11, dtype=jnp.bfloat16, fuse_1x1=FUSE_1X1
    )
    assert (bundle.clip.frames, bundle.clip.height) == (FRAMES, SIZE), (
        ClipSpec,
        bundle.clip,
    )
    variables = [
        bundle.init(jax.random.key(i), batch_size=1) for i in range(NUM_MEMBERS)
    ]
    example = serving_batch_example(bundle, b)
    blob = export_ensemble(
        bundle, variables, example, input_scale=1.0, bake_params=False,
        platforms=(jax.default_backend(),), share_stem_staging=True,
    )
    results["serving_artifact_mb"] = round(len(blob) / 1e6, 2)
    exp = jax.export.deserialize(blob)
    stacked = jax.device_put(stack_variables(variables))

    n = min(4 * b, len(eval_reader))
    clips, _labels = eval_reader.read_batch(np.arange(n))
    batches = [
        jax.device_put({"rgb": clips[i : i + b]}) for i in range(0, n - b + 1, b)
    ]

    def timed(call) -> float:
        _ = float(jnp.sum(call(batches[0])["fused"]))  # compile
        t0 = time.perf_counter()
        acc = jnp.float32(0)
        iters = 3
        for _i in range(iters):
            for bt in batches:
                acc = acc + jnp.sum(call(bt)["fused"])
        _ = float(acc)  # chain-sync
        return b * len(batches) * iters / (time.perf_counter() - t0)

    serving_cps = timed(lambda bt: exp.call(stacked, bt))
    results["serving_clips_per_sec"] = round(serving_cps, 2)

    from crowded_scenes_ensemble_classification_tpu.ensemble.members import (
        make_member_forward,
    )

    fwd = make_member_forward(
        bundle, (SIZE, SIZE), share_stem_staging=True, input_scale=1.0
    )

    @jax.jit
    def jit_ref(sv, batch):
        probs = fwd(sv, batch)
        return {"fused": jnp.einsum("mbc->bc", probs)}

    jit_cps = timed(lambda bt: jit_ref(stacked, bt))
    results["serving_jit_ref_clips_per_sec"] = round(jit_cps, 2)
    results["serving_vs_jit"] = round(serving_cps / jit_cps, 3)


def _arm_global_watchdog(finished: threading.Event):
    """If the device (axon relay) hangs, every float(carry) fetch blocks
    forever and the driver would record NO bench line at all.  After the
    budget, print a diagnostic JSON line and hard-exit so the failure mode
    is 'value 0 with an error field', never silence."""
    budget = float(os.environ.get("BENCH_GLOBAL_TIMEOUT_S", "7200"))

    def _watch():
        if finished.wait(timeout=budget):
            return
        import sys

        print(
            json.dumps(
                {
                    "metric": "e2e_ensemble_inference_clips_per_sec_per_chip",
                    "value": 0.0,
                    "unit": "clips/s decode-inclusive",
                    "vs_baseline": 0.0,
                    "error": (
                        f"global watchdog: device unresponsive for {budget:.0f}s "
                        "(axon relay hang?) — no measurement completed"
                    ),
                    "progress": _PROGRESS[-8:],
                }
            )
        )
        sys.stdout.flush()
        os._exit(1)

    threading.Thread(target=_watch, daemon=True).start()


def main():
    import jax

    global _BENCH_T0
    _BENCH_T0 = time.monotonic()
    finished = threading.Event()
    _arm_global_watchdog(finished)
    if os.environ.get("BENCH_CRASH_TEST") == "1":  # test hook (driver
        raise RuntimeError("crash-test hook")  # contract smoke)

    if os.environ.get("BENCH_FORCE_CPU") == "1":
        # smoke-test mode (tests/test_bench_smoke.py): the sitecustomize
        # force-registers the axon TPU backend, so the platform must be
        # pinned from inside the process — JAX_PLATFORMS alone is not
        # honoured once the plugin is registered.
        jax.config.update("jax_platforms", "cpu")

    # NOTE: deliberately NO persistent compile cache.  Diagnosed round 3:
    # the axon PJRT plugin does not reuse cached TPU executables across
    # processes (a trivial cached kernel recompiled for 336 s), and the
    # cache dir accumulates CPU AOT entries compiled on the REMOTE helper
    # machine whose CPU features differ from this host — loading them
    # warns "could lead to execution errors such as SIGILL".  A cache
    # that cannot hit and can crash the bench is strictly worse than a
    # cold compile.
    if os.environ.get("JAX_COMPILATION_CACHE_DIR"):
        try:
            jax.config.update(
                "jax_compilation_cache_dir",
                os.environ["JAX_COMPILATION_CACHE_DIR"],
            )
        except Exception:
            pass
    import jax.numpy as jnp

    from crowded_scenes_ensemble_classification_tpu.ensemble.members import (
        stack_variables,
    )
    from crowded_scenes_ensemble_classification_tpu.models import build_model
    from crowded_scenes_ensemble_classification_tpu.ops.augment import (
        crowd11_augment_windowed_batch,
    )

    from crowded_scenes_ensemble_classification_tpu.models.common import (
        s2d_stem_stage,
    )

    bundle = build_model(
        "I3D", num_classes=11, dtype=jnp.bfloat16, fuse_1x1=FUSE_1X1
    )
    keys = jax.random.split(jax.random.key(0), NUM_MEMBERS)
    dummy = jnp.zeros((1, FRAMES, SIZE, SIZE, 3), jnp.bfloat16)
    stacked = stack_variables(
        [bundle.module.init(k, dummy, train=False) for k in keys]
    )
    # The stem's s2d staging is computed ONCE per batch and shared by all
    # members (models.common.s2d_stem_stage: 4-member stem 92.6 ms vs
    # 111.2 canonical at B=48 on v5e) — parameter trees are unchanged.
    prestaged = bundle.module.clone(stem_prestaged=True)

    from crowded_scenes_ensemble_classification_tpu.data.wire_format import (
        make_wire_unpack,
        pack_ragged_windows,
        plan_wire_steps,
    )

    n_clips = CACHE_BATCHES * BATCH
    _mark("model_init")
    staging_reader, eval_reader = _build_caches(n_clips)
    _mark("caches_ready")
    key = jax.random.key(1)

    if INGEST == "wire":
        # ---- RAGGED wire format (data.wire_format) -------------------------
        # Each clip ships exactly the bytes its (key-derived) decision needs;
        # the wire buffer is statically sized to the exact max over the
        # bench's key-determined steps — one executable, no padding waste, no
        # reliance on transport compression.
        total_steps = EPOCHS * CACHE_BATCHES
        plan = plan_wire_steps(
            key, total_steps, BATCH, FRAMES, (STAGING, STAGING), (SIZE, SIZE),
            p=AUGMENT_P, colorspace=WIRE_COLORSPACE,
        )
        CAP = plan.cap
        unpack_fn = make_wire_unpack(plan)

        @jax.jit
        def pipeline(stacked_vars, wire_u8, offsets, key, step, carry):
            # fold the step INSIDE the jit region: an eager fold_in would be a
            # per-step accelerator round trip through the relay
            step_key = jax.random.fold_in(key, step)
            buf = unpack_fn(wire_u8, offsets, step_key)
            x = crowd11_augment_windowed_batch(
                buf.astype(jnp.float32),
                step_key,
                (SIZE, SIZE),
                (STAGING, STAGING),
                p=AUGMENT_P,
            )
            x = x.astype(jnp.bfloat16)  # cast once, shared by all members
            xs = s2d_stem_stage(x)  # stem staging once, shared by all members

            def member(v):
                logits = prestaged.apply(v, xs, train=False)
                return jax.nn.softmax(logits, axis=-1)

            probs = jax.lax.map(member, stacked_vars)  # (M, B, C), sequential
            fused = jnp.einsum("mbc->bc", probs)  # SUM-weight fusion
            preds = jnp.argmax(fused, axis=-1)
            # checksum chains iterations so one scalar fetch syncs them all
            # (block_until_ready is unreliable through the axon relay).
            return carry + jnp.sum(preds)

        def read_and_pack(step: int, batch_index: int):
            """Cache read + ragged wire packing — pure host indexing.  Each
            clip is read from only the cache its decision needs: cropped clips
            from the staging store, uncropped from the decode-time eval store."""
            idx = np.arange(batch_index * BATCH, (batch_index + 1) * BATCH)
            do_crop, _y0, _x0, _off = plan.steps[step % total_steps]
            crop_pos = np.nonzero(do_crop)[0]
            full_pos = np.nonzero(~do_crop)[0]
            staging = (
                staging_reader.read_batch(idx[crop_pos])[0]
                if len(crop_pos)
                else np.zeros((0, FRAMES, STAGING, STAGING, 3), np.uint8)
            )
            eval_u8 = (
                eval_reader.read_batch(idx[full_pos])[0]
                if len(full_pos)
                else np.zeros((0, FRAMES, SIZE, SIZE, 3), np.uint8)
            )
            return pack_ragged_windows(plan, step % total_steps, staging, eval_u8)

        # Warmup / compile on the first packed batch.
        first, first_off = read_and_pack(0, 0)
        staged = jax.device_put(first)
        staged_off = jax.device_put(first_off)
        float(pipeline(stacked, staged, staged_off, key, jnp.uint32(0), jnp.int32(0)))
        _mark("pipeline_compiled")

        # ---- host pipeline rate (threaded C++ pread + pack, steady-state) ---
        for b in range(CACHE_BATCHES):
            read_and_pack(b, b)  # warm page cache
        t0 = time.perf_counter()
        for b in range(CACHE_BATCHES):
            read_and_pack(b, b)
        host_read_cps = n_clips / (time.perf_counter() - t0)
        _mark("host_read_measured")

        # ---- effective host→device bandwidth on a real packed buffer -------
        sync = jax.jit(lambda x: jnp.sum(x[:64].astype(jnp.int32)))
        _ = float(sync(jax.device_put(first)))  # compile sync kernel
        t0 = time.perf_counter()
        x = jax.device_put(first)
        _ = float(sync(x))
        h2d_gbps = first.nbytes / (time.perf_counter() - t0) / 1e9

        # ---- device-only pipeline rate (data resident) ----------------------
        # (step 0's wire layout reused; the step index still varies so every
        # dispatch is a distinct execution)
        iters = DEVICE_ITERS
        carry = jnp.int32(0)
        t0 = time.perf_counter()
        for _i in range(iters):
            carry = pipeline(stacked, staged, staged_off, key, jnp.uint32(0), carry)
        float(carry)
        device_cps = BATCH * iters / (time.perf_counter() - t0)
        _mark("device_pipeline_measured")

        # ---- END-TO-END: feeder thread (read → pack → device_put) → step ----
        # device_put happens IN the feeder so the wire transfer overlaps the
        # device compute of the previous batch (VERDICT r2 weak-1).
        q: "queue.Queue" = queue.Queue(maxsize=3)

        def feeder():
            step = 0
            for _e in range(EPOCHS):
                for b in range(CACHE_BATCHES):
                    wire, offsets = read_and_pack(step, b)
                    q.put((step, jax.device_put(wire), jax.device_put(offsets)))
                    step += 1
            q.put(None)

        t = threading.Thread(target=feeder, daemon=True)
        carry = jnp.int32(0)
        n_steps = 0
        t0 = time.perf_counter()
        t.start()
        while True:
            item = q.get()
            if item is None:
                break
            step, wire_b, off_b = item
            carry = pipeline(stacked, wire_b, off_b, key, jnp.uint32(step), carry)
            n_steps += 1
        float(carry)
        e2e_cps = BATCH * n_steps / (time.perf_counter() - t0)
        _mark("e2e_measured")

        unit_str = (
            "clips/s decode-inclusive (cache read + window pack + h2d "
            "overlapped + device windowed augment + 4-member I3D bf16 + "
            "fusion)"
        )
        wire_mb_per_clip = first.nbytes / BATCH / 1e6
        h2d_bound_cps = h2d_gbps * 1e9 / (first.nbytes / BATCH)
        ingest_fields = {"wire_colorspace": WIRE_COLORSPACE}

    else:
        # ---- RESIDENT ingest (data.resident architecture) ---------------
        # The decode-once store's staged clips upload to HBM ONCE as i420
        # (1.5 B/px, the mp4's own 4:2:0 layout); every epoch derives fresh
        # augment decisions from fold-in keys and runs i420→BGR + the full
        # crop/resize/flip/noise policy on device from the resident
        # staging buffer (ops.augment.crowd11_augment_batch — the
        # cv2-oracle-tested full path).  The link is paid once per clip
        # per experiment, not once per clip per epoch.
        #
        # The resident buffer stays FLAT (n_clips, ibytes) on device: a
        # dense (N, T, 256, 256, 3) u8 array pays a 42.7× TPU layout
        # padding (its 3-wide lane dim tiles to 128 — a 1.9 GB split asked
        # for 80 GB on v5e); the flat 2D layout pads nothing, and the
        # per-batch slice is decoded/reshaped INSIDE the jit region where
        # XLA lays intermediates out per-consumer (same pattern as the
        # ragged-wire unpack, proven at B=96 on chip).
        #
        # Round-5 ingest engineering (VERDICT r4 item 1): the r4 "upload"
        # (49.6 s) was NOT the link — it was 1.89 GB of dense-BGR cache
        # reads at ~42 MB/s plus a 1-core per-clip cv2 i420 pack
        # (33-46 s), with the actual transfers hiding inside
        # (tools/perf_probe_ingest*.py).  Three fixes, each measured:
        # (a) the decode-once store itself holds i420 rows
        #     (_build_i420_cache) — half the disk bytes, zero per-run
        #     cv2 pack work;
        # (b) the upload streams in CHUNK-clip device_puts — 24-48-clip
        #     chunks sustain ~0.040 GB/s through the relay where one
        #     giant put collapses to 0.024 (probe rows A/E), with a
        #     reader thread keeping disk reads ahead of the link;
        # (c) every uploaded chunk lands in the resident buffer via a
        #     donated dynamic_update_slice, so epoch-0 batches start
        #     computing WHILE later chunks are still in flight (device
        #     execution is in-order: a step dispatched after update k
        #     sees exactly chunks 0..k resident).
        from crowded_scenes_ensemble_classification_tpu.data.wire_format import (
            i420_to_bgr_u8,
        )
        from crowded_scenes_ensemble_classification_tpu.ops.augment import (
            crowd11_augment_batch,
        )

        ibytes = FRAMES * STAGING * STAGING * 3 // 2
        i420_reader = _build_i420_cache(staging_reader, n_clips)
        _mark("i420_cache_ready")

        # put-chunk rows: the largest divisor of BATCH that keeps chunks
        # near the measured ~24-clip sweet spot (must divide BATCH so the
        # epoch-0 ready-prefix check lands on batch boundaries; BATCH
        # divides n_clips already)
        n_sub = max(1, round(BATCH / 24))
        while BATCH % n_sub:
            n_sub -= 1
        CHUNK = BATCH // n_sub

        def read_rows(lo: int, hi: int) -> np.ndarray:
            rows = i420_reader.read_batch(np.arange(lo, hi))[0]
            return rows.reshape(hi - lo, ibytes)

        @jax.jit
        def pipeline(stacked_vars, resident_i420, key, step, carry):
            step_key = jax.random.fold_in(key, step)
            start = (step % jnp.uint32(CACHE_BATCHES)) * jnp.uint32(BATCH)
            rows = jax.lax.dynamic_slice_in_dim(resident_i420, start, BATCH, 0)
            batch = jax.vmap(
                lambda f: i420_to_bgr_u8(f, FRAMES, STAGING, STAGING)
            )(rows)
            x = crowd11_augment_batch(
                batch.astype(jnp.float32), step_key, (SIZE, SIZE), p=AUGMENT_P
            )
            x = x.astype(jnp.bfloat16)  # cast once, shared by all members
            xs = s2d_stem_stage(x)  # stem staging once, shared by all members

            def member(v):
                logits = prestaged.apply(v, xs, train=False)
                return jax.nn.softmax(logits, axis=-1)

            probs = jax.lax.map(member, stacked_vars)  # (M, B, C), sequential
            fused = jnp.einsum("mbc->bc", probs)  # SUM-weight fusion
            preds = jnp.argmax(fused, axis=-1)
            return carry + jnp.sum(preds)

        # Warmup / compile on a device-allocated dummy (no wire traffic).
        first = read_rows(0, CHUNK)
        dummy = jnp.zeros((n_clips, ibytes), jnp.uint8)
        float(pipeline(stacked, dummy, key, jnp.uint32(0), jnp.int32(0)))
        del dummy
        sync = jax.jit(lambda x: jnp.sum(x[:64].astype(jnp.int32)))
        _ = float(sync(jnp.zeros(64, jnp.uint8)))  # compile sync kernel
        _mark("pipeline_compiled")

        # ---- host read rate (threaded C++ pread of i420 rows) -----------
        for b in range(CACHE_BATCHES):
            read_rows(b * BATCH, (b + 1) * BATCH)  # warm page cache
        t0 = time.perf_counter()
        for b in range(CACHE_BATCHES):
            read_rows(b * BATCH, (b + 1) * BATCH)
        host_read_cps = n_clips / (time.perf_counter() - t0)
        _mark("host_read_measured")

        # ---- effective host→device bandwidth on one real i420 chunk -----
        t0 = time.perf_counter()
        x = jax.device_put(first)
        _ = float(sync(x))
        h2d_gbps = first.nbytes / (time.perf_counter() - t0) / 1e9
        del x

        # ---- END-TO-END: overlapped upload + epoch-0 compute, then the -
        # remaining epochs pure on-device (_stream_resident).
        run = _stream_resident(
            read_rows, n_clips, ibytes, CHUNK, BATCH, CACHE_BATCHES, EPOCHS,
            lambda res, s, c: pipeline(stacked, res, key, jnp.uint32(s), c),
        )
        upload_s, steps_s = run["upload_s"], run["steps_s"]
        total_steps = EPOCHS * CACHE_BATCHES
        n_steps = total_steps
        e2e_cps = BATCH * total_steps / (upload_s + steps_s)
        if EPOCHS > 1:
            # steady state (post-upload epochs) IS the pure device rate:
            # the resident architecture's per-epoch cost once the link
            # has been paid
            device_cps = BATCH * (EPOCHS - 1) * CACHE_BATCHES / steps_s
        else:
            iters = max(1, DEVICE_ITERS)
            carry = run["carry"]
            t2 = time.perf_counter()
            for s_i in range(iters):
                carry = pipeline(
                    stacked, run["resident"], key, jnp.uint32(s_i), carry
                )
            float(carry)
            device_cps = BATCH * iters / (time.perf_counter() - t2)
        _mark("e2e_measured")

        unit_str = (
            "clips/s decode-inclusive (i420 decode-once store read + "
            "chunked resident upload overlapped with epoch-0 on-device "
            "augment/4-member I3D bf16/fusion; remaining epochs fully "
            f"on device; {EPOCHS} epochs over the split)"
        )
        wire_mb_per_clip = ibytes / 1e6
        # value if device compute were free: the link amortized over epochs
        h2d_bound_cps = h2d_gbps * 1e9 * EPOCHS / ibytes
        ingest_fields = {
            "ingest": "resident",
            "resident_upload_s": round(upload_s, 1),
            "resident_gb": round(n_clips * ibytes / 1e9, 2),
            "upload_eff_gbps": round(n_clips * ibytes / 1e9 / max(upload_s, 1e-9), 4),
            "ingest_read_s": round(run["read_s"], 1),
            "epoch0_overlapped_steps": run["overlapped_steps"],
            "e2e_epochs": EPOCHS,
            "e2e_steady_state_clips_per_sec": (
                round(BATCH * (EPOCHS - 1) * CACHE_BATCHES / steps_s, 2)
                if EPOCHS > 1
                else None
            ),
        }


    def _round(x: float, nd: int = 2) -> float:
        # never round a real-but-small measurement to 0 (the CPU smoke
        # test runs this file at tiny sizes where rates are < 0.005)
        return round(x, nd) if abs(x) >= 10 ** (1 - nd) else round(x, 6)

    results = {
        "metric": "e2e_ensemble_inference_clips_per_sec_per_chip",
        "value": _round(e2e_cps),
        "unit": unit_str,
        "vs_baseline": _round(e2e_cps / BASELINE_CLIPS_PER_SEC_PER_CHIP),
        "device_pipeline_clips_per_sec": _round(device_cps),
        "host_read_clips_per_sec": _round(host_read_cps),
        "h2d_gbps": _round(h2d_gbps, 3),
        # diagnosis aids: raw wire bytes per clip and the rate the link
        # alone would sustain — if `value` ≈ this, the run is link-bound
        # (axon relay tunnel), not framework-bound.
        "wire_colorspace": WIRE_COLORSPACE,
        "wire_mb_per_clip": round(wire_mb_per_clip, 2),
        "h2d_bound_clips_per_sec": round(h2d_bound_cps, 2),
        **ingest_fields,
    }
    # Breakouts under a watchdog: a stuck remote compile must never cost
    # the driver the primary JSON line.  Sections run SEQUENTIALLY (the
    # single-core host + one compile relay poison concurrent
    # measurements), each inside a daemon thread with a timeout, against
    # one shared wall-clock budget (BENCH_BUDGET_S) — a section whose
    # estimated cost no longer fits is skipped with a marker instead of
    # risking the already-measured primary line.
    import sys

    _mark("breakouts_start")
    budget_s = float(os.environ.get("BENCH_BUDGET_S", "5400"))
    deadline = _BENCH_T0 + budget_s
    hung: list = []

    def run_section(name, fn, est_s, timeout_env, default_timeout, forced=False):
        # BENCH_SKIP_BREAKOUTS drops the DEFAULT sections only — a
        # section the caller explicitly requested (BENCH_SERVING=1 /
        # BENCH_RESIDENT=1) still runs
        if os.environ.get("BENCH_SKIP_BREAKOUTS") == "1" and not forced:
            return
        if hung:
            results[f"{name}_skipped"] = f"earlier section hung: {hung[0]}"
            return
        remaining = deadline - time.monotonic()
        if remaining < est_s:
            results[f"{name}_skipped"] = (
                f"budget: {remaining:.0f}s left < est {est_s:.0f}s"
            )
            return
        _mark(f"{name}_start")
        scratch: dict = {"_deadline": deadline}
        sdone = threading.Event()

        def _wrap():
            try:
                fn(scratch)
            except Exception as e:  # diagnosable, never fatal
                scratch[f"{name}_error"] = (f"{type(e).__name__}: {e}")[:300]
            sdone.set()

        th = threading.Thread(target=_wrap, daemon=True)
        th.start()
        th.join(
            timeout=min(
                remaining, float(os.environ.get(timeout_env, default_timeout))
            )
        )
        if sdone.is_set():
            scratch.pop("_deadline", None)
            results.update(scratch)
        else:
            results[f"{name}_error"] = "timeout: section hung"
            hung.append(name)

    if os.environ.get("BENCH_FLOW", "1") == "1":
        run_section(
            "flow", _flow_breakouts, 400, "BENCH_BREAKOUT_TIMEOUT_S", 2700
        )
    if "twostream_clips_per_sec" in results:
        # TwoStream e2e: the wire carries rgb only (flow is computed on
        # device from it), so the decode-inclusive rate is bounded by the
        # SAME transfer path as the headline and the TS device pipeline.
        results["twostream_e2e_bound_clips_per_sec"] = round(
            min(
                results["h2d_bound_clips_per_sec"],
                results["twostream_clips_per_sec"],
            ),
            2,
        )
    def _ts_e2e(res: dict):
        # MEASURED TwoStream decode-inclusive e2e — BASELINE config #4.
        # RESIDENT architecture since round 5 (VERDICT r4 item 1b): the
        # r4 wire-fed version measured 13.58 clips/s = 39% of its own
        # bound because its single feeder thread serialized dense-BGR
        # cache reads (~4 s/step at 42 MB/s) with the ragged pack and the
        # device_put.  The shipping TwoStream path keeps the staged split
        # resident (train --resident; flow computed on device from the
        # resident rgb), so the e2e now measures exactly that: one
        # overlapped i420 upload (its own, freshly timed — config #4 is
        # an independent experiment), then every epoch runs augment +
        # on-device turbo Farnebäck + 4-member 2-trunk forward + fusion
        # from HBM (reference train.py:390-420 two-stream assembly;
        # per-epoch host cost = 48 int32 indices).
        from crowded_scenes_ensemble_classification_tpu.data.wire_format import (
            i420_to_bgr_u8,
        )
        from crowded_scenes_ensemble_classification_tpu.flow.farneback import (
            TURBO_PARAMS,
            farneback_flow_batch,
            rgb_to_gray,
        )
        from crowded_scenes_ensemble_classification_tpu.ops.augment import (
            crowd11_augment_batch,
        )

        ts_bundle = build_model(
            "TWOSTREAM_I3D", num_classes=11, dtype=jnp.bfloat16
        )
        ts_prestaged = ts_bundle.module.clone(stem_prestaged=True)
        tkeys = jax.random.split(jax.random.key(5), NUM_MEMBERS)
        rgb_d = jnp.zeros((1, FRAMES, SIZE, SIZE, 3), jnp.bfloat16)
        flow_d = jnp.zeros((1, FRAMES, SIZE, SIZE, 2), jnp.bfloat16)
        ts_stacked = stack_variables(
            [ts_bundle.module.init(k, rgb_d, flow_d, train=False) for k in tkeys]
        )
        tsb = min(TWOSTREAM_BATCH, n_clips)  # tiny-size smoke safety
        ts_steps = n_clips // tsb
        n_rows = ts_steps * tsb
        ibytes = FRAMES * STAGING * STAGING * 3 // 2
        i420_reader = _build_i420_cache(staging_reader, n_clips)
        n_sub = max(1, round(tsb / 24))
        while tsb % n_sub:
            n_sub -= 1
        ts_chunk = tsb // n_sub
        tkey = jax.random.key(12)

        def ts_read_rows(lo: int, hi: int) -> np.ndarray:
            rows = i420_reader.read_batch(np.arange(lo, hi))[0]
            return rows.reshape(hi - lo, ibytes)

        @jax.jit
        def ts_pipeline(stacked_vars, resident_i420, key, step, carry):
            step_key = jax.random.fold_in(key, step)
            start = (step % jnp.uint32(ts_steps)) * jnp.uint32(tsb)
            rows = jax.lax.dynamic_slice_in_dim(resident_i420, start, tsb, 0)
            batch = jax.vmap(
                lambda f: i420_to_bgr_u8(f, FRAMES, STAGING, STAGING)
            )(rows)
            x = crowd11_augment_batch(
                batch.astype(jnp.float32), step_key, (SIZE, SIZE), p=AUGMENT_P
            )
            gray = rgb_to_gray(x)
            flows = farneback_flow_batch(
                gray, jnp.roll(gray, -1, axis=1),
                chunk_pairs=TWOSTREAM_FLOW_CHUNK * FRAMES, **TURBO_PARAMS,
            )
            xs_rgb = s2d_stem_stage(x.astype(jnp.bfloat16))
            xs_flow = s2d_stem_stage(flows.astype(jnp.bfloat16))

            def member(v):
                logits = ts_prestaged.apply(v, xs_rgb, xs_flow, train=False)
                return jax.nn.softmax(logits, axis=-1)

            probs = jax.lax.map(member, stacked_vars)
            return carry + jnp.sum(jnp.argmax(jnp.einsum("mbc->bc", probs), -1))

        dummy = jnp.zeros((n_rows, ibytes), jnp.uint8)
        float(ts_pipeline(ts_stacked, dummy, tkey, jnp.uint32(0), jnp.int32(0)))
        del dummy  # compile outside the measured window

        run = _stream_resident(
            ts_read_rows, n_rows, ibytes, ts_chunk, tsb, ts_steps, EPOCHS,
            lambda r, s, c: ts_pipeline(ts_stacked, r, tkey, jnp.uint32(s), c),
        )
        total = tsb * ts_steps * EPOCHS
        res["twostream_e2e_clips_per_sec"] = round(
            total / (run["upload_s"] + run["steps_s"]), 2
        )
        res["twostream_upload_s"] = round(run["upload_s"], 1)
        res["twostream_e2e_epochs"] = EPOCHS
        if EPOCHS > 1:
            steady = tsb * ts_steps * (EPOCHS - 1) / run["steps_s"]
            res["twostream_e2e_steady_state_clips_per_sec"] = round(steady, 2)
            # composite bound: ideal overlapped upload at the measured
            # single-chunk link rate, then steady-state epochs at the
            # section's own measured device rate
            h2d = results.get("h2d_gbps")
            if h2d:
                res["twostream_e2e_bound_clips_per_sec"] = round(
                    total
                    / (
                        n_rows * ibytes / 1e9 / h2d
                        + (EPOCHS - 1) * tsb * ts_steps / steady
                    ),
                    2,
                )

    def _int8_breakout(res: dict):
        # Static-int8 device pipeline rate (VERDICT r4 item 4: the int8
        # rate belongs in the driver artifact).  Same jit region as the
        # headline device rate — resident i420 decode + full augment +
        # 4-member prestaged I3D + fusion — with int8 MXU contractions.
        # Policy = ALL blocks: the round-5 per-site A/B
        # (tools/perf_probe_quant --ab, table in NEXT.md) measured
        # whole-model static int8 at 94.46 ms/member vs 101.33 for the
        # mixed Mixed_4f/5b/5c+stem policy and 109.63 bf16 — per-site
        # marginals are NON-additive (most single sites LOSE by paying
        # bf16↔int8 boundary conversions XLA can only fuse away when
        # neighbours are quantized too), so the whole model is the
        # fastest static policy.  BENCH_INT8_POLICY overrides (e.g.
        # 'mixed' or a comma site list).  qstats are fabricated
        # (throughput is scale-independent; accuracy of the static path
        # is CPU-gated in tests/test_quant.py — same convention as
        # tools/perf_probe_quant.py).
        if INGEST != "resident":
            res["int8_note"] = "resident ingest only"
            return
        from crowded_scenes_ensemble_classification_tpu.models.quantize import (
            quantize_variables,
            resolve_quant_blocks,
        )

        policy = os.environ.get("BENCH_INT8_POLICY", "all")
        qkw = (
            {}
            if policy == "all"
            else {"quant_blocks": resolve_quant_blocks(policy)}
        )
        qbundle = build_model(
            "I3D", num_classes=11, dtype=jnp.bfloat16, quant="static",
            fuse_1x1=FUSE_1X1, **qkw,
        )
        qprestaged = qbundle.module.clone(stem_prestaged=True)
        dummy_xs = s2d_stem_stage(
            jnp.zeros((1, FRAMES, SIZE, SIZE, 3), jnp.bfloat16)
        )
        qv = qprestaged.init(jax.random.key(0), dummy_xs, train=False)
        qv = dict(qv)
        qv["qstats"] = jax.tree_util.tree_map(
            lambda s: jnp.full(s.shape, 100.0, jnp.float32), qv["qstats"]
        )
        qv = quantize_variables(qv)
        qstacked = stack_variables([qv] * NUM_MEMBERS)

        @jax.jit
        def pipeline_int8(stacked_vars, resident_i420, key, step, carry):
            step_key = jax.random.fold_in(key, step)
            start = (step % jnp.uint32(CACHE_BATCHES)) * jnp.uint32(BATCH)
            rows = jax.lax.dynamic_slice_in_dim(resident_i420, start, BATCH, 0)
            batch = jax.vmap(
                lambda f: i420_to_bgr_u8(f, FRAMES, STAGING, STAGING)
            )(rows)
            x = crowd11_augment_batch(
                batch.astype(jnp.float32), step_key, (SIZE, SIZE), p=AUGMENT_P
            )
            x = x.astype(jnp.bfloat16)
            xs = s2d_stem_stage(x)
            probs = jax.lax.map(
                lambda v: jax.nn.softmax(
                    qprestaged.apply(v, xs, train=False), -1
                ),
                stacked_vars,
            )
            return carry + jnp.sum(jnp.argmax(jnp.einsum("mbc->bc", probs), -1))

        resident = run["resident"]
        carry = jnp.int32(0)
        float(pipeline_int8(qstacked, resident, key, jnp.uint32(0), carry))
        iters = max(1, DEVICE_ITERS)
        t0 = time.perf_counter()
        for s_i in range(iters):
            carry = pipeline_int8(
                qstacked, resident, key, jnp.uint32(s_i), carry
            )
        float(carry)
        res["device_pipeline_clips_per_sec_int8"] = round(
            BATCH * iters / (time.perf_counter() - t0), 2
        )
        res["int8_policy"] = policy

    # Default sections since round 4 (VERDICT r3 #3: all five BASELINE
    # configs in the one JSON line).  Estimated costs are conservative
    # remote-compile + measure figures; the shared budget skips (with a
    # marker) whatever no longer fits instead of risking the line.
    if os.environ.get("BENCH_INT8", "1") == "1":
        run_section("int8", _int8_breakout, 400, "BENCH_INT8_TIMEOUT_S", 1800)
    if os.environ.get("BENCH_TWOSTREAM_E2E", "1") == "1":
        run_section("twostream_e2e", _ts_e2e, 500, "BENCH_TS_E2E_TIMEOUT_S", 1800)
    if os.environ.get("BENCH_HETERO", "1") == "1":
        run_section("hetero", _hetero_breakout, 700, "BENCH_HETERO_TIMEOUT_S", 1800)
    if os.environ.get("BENCH_TRAIN_RATES", "1") == "1":
        run_section(
            "train_rates", _train_rates_breakout, 900,
            "BENCH_TRAIN_TIMEOUT_S", 2700,
        )
    if os.environ.get("BENCH_SERVING", "1") == "1":
        run_section(
            "serving", lambda res: _serving_breakout(res, eval_reader),
            600, "BENCH_SERVING_TIMEOUT_S", 2700,
        )
    if os.environ.get("BENCH_RESIDENT") == "1":
        run_section(
            "resident", lambda res: _resident_breakout(res, staging_reader),
            600, "BENCH_RESIDENT_TIMEOUT_S", 2700, forced=True,
        )
    finished.set()
    print(json.dumps(results))
    if hung:
        # an abandoned breakout thread would otherwise keep the process
        # alive past the driver's patience
        sys.stdout.flush()
        os._exit(0)


if __name__ == "__main__":
    # Driver contract: ONE JSON line, always.  A dead axon relay makes
    # backend init itself raise (observed round 3: RuntimeError 'Unable to
    # initialize backend axon' with zero output) — the failure mode must be
    # 'value 0 with an error field', never a bare traceback.
    try:
        main()
    except BaseException as e:  # noqa: BLE001 — anything before the print
        import sys
        import traceback

        traceback.print_exc(file=sys.stderr)
        print(
            json.dumps(
                {
                    "metric": "e2e_ensemble_inference_clips_per_sec_per_chip",
                    "value": 0.0,
                    "unit": "clips/s decode-inclusive",
                    "vs_baseline": 0.0,
                    "error": (
                        "bench crashed before measuring: "
                        f"{type(e).__name__}: {e}"
                    )[:500],
                }
            )
        )
        sys.exit(1)
