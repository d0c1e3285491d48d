"""Headline benchmark: END-TO-END ensemble inference clips/sec/chip.

Measures the BASELINE.json north-star path on one chip, decode-inclusive:
clip-cache host reads (the framework's decode-once store, replacing the
reference's per-epoch cv2 decode loop, train.py:257-269) → device_put →
device-side augmentation (fused crop/flip/noise/resize, ops.augment) →
4-member sequential (lax.map) I3D forward (bf16) → on-device score fusion — with host
reads running in a prefetch thread overlapped against device steps.

The north-star target is ≥5000 clips/min end-to-end on a v5e-8, i.e.
≈10.42 clips/sec/chip; vs_baseline is measured against that per-chip rate.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...} where
`value` is the decode-inclusive rate and the extra fields break out the
device-only pipeline rate, the host cache-read rate, and the measured
host→device transfer bandwidth (0.1 GB/s through the axon relay tunnel;
~16+ GB/s PCIe on a real v5e host).
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
# reuse with this PJRT plugin), which risks the driver's bench window.
BATCH = 96
FRAMES, SIZE, STAGING = 20, 224, 256
CACHE_BATCHES = 5  # clips resident in the on-disk cache
EPOCHS = 4  # measured passes over the cache

CACHE_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".bench_cache")


def _build_cache(n_clips: int):
    """Synthetic decoded-clip store (decode happens once, like the real
    pipeline's populate pass); reused across bench runs."""
    from crowded_scenes_ensemble_classification_tpu.data.clip_cache import (
        ClipCacheReader,
        ClipCacheWriter,
    )

    path = os.path.join(CACHE_DIR, f"bench_{n_clips}x{FRAMES}x{STAGING}.ccache")
    if os.path.exists(path):
        try:
            r = ClipCacheReader(path)
            if len(r) == n_clips:
                return r
            r.close()
        except IOError:
            pass
        os.remove(path)
    rng = np.random.default_rng(0)
    w = ClipCacheWriter(path)
    for i in range(n_clips):
        clip = rng.integers(0, 255, (FRAMES, STAGING, STAGING, 3)).astype(np.uint8)
        w.add(str(i), clip, label=i % 11)
    w.finish()
    return ClipCacheReader(path)


def main():
    import jax

    # persistent compile cache: repeat runs skip the (slow) TPU compile
    try:
        jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    import jax.numpy as jnp

    from crowded_scenes_ensemble_classification_tpu.ensemble.members import (
        stack_variables,
    )
    from crowded_scenes_ensemble_classification_tpu.models import build_model
    from crowded_scenes_ensemble_classification_tpu.ops.augment import (
        crowd11_augment_batch,
    )

    bundle = build_model("I3D", num_classes=11, dtype=jnp.bfloat16)
    keys = jax.random.split(jax.random.key(0), NUM_MEMBERS)
    stacked = stack_variables([bundle.init(k) for k in keys])

    @jax.jit
    def pipeline(stacked_vars, staged_u8, key, carry):
        x = crowd11_augment_batch(
            staged_u8.astype(jnp.float32), key, (SIZE, SIZE), p=0.75
        )
        x = x.astype(jnp.bfloat16)  # cast once, shared by all members

        def member(v):
            logits = bundle.module.apply(v, x, train=False)
            return jax.nn.softmax(logits, axis=-1)

        probs = jax.lax.map(member, stacked_vars)  # (M, B, C), sequential
        fused = jnp.einsum("mbc->bc", probs)  # SUM-weight fusion
        preds = jnp.argmax(fused, axis=-1)
        # checksum chains iterations so one scalar fetch syncs them all
        # (block_until_ready is unreliable through the axon relay).
        return carry + jnp.sum(preds)

    n_clips = CACHE_BATCHES * BATCH
    reader = _build_cache(n_clips)
    key = jax.random.key(1)

    # Warmup / compile on the first cached batch.
    first, _ = reader.read_batch(np.arange(BATCH))
    staged = jax.device_put(first)
    float(pipeline(stacked, staged, key, jnp.int32(0)))

    # ---- host cache-read rate (threaded C++ pread) ----------------------
    # one untimed pass first: the framework's operating point is
    # decode-once/stream-many, i.e. steady-state page-cached reads (a cold
    # first pass measures raw disk, ~0.17 GB/s here vs 2.5 GB/s warm)
    for b in range(CACHE_BATCHES):
        reader.read_batch(np.arange(b * BATCH, (b + 1) * BATCH))
    t0 = time.perf_counter()
    for b in range(CACHE_BATCHES):
        reader.read_batch(np.arange(b * BATCH, (b + 1) * BATCH))
    host_read_cps = n_clips / (time.perf_counter() - t0)

    # ---- host→device transfer bandwidth ---------------------------------
    t0 = time.perf_counter()
    x = jax.device_put(first)
    _ = float(jnp.sum(x[0, 0, 0, 0]))  # force completion
    h2d_gbps = first.nbytes / (time.perf_counter() - t0) / 1e9

    # ---- device-only pipeline rate (data resident) ----------------------
    iters = 30
    carry = jnp.int32(0)
    t0 = time.perf_counter()
    for i in range(iters):
        carry = pipeline(stacked, staged, jax.random.fold_in(key, i), carry)
    float(carry)
    device_cps = BATCH * iters / (time.perf_counter() - t0)

    # ---- END-TO-END: prefetch-threaded cache reads → device_put → step --
    q: "queue.Queue[np.ndarray]" = queue.Queue(maxsize=3)

    def feeder():
        for e in range(EPOCHS):
            for b in range(CACHE_BATCHES):
                idx = np.arange(b * BATCH, (b + 1) * BATCH)
                buf, _ = reader.read_batch(idx)
                q.put(buf)
        q.put(None)

    t = threading.Thread(target=feeder, daemon=True)
    carry = jnp.int32(0)
    step = 0
    t0 = time.perf_counter()
    t.start()
    while True:
        buf = q.get()
        if buf is None:
            break
        staged_b = jax.device_put(buf)
        carry = pipeline(stacked, staged_b, jax.random.fold_in(key, step), carry)
        step += 1
    float(carry)
    e2e_cps = BATCH * step / (time.perf_counter() - t0)

    print(
        json.dumps(
            {
                "metric": "e2e_ensemble_inference_clips_per_sec_per_chip",
                "value": round(e2e_cps, 2),
                "unit": (
                    "clips/s decode-inclusive (cache read + h2d + device "
                    "augment + 4-member I3D bf16 + fusion, prefetch-overlapped)"
                ),
                "vs_baseline": round(e2e_cps / BASELINE_CLIPS_PER_SEC_PER_CHIP, 2),
                "device_pipeline_clips_per_sec": round(device_cps, 2),
                "host_read_clips_per_sec": round(host_read_cps, 2),
                "h2d_gbps": round(h2d_gbps, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
