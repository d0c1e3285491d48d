"""On-chip ingest probe (round 5, VERDICT r4 item 1).

Diagnoses why the headline's one-time resident upload ran at ~0.018 GB/s
while the same run's single-chunk h2d measurement said 0.034 GB/s
(BENCH_r04).  Hypotheses measured here, each as its own timed section:

  A. chunk-size sweep: device_put rate for one synced transfer of
     24/48/96/240/480-clip i420 chunks (is there per-transfer overhead,
     or does a big buffer transfer slower?)
  B. back-to-back chunked upload, HOST PACK DONE UP FRONT (prepack):
     pack all chunks first, then device_put them in a tight loop, sync
     once — the candidate replacement for the feeder.
  C. the bench's current feeder pattern: read+pack interleaved with
     device_put in one thread (single-core host: does the numpy i420
     pack steal CPU from the tunnel transport?)
  D. transfer/compute overlap: dispatch a compute chain on chunk b
     right after its device_put returns, while chunk b+1 uploads —
     does wall ≈ max(transfer, compute) or the sum?

Timing through the axon relay: block_until_ready is a NO-OP — every
section syncs by fetching one scalar that data-depends on the payload.

Run:  timeout 1800 python tools/perf_probe_ingest.py | tee /tmp/ingest_probe.log
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, ".")

import bench  # reuses the bench cache + data statistics  # noqa: E402


def main() -> None:
    import jax
    import jax.numpy as jnp

    from crowded_scenes_ensemble_classification_tpu.data.wire_format import (
        bgr_clip_to_i420,
    )

    FRAMES, STAGING = bench.FRAMES, bench.STAGING
    N = 480
    staging_reader, _eval_reader = bench._build_caches(N)
    print(f"cache ready: {N} clips {FRAMES}x{STAGING}^2", flush=True)

    ibytes = FRAMES * STAGING * STAGING * 3 // 2

    def pack(lo: int, hi: int) -> np.ndarray:
        clips = staging_reader.read_batch(np.arange(lo, hi))[0]
        return np.stack([bgr_clip_to_i420(c) for c in clips])

    # one scalar fetch that data-depends on the whole payload
    sync = jax.jit(lambda x: jnp.sum(x[::4097].astype(jnp.int32)))
    warm = jax.device_put(pack(0, 8).reshape(-1))
    float(sync(warm))
    del warm

    t0 = time.perf_counter()
    packed_all = pack(0, N)  # (N, ibytes)
    pack_s = time.perf_counter() - t0
    total_gb = packed_all.nbytes / 1e9
    print(
        f"host pack: {pack_s:.1f}s for {total_gb:.2f} GB "
        f"({N / pack_s:.0f} clips/s)",
        flush=True,
    )

    # ---- A. chunk-size sweep (each: one put + sync) ----------------------
    for nclips in (24, 48, 96, 240, 480):
        buf = packed_all[:nclips].reshape(-1)
        t0 = time.perf_counter()
        x = jax.device_put(buf)
        put_s = time.perf_counter() - t0
        float(sync(x))
        tot_s = time.perf_counter() - t0
        del x
        gb = buf.nbytes / 1e9
        print(
            f"A chunk={nclips:4d} clips ({gb:5.2f} GB): "
            f"put returned at {put_s:6.2f}s, synced {tot_s:6.2f}s "
            f"-> {gb / tot_s:.4f} GB/s",
            flush=True,
        )

    # ---- B. prepacked back-to-back chunked upload ------------------------
    for nclips in (48, 96):
        nchunks = N // nclips
        chunks_host = [
            packed_all[i * nclips : (i + 1) * nclips] for i in range(nchunks)
        ]
        t0 = time.perf_counter()
        dev = [jax.device_put(c) for c in chunks_host]
        put_s = time.perf_counter() - t0
        s = 0.0
        for d in dev:
            s += float(sync(d.reshape(-1)))
        tot_s = time.perf_counter() - t0
        del dev
        print(
            f"B prepacked {nchunks}x{nclips}: puts returned {put_s:6.2f}s, "
            f"all synced {tot_s:6.2f}s -> {total_gb / tot_s:.4f} GB/s",
            flush=True,
        )

    # ---- C. the bench feeder pattern (pack interleaved with put) ---------
    t0 = time.perf_counter()
    dev = []
    for b in range(5):
        dev.append(jax.device_put(pack(b * 96, (b + 1) * 96)))
    s = 0.0
    for d in dev:
        s += float(sync(d.reshape(-1)))
    tot_s = time.perf_counter() - t0
    del dev
    print(
        f"C interleaved pack+put 5x96: total {tot_s:6.2f}s "
        f"-> {total_gb / tot_s:.4f} GB/s (includes {pack_s:.1f}s-worth of pack)",
        flush=True,
    )

    # ---- D. transfer/compute overlap --------------------------------------
    # compute chain: enough matmul work per chunk to be ~comparable to a
    # transfer (few seconds), dispatched right after each put returns
    m = jnp.ones((4096, 4096), jnp.bfloat16)

    @jax.jit
    def burn(m, carry, reps):
        def body(c, _):
            return (c @ m)[:1, :1].astype(jnp.float32)[0, 0] * 0 + c, None

        out, _ = jax.lax.scan(body, m, None, length=reps)
        return carry + out[0, 0].astype(jnp.float32)

    # calibrate compute chain cost
    float(burn(m, jnp.float32(0), 8))
    t0 = time.perf_counter()
    float(burn(m, jnp.float32(0), 64))
    burn_s = time.perf_counter() - t0
    print(f"D compute chain (64 matmuls 4096^2 bf16): {burn_s:.2f}s", flush=True)

    chunks_host = [packed_all[i * 96 : (i + 1) * 96] for i in range(5)]
    carry = jnp.float32(0)
    t0 = time.perf_counter()
    devs = []
    for c in chunks_host:
        d = jax.device_put(c)
        devs.append(d)
        carry = burn(m, carry, 64)  # dispatched while next put streams?
    for d in devs:
        carry = carry + sync(d.reshape(-1)).astype(jnp.float32)
    float(carry)
    tot_s = time.perf_counter() - t0
    print(
        f"D overlapped 5x(put 96 + 64-matmul chain): {tot_s:6.2f}s "
        f"(serial would be ~{5 * burn_s:.1f}s compute + transfer)",
        flush=True,
    )
    print("probe done", flush=True)


if __name__ == "__main__":
    main()
