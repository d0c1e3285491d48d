"""Ingest probe part 2: transfer/compute overlap + fine chunk sweep.

Part 1 (perf_probe_ingest.py) measured: 48-240-clip chunks sustain
~0.058 GB/s one-shot; back-to-back 48-clip chunks 0.042 GB/s; a single
0.94 GB put collapses to 0.024 GB/s; interleaved pack+put ~= prepacked
once the page cache is warm.  This part answers:

  D. does compute dispatched after each put overlap the NEXT put's
     transfer (wall ~ max) or serialize (wall ~ sum)?
  E. back-to-back sweep 24/48/96-clip chunks — the sustained rate the
     headline upload should be engineered to.
"""

from __future__ import annotations

import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, ".")

import bench  # noqa: E402


def main() -> None:
    import jax
    import jax.numpy as jnp

    from crowded_scenes_ensemble_classification_tpu.data.wire_format import (
        bgr_clip_to_i420,
    )

    FRAMES, STAGING = bench.FRAMES, bench.STAGING
    N = 480
    staging_reader, _ = bench._build_caches(N)

    def pack(lo: int, hi: int) -> np.ndarray:
        clips = staging_reader.read_batch(np.arange(lo, hi))[0]
        return np.stack([bgr_clip_to_i420(c) for c in clips])

    sync = jax.jit(lambda x: jnp.sum(x[::4097].astype(jnp.int32)))
    t0 = time.perf_counter()
    packed_all = pack(0, N)
    print(f"host pack (warm cache): {time.perf_counter() - t0:.1f}s", flush=True)
    total_gb = packed_all.nbytes / 1e9
    float(sync(jax.device_put(packed_all[:8]).reshape(-1)))

    # ---- E. sustained back-to-back sweep ---------------------------------
    for nclips in (24, 48, 96):
        nchunks = N // nclips
        chunks_host = [
            np.ascontiguousarray(packed_all[i * nclips : (i + 1) * nclips])
            for i in range(nchunks)
        ]
        t0 = time.perf_counter()
        dev = [jax.device_put(c) for c in chunks_host]
        for d in dev:
            float(sync(d.reshape(-1)))
        tot_s = time.perf_counter() - t0
        del dev
        print(
            f"E sustained {nchunks}x{nclips}: {tot_s:6.2f}s "
            f"-> {total_gb / tot_s:.4f} GB/s",
            flush=True,
        )

    # ---- D. transfer/compute overlap --------------------------------------
    m = jnp.ones((4096, 4096), jnp.bfloat16)

    @partial(jax.jit, static_argnums=2)
    def burn(m, carry, reps):
        def body(c, _):
            return c @ m * jnp.bfloat16(1e-4), None

        out, _ = jax.lax.scan(body, m, None, length=reps)
        return carry + out[0, 0].astype(jnp.float32)

    float(burn(m, jnp.float32(0), 8))
    t0 = time.perf_counter()
    float(burn(m, jnp.float32(0), 256))
    burn_s = time.perf_counter() - t0
    print(f"D compute chain (256 matmuls 4096^2): {burn_s:.2f}s", flush=True)

    nclips = 48
    nchunks = N // nclips
    chunks_host = [
        np.ascontiguousarray(packed_all[i * nclips : (i + 1) * nclips])
        for i in range(nchunks)
    ]
    # serial baseline: all puts, then all compute
    t0 = time.perf_counter()
    dev = [jax.device_put(c) for c in chunks_host]
    for d in dev:
        float(sync(d.reshape(-1)))
    carry = jnp.float32(0)
    for _ in range(nchunks):
        carry = burn(m, carry, 256)
    float(carry)
    serial_s = time.perf_counter() - t0
    del dev
    print(f"D serial (10 puts then 10 chains): {serial_s:6.2f}s", flush=True)

    # overlapped: dispatch chain right after each put
    carry = jnp.float32(0)
    t0 = time.perf_counter()
    devs = []
    for c in chunks_host:
        d = jax.device_put(c)
        devs.append(d)
        carry = burn(m, carry, 256)
    for d in devs:
        carry = carry + sync(d.reshape(-1)).astype(jnp.float32)
    float(carry)
    over_s = time.perf_counter() - t0
    print(
        f"D overlapped (put_i; dispatch chain_i): {over_s:6.2f}s "
        f"(perfect overlap ~ max(transfer, {nchunks * burn_s:.1f}s compute))",
        flush=True,
    )
    print("probe2 done", flush=True)


if __name__ == "__main__":
    main()
