"""Driver-contract regression test for bench.py.

bench.py is the one artifact the round driver runs sight-unseen on real
TPU hardware; a silent breakage there costs the whole round's headline.
This smoke drives the EXACT shipped file end-to-end (cache build → ragged
yuv420 wire pack → device unpack → windowed augment → 4-member I3D →
fusion) in a subprocess at tiny sizes on CPU and checks the driver
contract: exactly ONE JSON line on stdout with the required fields.

~3-4 min of XLA CPU compile dominates; the measured values are
meaningless on CPU and are only checked for presence/positivity.
"""

import json
import os
import subprocess
import sys

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


import pytest


@pytest.mark.parametrize("ingest", ["resident", "wire", "resident-ts"])
def test_bench_driver_contract_smoke(ingest):
    """resident/wire drive the two headline ingest paths; resident-ts
    additionally drives the TwoStream resident e2e section (round-5
    _ts_e2e: overlapped i420 upload + on-device flow + 2-trunk forward)
    with every other breakout gated off."""
    ts_section = ingest == "resident-ts"
    if ts_section:
        ingest = "resident"
    env = dict(
        os.environ,
        BENCH_FORCE_CPU="1",
        BENCH_BATCH="2",
        BENCH_CACHE_BATCHES="2",
        BENCH_EPOCHS="1" if not ts_section else "2",
        BENCH_DEVICE_ITERS="1",
        BENCH_INGEST=ingest,
    )
    env.pop("BENCH_TWOSTREAM_E2E", None)
    if ts_section:
        env.update(
            BENCH_FLOW="0",
            BENCH_HETERO="0",
            BENCH_TRAIN_RATES="0",
            BENCH_INT8="0",
            BENCH_SERVING="0",
            BENCH_TWOSTREAM_E2E="1",
        )
    elif ingest == "wire":
        # exercise the budget-aware section runner: an exhausted budget
        # must SKIP every default section with a marker, never hang or
        # kill the primary line (round-4 five-config sections)
        env["BENCH_BUDGET_S"] = "1"
    else:
        # resident: every default section off.  The int8 section is
        # covered structurally by the wire run's budget-skip marker and
        # numerically by tests/test_quant.py (model level) + the real-TPU
        # bench — XLA CPU lowers 224² int8 convs ~100× slower than bf16
        # (measured ~100 s/step at B=2), so running it here would blow
        # the subprocess timeout without testing anything the TPU run
        # doesn't.
        env.update(
            BENCH_FLOW="0",
            BENCH_HETERO="0",
            BENCH_INT8="0",
            BENCH_TRAIN_RATES="0",
            BENCH_SERVING="0",
            BENCH_TWOSTREAM_E2E="0",
        )
    # the conftest's platform pin must not leak into the subprocess
    env.pop("JAX_PLATFORMS", None)
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO_ROOT, "bench.py")],
        capture_output=True,
        text=True,
        cwd=REPO_ROOT,
        timeout=900,
        env=env,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    lines = [ln for ln in proc.stdout.strip().splitlines() if ln.strip()]
    assert len(lines) == 1, f"bench.py must print exactly ONE line: {lines}"
    results = json.loads(lines[0])
    assert results["metric"] == "e2e_ensemble_inference_clips_per_sec_per_chip"
    for field in (
        "value",
        "vs_baseline",
        "device_pipeline_clips_per_sec",
        "host_read_clips_per_sec",
        "h2d_gbps",
        "wire_mb_per_clip",
        "h2d_bound_clips_per_sec",
    ):
        assert results[field] > 0, (field, results)
    assert "unit" in results
    # both ingest modes ship 4:2:0 — half the bytes of full-chroma BGR
    assert results["wire_colorspace"] == "yuv420"
    if ingest == "wire":
        # every default section budget-skipped with a marker
        for sec in (
            "int8", "flow", "twostream_e2e", "hetero", "train_rates", "serving",
        ):
            assert "budget" in results[f"{sec}_skipped"], (sec, results)
    if ingest == "resident":
        assert results["ingest"] == "resident"
        assert results["resident_upload_s"] >= 0
        # full 256² staging frames as i420: 20·256²·1.5 B ≈ 1.97 MB/clip
        assert results["wire_mb_per_clip"] < 2.1
        assert results["epoch0_overlapped_steps"] == 2  # all of epoch 0
    else:
        # ragged crop-window wire: strictly below the full-staging size
        assert results["wire_mb_per_clip"] < 1.6
    if ts_section:
        assert results["twostream_e2e_clips_per_sec"] > 0, results
        assert results["twostream_e2e_steady_state_clips_per_sec"] > 0
        assert results["twostream_e2e_bound_clips_per_sec"] > 0
        assert results["twostream_e2e_epochs"] == 2


def test_bench_crash_still_prints_one_json_line():
    """A bench that dies before measuring (e.g. the axon relay refuses to
    initialize — observed live in round 3) must still print exactly ONE
    diagnostic JSON line with value 0, never a bare traceback."""
    env = dict(os.environ, BENCH_FORCE_CPU="1", BENCH_CRASH_TEST="1")
    env.pop("JAX_PLATFORMS", None)
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO_ROOT, "bench.py")],
        capture_output=True,
        text=True,
        cwd=REPO_ROOT,
        timeout=300,
        env=env,
    )
    assert proc.returncode == 1
    lines = [ln for ln in proc.stdout.strip().splitlines() if ln.strip()]
    assert len(lines) == 1, lines
    results = json.loads(lines[0])
    assert results["value"] == 0.0
    assert "crash-test hook" in results["error"]
    assert "RuntimeError" in proc.stderr
