"""2-process jax.distributed CPU smoke test (VERDICT round-1, item 9).

Validates the single-controller claim of parallel/distributed.py with a
REAL multi-process runtime: two CPU processes join a coordinator, see a
global process_count of 2, receive disjoint fold-parallel member
assignments (the reference fanned these out as independent Slurm jobs,
launch_train_ensemble.py:144-158), and execute one cross-process global
reduction.
"""

from __future__ import annotations

import json
import os
import socket
import subprocess
import sys

import pytest

WORKER = os.path.join(os.path.dirname(os.path.abspath(__file__)), "_distributed_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_distributed_smoke():
    coordinator = f"127.0.0.1:{_free_port()}"
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    # One CPU device per process — the distributed runtime stitches the
    # two into one global 2-device mesh.
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
    env.pop("JAX_NUM_PROCESSES", None)

    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, coordinator, "2", str(pid)],
            env=env,
            stdout=subprocess.PIPE,
            stderr=subprocess.PIPE,
            text=True,
        )
        for pid in range(2)
    ]
    results = {}
    for p in procs:
        out, err = p.communicate(timeout=300)
        assert p.returncode == 0, f"worker failed:\nstdout={out}\nstderr={err}"
        rec = json.loads(out.strip().splitlines()[-1])
        results[rec["process_id"]] = rec

    assert set(results) == {0, 1}
    for rec in results.values():
        assert rec["process_count"] == 2
        assert rec["global_devices"] == 2
        # cross-process reduction saw both contributions: 1.0 + 2.0
        assert rec["psum"] == pytest.approx(3.0)

    a0 = {tuple(p) for p in results[0]["assignments"]}
    a1 = {tuple(p) for p in results[1]["assignments"]}
    # k=5 folds -> 20 (test, val) members, round-robined disjointly.
    assert a0.isdisjoint(a1)
    assert len(a0) + len(a1) == 20

    # the cross-process data-parallel train step converged to IDENTICAL
    # replicated params on both processes (grad all-reduce worked)
    import math

    for rec in results.values():
        assert math.isfinite(rec["train_loss"])
    assert results[0]["train_loss"] == pytest.approx(results[1]["train_loss"])
    assert results[0]["param_digest"] == pytest.approx(results[1]["param_digest"])
