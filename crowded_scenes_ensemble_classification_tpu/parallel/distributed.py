"""Multi-host / multi-slice setup.

The reference's "distribution" was Slurm job fan-out with zero inter-job
communication (launch_train_ensemble.py:144-158).  Here scale-out is
single-controller JAX:

- intra-slice: the data/member mesh axes over ICI (core.mesh),
- multi-slice / multi-host: `jax.distributed.initialize` extends the same
  mesh over DCN — fold-parallel ensemble training maps different (test, val)
  members onto different slices with NO code changes (each process runs the
  same `launch_ensemble_training`, selecting members by process_index).

Host-side input pipelines feed only their addressable shard
(`jax.make_array_from_process_local_data`).
"""

from __future__ import annotations

import os
from typing import Optional

import jax


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Idempotent jax.distributed.initialize wrapper; no-op when
    single-process (the common single-slice case and all tests)."""
    if num_processes in (None, 1) and coordinator_address is None:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def is_multi_process() -> bool:
    return jax.process_count() > 1


def my_member_assignments(folds_number: int):
    """Round-robin the k·(k−1) (test, val) members over processes —
    fold-parallel training across slices (the Slurm fan-out equivalent,
    but inside one job)."""
    from ..core.config import split_pairs

    pairs = split_pairs(folds_number)
    p = jax.process_index()
    n = jax.process_count()
    return [pair for i, pair in enumerate(pairs) if i % n == p]
