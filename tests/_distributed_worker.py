"""Worker for the 2-process jax.distributed CPU smoke test.

Launched by test_distributed_multiprocess.py as two separate processes;
each initializes the distributed runtime via
parallel.distributed.initialize_distributed, asserts the global view
(process_count == 2), computes its fold-parallel member assignments
(the single-controller replacement for the reference's Slurm fan-out,
launch_train_ensemble.py:144-158), and runs one cross-process psum over
the global device mesh.  Prints ONE JSON line with the observations.
"""

from __future__ import annotations

import json
import os
import sys


def main() -> None:
    coordinator, num_processes, process_id = (
        sys.argv[1],
        int(sys.argv[2]),
        int(sys.argv[3]),
    )

    # Force the CPU platform BEFORE any jax import touches backends
    # (this environment registers an `axon` TPU plugin in sitecustomize).
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ.setdefault("XLA_FLAGS", "")
    import jax

    jax.config.update("jax_platforms", "cpu")

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from crowded_scenes_ensemble_classification_tpu.parallel.distributed import (
        initialize_distributed,
        is_multi_process,
        my_member_assignments,
    )

    initialize_distributed(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
    )

    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    assert jax.process_count() == num_processes
    assert is_multi_process()

    # Fold-parallel member fan-out: disjoint (test, val) pairs per process.
    assignments = my_member_assignments(5)

    # One real cross-process collective: each process contributes its
    # (process_id + 1) and the jit'd global sum must see both shards.
    devices = jax.devices()  # global device list (2 CPU devices)
    mesh = Mesh(np.asarray(devices), ("data",))
    sharding = NamedSharding(mesh, P("data"))
    local = np.full((1,), float(process_id + 1), np.float32)
    garr = jax.make_array_from_process_local_data(sharding, local)
    total = jax.jit(
        lambda a: jnp.sum(a), out_shardings=NamedSharding(mesh, P())
    )(garr)

    print(
        json.dumps(
            {
                "process_id": process_id,
                "process_count": jax.process_count(),
                "global_devices": len(devices),
                "assignments": [list(p) for p in assignments],
                "psum": float(total),
            }
        )
    )


if __name__ == "__main__":
    main()
