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

    # One REAL data-parallel training step across processes: the global
    # batch is sharded over the 2-device (1 per process) mesh; gradients
    # all-reduce over DCN; both processes must produce identical params.
    from crowded_scenes_ensemble_classification_tpu.core.config import ClipSpec
    from crowded_scenes_ensemble_classification_tpu.models import C3D
    from crowded_scenes_ensemble_classification_tpu.models.registry import ModelBundle
    from crowded_scenes_ensemble_classification_tpu.train import (
        TrainState,
        make_optimizer,
        make_train_step,
    )

    bundle = ModelBundle(
        model_type="C3D",
        module=C3D(num_classes=3, width=0.125),
        clip=ClipSpec(frames=16, height=32, width=32),
        num_classes=3,
        two_stream=False,
    )
    tx = make_optimizer("C3D", 0.003)
    variables = bundle.init(jax.random.key(0), batch_size=1)
    state = TrainState.create(variables, tx, jax.random.key(1))
    step = make_train_step(
        bundle, tx, out_hw=(32, 32), augment=False, mesh=mesh,
        input_scale=1 / 255.0,
    )

    rng = np.random.default_rng(7)  # same seed in BOTH processes
    global_batch = {
        "rgb": rng.integers(0, 255, (4, 16, 40, 40, 3)).astype(np.uint8),
        "label": rng.integers(0, 3, 4).astype(np.int32),
        "valid": np.ones(4, bool),
        "index": np.arange(4),
    }
    half = 4 // num_processes
    lo = process_id * half
    sharded_batch = {
        k: jax.make_array_from_process_local_data(
            NamedSharding(mesh, P("data")), v[lo : lo + half]
        )
        for k, v in global_batch.items()
    }
    state, metrics = step(state, sharded_batch, jnp.ones((3,), jnp.float32))
    loss = float(metrics["loss"])
    # digest of the updated (replicated) params — must agree across procs
    leaves = jax.tree_util.tree_leaves(state.params)
    digest = float(sum(float(jnp.sum(jnp.abs(l.astype(jnp.float32)))) for l in leaves))

    print(
        json.dumps(
            {
                "process_id": process_id,
                "process_count": jax.process_count(),
                "global_devices": len(devices),
                "assignments": [list(p) for p in assignments],
                "psum": float(total),
                "train_loss": loss,
                "param_digest": round(digest, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
