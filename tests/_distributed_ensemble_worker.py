"""Worker for the 2-process ENSEMBLE fan-out smoke (VERDICT r2 item 8).

Each process joins the jax.distributed coordinator, takes its disjoint
`my_member_assignments` slice of the k×(k−1) member matrix, and trains
those members end-to-end via orchestration.train_member into a SHARED
work dir — the single-controller replacement for the reference's
`sbatch train.sh` fan-out (launch_train_ensemble.py:144-158).  A
single-process evaluator then fuses the union of the checkpoints
(test_distributed_multiprocess.py).

Prints ONE JSON line: {"process_id", "assignments", "trained"}.
"""

from __future__ import annotations

import json
import os
import sys


def main() -> None:
    coordinator, num_processes, process_id, work_dir = (
        sys.argv[1],
        int(sys.argv[2]),
        int(sys.argv[3]),
        sys.argv[4],
    )

    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from crowded_scenes_ensemble_classification_tpu.core.config import (
        ExperimentConfig,
    )
    from crowded_scenes_ensemble_classification_tpu.core.config import ClipSpec
    from crowded_scenes_ensemble_classification_tpu.models import C3D
    from crowded_scenes_ensemble_classification_tpu.models.registry import (
        ModelBundle,
    )
    from crowded_scenes_ensemble_classification_tpu.orchestration import (
        WorkLayout,
        train_member,
    )
    from crowded_scenes_ensemble_classification_tpu.parallel.distributed import (
        initialize_distributed,
        my_member_assignments,
    )

    initialize_distributed(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
    )
    assert jax.process_count() == num_processes

    config = ExperimentConfig(
        model_type="C3D",
        training_condition="_SCRATCH",
        folds_number=3,
        num_classes=3,
        batch_size=6,
        epochs=1,
    )
    layout = WorkLayout(work_dir)
    bundle = ModelBundle(
        model_type="C3D",
        module=C3D(num_classes=3, width=0.125),
        clip=ClipSpec(frames=16, height=32, width=32),
        num_classes=3,
        two_stream=False,
    )
    import optax

    assignments = my_member_assignments(config.folds_number)
    trained = []
    for t, v in assignments:
        out = train_member(
            config,
            layout,
            t,
            v,
            epochs=1,
            bundle=bundle,
            input_scale=1 / 255.0,
            staging_hw=(40, 40),
            num_workers=2,
            optimizer=optax.inject_hyperparams(optax.adam)(learning_rate=2e-3),
        )
        trained.append([t, v, float(out["test_loss"])])

    print(
        json.dumps(
            {
                "process_id": process_id,
                "assignments": [list(p) for p in assignments],
                "trained": trained,
            }
        )
    )


if __name__ == "__main__":
    main()
