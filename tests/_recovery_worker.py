"""Worker for the kill-and-recover orchestration test (VERDICT r3 weak-6).

Trains an explicit (test, val) member list sequentially into a shared
work dir — the external fan-out shape (one process per member slice,
reference launch_train_ensemble.py:144-158 sbatch fan-out) — and touches
a sentinel file after each completed member so the parent test can kill
this process deterministically mid-ensemble.

argv: work_dir members_json sentinel_dir
"""

from __future__ import annotations

import json
import os
import sys


def main() -> None:
    work_dir, members_json, sentinel_dir = sys.argv[1], sys.argv[2], sys.argv[3]

    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import optax

    from crowded_scenes_ensemble_classification_tpu.core.config import (
        ClipSpec,
        ExperimentConfig,
    )
    from crowded_scenes_ensemble_classification_tpu.models import C3D
    from crowded_scenes_ensemble_classification_tpu.models.registry import ModelBundle
    from crowded_scenes_ensemble_classification_tpu.orchestration import (
        WorkLayout,
        train_member,
    )

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
    for t, v in json.loads(members_json):
        train_member(
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
        open(os.path.join(sentinel_dir, f"done_{t}_{v}"), "w").close()
    print("worker done")


if __name__ == "__main__":
    main()
