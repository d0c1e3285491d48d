"""Heterogeneous (global) ensemble end-to-end: two real architectures
(tiny C3D + tiny R3D) trained on the same folds, fused globally and
through the combination search — the reference's Global_evaluate_models /
Combine_ensembles path with real checkpoints (SURVEY.md configs #5)."""

import dataclasses
import math
import os

import numpy as np
import optax
import pytest

from crowded_scenes_ensemble_classification_tpu.core.config import (
    ClipSpec,
    ExperimentConfig,
)
from crowded_scenes_ensemble_classification_tpu.data import generate_synthetic_dataset
from crowded_scenes_ensemble_classification_tpu.ensemble import (
    combine_ensembles,
    global_evaluate_ensembles,
    load_probabilities,
    save_global_predictions_csv,
)
from crowded_scenes_ensemble_classification_tpu.models import C3D, R3D
from crowded_scenes_ensemble_classification_tpu.models.registry import ModelBundle
from crowded_scenes_ensemble_classification_tpu.orchestration import (
    cache_probabilities,
    prepare_ensemble,
    train_member,
)


def tiny_bundle(model_type, num_classes=3):
    if model_type == "C3D":
        module = C3D(num_classes=num_classes, width=0.125)
    else:
        module = R3D(num_classes=num_classes, depth=18)
    return ModelBundle(
        model_type=model_type,
        module=module,
        clip=ClipSpec(frames=16, height=32, width=32),
        num_classes=num_classes,
        two_stream=False,
    )


def _tx():
    return optax.inject_hyperparams(optax.adam)(learning_rate=2e-3)


@pytest.mark.slow
def test_global_ensemble_two_architectures(tmp_path):
    df = generate_synthetic_dataset(
        str(tmp_path / "data"), num_scenes=6, clips_per_scene=3, num_classes=3,
        num_frames=16, hw=(36, 36), as_videos=False,
    )
    work = str(tmp_path / "work")

    configs = {}
    for mt in ("C3D", "R3D_18"):
        configs[mt] = ExperimentConfig(
            model_type=mt, folds_number=3, num_classes=3, batch_size=6, epochs=1
        )

    layout = prepare_ensemble(configs["C3D"], df, work)
    # R3D shares the same folds/splits (idempotent prepare)
    prepare_ensemble(configs["R3D_18"], None, work)

    providers = {}
    for mt, cfg in configs.items():
        bundle = tiny_bundle(mt)
        for v in (1, 2):
            out = train_member(
                cfg, layout, 0, v,
                epochs=1, bundle=bundle, input_scale=1 / 255.0,
                staging_hw=(36, 36), num_workers=2, optimizer=_tx(),
            )
            assert math.isfinite(out["test_loss"])

        def provider(t, subset, cfg=cfg, bundle=bundle):
            return load_probabilities(
                cache_probabilities(
                    cfg, layout, t, subset, bundle=bundle,
                    staging_hw=(36, 36), num_workers=2,
                )
            )

        providers[mt + cfg.training_condition] = provider

    res = global_evaluate_ensembles(providers, folds_number=1)
    assert 0.0 <= res.mean_accuracy <= 1.0
    # 2 configs × 2 members concatenated
    d0 = providers["C3D_SCRATCH"](0, "test")
    assert d0["probs"].shape[0] == 2
    path = save_global_predictions_csv(res, layout.results_dir)
    assert os.path.exists(path)

    ranked = combine_ensembles(providers, folds_number=1)
    assert len(ranked) == 3  # {C3D}, {R3D}, {C3D,R3D}
    assert ranked[0][1] >= ranked[-1][1]
