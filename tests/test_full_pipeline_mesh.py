"""Full-pipeline 8-device run (VERDICT r4 item 5): launch → probs →
global heterogeneous fusion → report, end to end on the virtual 8-CPU
mesh in ONE flow, exercising

- data-sharded RESIDENT training (HBM-resident sharded gather) per member
- member×data-sharded ensemble forward (the launch geometry,
  reference launch_train_ensemble.py:117-158)
- heterogeneous global fusion across two real architectures
  (reference evaluate_ensemble.py:1329-1474)
- the global confusion-matrix report from the fused predictions

Tiny shapes throughout (CPU CI); the real-chip rates live in bench.py.
"""

import math
import os

import jax
import numpy as np
import optax
import pytest

from crowded_scenes_ensemble_classification_tpu.core.config import (
    ClipSpec,
    ExperimentConfig,
)
from crowded_scenes_ensemble_classification_tpu.core.mesh import make_mesh
from crowded_scenes_ensemble_classification_tpu.data import generate_synthetic_dataset
from crowded_scenes_ensemble_classification_tpu.ensemble import (
    global_evaluate_ensembles,
    load_probabilities,
    save_global_predictions_csv,
)
from crowded_scenes_ensemble_classification_tpu.ensemble.members import (
    make_member_forward,
    shard_stacked,
    stack_variables,
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
        module = R3D(num_classes=num_classes, depth=18, width=0.125)
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
def test_full_pipeline_on_8_device_mesh(tmp_path):
    mesh = make_mesh((("data", -1),))
    assert mesh.devices.size == 8

    df = generate_synthetic_dataset(
        str(tmp_path / "data"), num_scenes=6, clips_per_scene=3, num_classes=3,
        num_frames=16, hw=(36, 36), as_videos=False,
    )
    work = str(tmp_path / "work")

    configs = {
        mt: ExperimentConfig(
            model_type=mt, folds_number=3, num_classes=3, batch_size=8,
            epochs=1, input_scale=1 / 255.0,
        )
        for mt in ("C3D", "R3D_18")
    }
    layout = prepare_ensemble(configs["C3D"], df, work)
    prepare_ensemble(configs["R3D_18"], None, work)

    # ---- launch: data-sharded RESIDENT training of every member ---------
    bundles = {mt: tiny_bundle(mt) for mt in configs}
    for mt, cfg in configs.items():
        for v in (1, 2):
            out = train_member(
                cfg, layout, 0, v,
                mesh=mesh, resident=True,
                epochs=1, bundle=bundles[mt],
                staging_hw=(36, 36), num_workers=2, optimizer=_tx(),
            )
            assert math.isfinite(out["test_loss"])

    # ---- probs: mesh-sharded member probability caching ------------------
    providers = {}
    for mt, cfg in configs.items():
        def provider(t, subset, cfg=cfg, bundle=bundles[cfg.model_type]):
            return load_probabilities(
                cache_probabilities(
                    cfg, layout, t, subset, mesh=mesh, bundle=bundle,
                    staging_hw=(36, 36), num_workers=2,
                )
            )

        providers[mt + cfg.training_condition] = provider

    # ---- member×data-sharded ensemble forward (launch geometry) ----------
    # the C3D family's two trained member checkpoints, stacked on a
    # member axis and data-sharded, must reproduce the cached per-member
    # probabilities bit-for-policy (same forward, different sharding).
    from crowded_scenes_ensemble_classification_tpu.orchestration import (
        _member_variables,
    )

    cfg = configs["C3D"]
    emesh = make_mesh((("member", 2), ("data", -1)))
    vars_list, _names = _member_variables(cfg, layout, bundles["C3D"], 0)
    stacked = shard_stacked(stack_variables(vars_list), emesh)
    fwd = make_member_forward(bundles["C3D"], (32, 32), emesh, input_scale=1 / 255.0)

    from crowded_scenes_ensemble_classification_tpu.data import (
        BatchPipeline,
        SampleSpec,
    )
    import pandas as pd

    from crowded_scenes_ensemble_classification_tpu.core.config import (
        member_val_indices,
    )

    v0 = member_val_indices(cfg.folds_number, 0)[0]
    test_df = pd.read_csv(layout.split_csv(0, v0, "test"))
    spec = SampleSpec(num_frames=16, staging_hw=(36, 36))
    pipe = BatchPipeline(test_df, spec, batch_size=8, shuffle=False, num_workers=2)
    got, idx = [], []
    for batch in pipe.batches():
        probs = np.asarray(fwd(stacked, batch))
        valid = np.asarray(batch["valid"]).astype(bool)
        got.append(probs[:, valid])
        idx.append(np.asarray(batch["index"])[valid])
    got = np.concatenate(got, axis=1)
    order = np.argsort(np.concatenate(idx))
    got = got[:, order]

    cached = providers["C3D_SCRATCH"](0, "test")["probs"]
    np.testing.assert_allclose(got, np.asarray(cached), rtol=1e-4, atol=1e-5)

    # ---- hetero fusion over both families ---------------------------------
    res = global_evaluate_ensembles(providers, folds_number=1)
    assert 0.0 <= res.mean_accuracy <= 1.0
    csv_path = save_global_predictions_csv(res, layout.results_dir)
    assert os.path.exists(csv_path)

    # ---- report: global confusion matrix from the fused predictions ------
    from crowded_scenes_ensemble_classification_tpu.reports.matrices import (
        confusion_matrix,
        render_confusion_pdf,
        row_normalize,
    )

    fold = res.folds[0]
    labels = next(iter(providers.values()))(0, "test")["labels"]
    cm = row_normalize(confusion_matrix(labels, fold.predictions, 3))
    pdf = render_confusion_pdf(
        cm,
        str(tmp_path / "reports" / "global_cm_fold0.pdf"),
        title="global hetero fold 0",
        class_names=[f"c{i}" for i in range(3)],
    )
    assert os.path.exists(pdf)
