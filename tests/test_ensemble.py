"""Fusion-math unit tests against tiny hand-computed cases (SURVEY.md §4c)
plus member-parallel vmapped inference on the virtual mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from crowded_scenes_ensemble_classification_tpu.core.config import ClipSpec
from crowded_scenes_ensemble_classification_tpu.core.mesh import make_mesh
from crowded_scenes_ensemble_classification_tpu.ensemble import (
    MAXIMUM,
    combine_ensembles,
    compute_combinations,
    differential_evolution_weights,
    ensemble_accuracy,
    evaluate_ensembles,
    export_reference_csv,
    fuse_predictions,
    global_evaluate_ensembles,
    grid_search_weights,
    import_reference_csv,
    load_probabilities,
    member_probabilities,
    normalize_l1,
    save_probabilities,
    stack_variables,
    validation_error_inverse_weights,
)
from crowded_scenes_ensemble_classification_tpu.models import C3D
from crowded_scenes_ensemble_classification_tpu.models.registry import ModelBundle


# ----------------------------------------------------------------- fusion core


def test_weighted_fusion_tensordot_semantics():
    """summed = Σ_m w_m · yhat_m, argmax over classes
    (evaluate_ensemble.py:362-366)."""
    yhats = np.array(
        [
            [[0.6, 0.4], [0.2, 0.8]],
            [[0.1, 0.9], [0.9, 0.1]],
        ]
    )
    # equal weights: sample0 -> [0.7,1.3] -> 1; sample1 -> [1.1,0.9] -> 0
    preds = fuse_predictions(yhats, np.ones(2))
    np.testing.assert_array_equal(preds, [1, 0])
    # weight first model heavily: sample0 -> 0, sample1 -> 1 (10·0.8 wins)
    preds = fuse_predictions(yhats, np.array([10.0, 1.0]))
    np.testing.assert_array_equal(preds, [0, 1])


def test_maximum_fusion_mod_argmax():
    """argmax over flattened M·C scores mod C (evaluate_ensemble.py:356-359)."""
    yhats = np.array(
        [
            [[0.3, 0.2, 0.5]],
            [[0.9, 0.05, 0.05]],
        ]
    )
    preds = fuse_predictions(yhats, MAXIMUM)
    np.testing.assert_array_equal(preds, [0])  # global max 0.9 is class 0 of model 1


def test_normalize_l1():
    np.testing.assert_allclose(normalize_l1([1, 3]), [0.25, 0.75])
    np.testing.assert_array_equal(normalize_l1([0, 0]), [0, 0])  # zero passthrough


def test_validation_error_inverse():
    w = validation_error_inverse_weights([0.5, 1.0])
    np.testing.assert_allclose(w, [2 / 3, 1 / 3])


def test_grid_search_recovers_good_member():
    rng = np.random.default_rng(0)
    n, c = 60, 4
    labels = rng.integers(0, c, n)
    good = np.eye(c)[labels] * 0.9 + 0.025
    bad = rng.dirichlet(np.ones(c), n)
    yhats = np.stack([bad, good, bad])
    w = grid_search_weights(yhats, labels)
    assert w[1] > w[0] and w[1] > w[2]
    assert ensemble_accuracy(yhats, w, labels) == 1.0
    np.testing.assert_allclose(np.sum(np.abs(w)), 1.0)


def test_grid_search_first_best_tie_break():
    """With symmetric members, the FIRST best candidate in product order
    must win — matching the reference's strict-greater update."""
    labels = np.array([0, 1])
    perfect = np.eye(2)[labels]
    yhats = np.stack([perfect, perfect])
    w = grid_search_weights(yhats, labels)
    # first non-all-equal candidate in product order is (0.0, 0.1) → [0, 1]
    np.testing.assert_allclose(w, [0.0, 1.0])


def test_differential_evolution_improves():
    rng = np.random.default_rng(1)
    n, c = 40, 3
    labels = rng.integers(0, c, n)
    good = np.eye(c)[labels] * 0.8 + 0.066
    noise = rng.dirichlet(np.ones(c), n)
    yhats = np.stack([noise, good])
    w = differential_evolution_weights(yhats, labels, seed=0)
    acc = ensemble_accuracy(yhats, w, labels)
    assert acc >= ensemble_accuracy(yhats, np.ones(2), labels)
    assert w[1] > w[0]


# ----------------------------------------------------------------- evaluators


def _make_provider(rng, folds_number, m=4, n=30, c=3, quality=0.8):
    data = {}
    for t in range(folds_number):
        labels = rng.integers(0, c, n)
        probs = []
        for i in range(m):
            p = np.where(
                rng.random((n, 1)) < quality, np.eye(c)[labels], rng.dirichlet(np.ones(c), n)
            )
            probs.append(p)
        data[t] = {"probs": np.stack(probs), "labels": labels}

    def provider(t, subset):
        return data[t]

    return provider, data


def test_evaluate_ensembles_sum_scheme():
    rng = np.random.default_rng(2)
    provider, data = _make_provider(rng, folds_number=3)
    res = evaluate_ensembles(provider, 3, "SUM", name="test_ens")
    assert len(res.folds) == 3
    for f in res.folds:
        assert 0.5 < f.accuracy <= 1.0
        assert len(f.member_accuracies) == 4
    df = res.predictions_dataframe()
    assert df["path"][0] == "Ensemble_test_ens_split_test0"


def test_evaluate_ensembles_vei_scheme():
    rng = np.random.default_rng(3)
    provider, _ = _make_provider(rng, 2)
    res = evaluate_ensembles(
        provider, 2, "VALIDATION_ERROR_INVERSE",
        min_val_losses_provider=lambda t: [0.5, 1.0, 2.0, 4.0],
    )
    w = res.folds[0].weights
    np.testing.assert_allclose(np.sum(w), 1.0)
    assert w[0] > w[3]


def test_global_and_combinations():
    rng = np.random.default_rng(4)
    p1, _ = _make_provider(rng, 2, quality=0.9)
    p2, _ = _make_provider(rng, 2, quality=0.3)
    # make label sets consistent across configs
    base, data = _make_provider(rng, 2, quality=0.9)

    def weak(t, subset):
        d = data[t]
        noisy = np.clip(d["probs"] + rng.normal(0, 0.4, d["probs"].shape), 0, 1)
        return {"probs": noisy, "labels": d["labels"]}

    providers = {"STRONG": base, "WEAK": weak}
    res = global_evaluate_ensembles(providers, 2)
    assert 0.0 <= res.mean_accuracy <= 1.0
    combos = compute_combinations(["A", "B", "C"])
    assert len(combos) == 7
    ranked = combine_ensembles(providers, 2)
    assert len(ranked) == 3
    assert ranked[0][1] >= ranked[-1][1]


# ----------------------------------------------------------------- store


def test_probability_store_roundtrip(tmp_path):
    rng = np.random.default_rng(5)
    probs = rng.dirichlet(np.ones(4), (3, 10)).astype(np.float32)
    labels = rng.integers(0, 4, 10)
    path = str(tmp_path / "p.npz")
    save_probabilities(path, probs, labels, ["m0", "m1", "m2"])
    d = load_probabilities(path)
    np.testing.assert_allclose(d["probs"], probs)
    np.testing.assert_array_equal(d["labels"], labels)
    assert d["member_names"] == ["m0", "m1", "m2"]

    csv_path = str(tmp_path / "p.csv")
    export_reference_csv(path, csv_path)
    back = import_reference_csv(csv_path, num_classes=4)
    np.testing.assert_allclose(back["probs"], probs, atol=1e-6)


# ----------------------------------------------------------------- members


def test_member_parallel_forward_matches_sequential():
    bundle = ModelBundle(
        model_type="C3D",
        module=C3D(num_classes=3),
        clip=ClipSpec(frames=16, height=32, width=32),
        num_classes=3,
        two_stream=False,
    )
    keys = jax.random.split(jax.random.key(0), 2)
    vars_list = [bundle.init(k) for k in keys]

    class FakePipe:
        def __init__(self, rgb, labels):
            self.rgb, self.labels = rgb, labels

        def batches(self, epoch=0):
            yield {
                "rgb": self.rgb,
                "label": self.labels,
                "valid": np.ones(len(self.labels), bool),
                "index": np.arange(len(self.labels)),
            }

    rng = np.random.default_rng(0)
    rgb = rng.integers(0, 255, (4, 16, 32, 32, 3)).astype(np.uint8)
    labels = rng.integers(0, 3, 4)
    pipe = FakePipe(rgb, labels)

    probs = member_probabilities(bundle, vars_list, pipe)
    assert probs.shape == (2, 4, 3)
    np.testing.assert_allclose(probs.sum(-1), 1.0, rtol=1e-4)

    # sequential oracle
    from crowded_scenes_ensemble_classification_tpu.ops.augment import (
        identity_resize_batch,
    )

    x = identity_resize_batch(jnp.asarray(rgb, jnp.float32), (32, 32))
    for i, v in enumerate(vars_list):
        logits = bundle.apply(v, {"rgb": x}, train=False)
        np.testing.assert_allclose(
            probs[i], np.asarray(jax.nn.softmax(logits, -1)), atol=1e-5
        )


def test_member_probabilities_i3d_auto_shared_staging():
    """member_probabilities auto-enables shared stem staging for the
    I3D family; probabilities still match the per-member canonical
    forward (ensemble/members.py:184-188)."""
    from crowded_scenes_ensemble_classification_tpu.models import I3D
    from crowded_scenes_ensemble_classification_tpu.ops.augment import (
        identity_resize_batch,
    )

    bundle = ModelBundle(
        model_type="I3D",
        module=I3D(num_classes=3),
        clip=ClipSpec(frames=16, height=64, width=64),
        num_classes=3,
        two_stream=False,
    )
    vars_list = [bundle.init(jax.random.key(i)) for i in range(2)]
    rng = np.random.default_rng(5)
    rgb = rng.integers(0, 255, (3, 16, 64, 64, 3)).astype(np.uint8)

    class FakePipe:
        def batches(self, epoch=0):
            yield {
                "rgb": rgb,
                "label": rng.integers(0, 3, 3),
                "valid": np.ones(3, bool),
                "index": np.arange(3),
            }

    probs = member_probabilities(bundle, vars_list, FakePipe())
    assert probs.shape == (2, 3, 3)
    x = identity_resize_batch(jnp.asarray(rgb, jnp.float32), (64, 64))
    for i, v in enumerate(vars_list):
        logits = bundle.apply(v, {"rgb": x}, train=False)
        np.testing.assert_allclose(
            probs[i], np.asarray(jax.nn.softmax(logits, -1)), atol=2e-5
        )


def test_member_parallel_on_mesh():
    mesh = make_mesh((("member", 2), ("data", -1)))
    bundle = ModelBundle(
        model_type="C3D",
        module=C3D(num_classes=3),
        clip=ClipSpec(frames=16, height=32, width=32),
        num_classes=3,
        two_stream=False,
    )
    vars_list = [bundle.init(jax.random.key(i)) for i in range(2)]

    class FakePipe:
        def batches(self, epoch=0):
            rng = np.random.default_rng(0)
            yield {
                "rgb": rng.integers(0, 255, (8, 16, 32, 32, 3)).astype(np.uint8),
                "label": rng.integers(0, 3, 8),
                "valid": np.ones(8, bool),
                "index": np.arange(8),
            }

    probs = member_probabilities(bundle, vars_list, FakePipe(), mesh=mesh)
    assert probs.shape == (2, 8, 3)


def test_reference_csv_provider_interop(tmp_path):
    """A reference-format probability CSV (stringified matrices keyed by
    trained-model name) evaluates through our provider path."""
    import pandas as pd

    from crowded_scenes_ensemble_classification_tpu.core.config import (
        ExperimentConfig,
    )
    from crowded_scenes_ensemble_classification_tpu.orchestration import (
        WorkLayout,
        prob_provider_from_reference_csvs,
        reference_probabilities_csv_name,
    )

    cfg = ExperimentConfig(model_type="C3D", folds_number=3, num_classes=3)
    layout = WorkLayout(str(tmp_path))
    rng = np.random.default_rng(0)

    n = 10
    labels = rng.integers(0, 3, n)
    # split CSV with labels for fold 0 (val index 1)
    d = tmp_path / "Splits" / "split_test0_val1"
    d.mkdir(parents=True)
    pd.DataFrame({"rgbclips_path": [f"c{i}" for i in range(n)], "class": labels}).to_csv(
        d / "test.csv", index=False
    )

    # reference-format CSV: member rows for 2 members of fold 0
    rows = []
    mats = []
    for v in (1, 2):
        mat = rng.dirichlet(np.ones(3), n).astype(np.float32)
        mats.append(mat)
        rows.append(
            {
                "path": cfg.artifact_stem(0, v),
                "probabilities": repr(mat.tolist()),
            }
        )
    probs_dir = tmp_path / "Probabilities"
    probs_dir.mkdir()
    pd.DataFrame(rows).to_csv(
        probs_dir / reference_probabilities_csv_name(cfg, "test"), index=False
    )

    provider = prob_provider_from_reference_csvs(cfg, layout)
    out = provider(0, "test")
    assert out["probs"].shape == (2, n, 3)
    np.testing.assert_allclose(out["probs"][0], mats[0], atol=1e-6)
    np.testing.assert_array_equal(out["labels"], labels)

    res = evaluate_ensembles(provider, 1, "SUM", name="interop")
    assert 0.0 <= res.folds[0].accuracy <= 1.0


def test_member_forward_memoized_across_folds():
    """cache_probabilities loops over k test folds with identical shapes —
    the member forward must be built (and on TPU, compiled) once."""
    import jax

    from crowded_scenes_ensemble_classification_tpu.core.config import ClipSpec
    from crowded_scenes_ensemble_classification_tpu.ensemble import members as m
    from crowded_scenes_ensemble_classification_tpu.models import C3D
    from crowded_scenes_ensemble_classification_tpu.models.registry import (
        ModelBundle,
    )

    bundle = ModelBundle(
        model_type="C3D",
        module=C3D(num_classes=3, width=0.125),
        clip=ClipSpec(frames=16, height=32, width=32),
        num_classes=3,
        two_stream=False,
    )
    f1 = m.get_member_forward(bundle, (32, 32))
    f2 = m.get_member_forward(bundle, (32, 32))
    assert f1 is f2
    assert m.get_member_forward(bundle, (32, 32), flow_fast_warp=True) is not f1

    # and it actually runs
    stacked = m.stack_variables([bundle.init(jax.random.key(i)) for i in range(2)])
    x = np.random.default_rng(0).integers(0, 255, (2, 16, 32, 32, 3)).astype(np.uint8)
    probs = np.asarray(f1(stacked, {"rgb": x}))
    assert probs.shape == (2, 2, 3)
    np.testing.assert_allclose(probs.sum(-1), 1.0, atol=1e-4)


def test_member_forward_input_scale():
    """make_member_forward(input_scale=s) must equal scaling the pixels
    by s before an unscaled forward — members are evaluated at the scale
    they trained with (train.engine._preprocess convention; regression:
    probability caching ignored input_scale entirely)."""
    from crowded_scenes_ensemble_classification_tpu.ensemble.members import (
        make_member_forward,
        member_probabilities,
        stack_variables,
    )

    bundle = ModelBundle(
        model_type="C3D",
        module=C3D(num_classes=3, width=0.25),
        clip=ClipSpec(frames=16, height=32, width=32),
        num_classes=3,
        two_stream=False,
    )
    keys = jax.random.split(jax.random.key(7), 2)
    vars_list = [bundle.init(k) for k in keys]
    stacked = stack_variables(vars_list)

    rng = np.random.default_rng(5)
    rgb = rng.integers(0, 255, (4, 16, 32, 32, 3)).astype(np.uint8)
    scaled_fwd = make_member_forward(bundle, (32, 32), input_scale=1 / 255.0)
    plain_fwd = make_member_forward(bundle, (32, 32))
    a = np.asarray(scaled_fwd(stacked, {"rgb": jnp.asarray(rgb)}))
    b = np.asarray(
        plain_fwd(stacked, {"rgb": jnp.asarray(rgb, jnp.float32) / 255.0})
    )
    np.testing.assert_allclose(a, b, atol=1e-5)
    # and a genuinely different result from the unscaled forward
    c = np.asarray(plain_fwd(stacked, {"rgb": jnp.asarray(rgb)}))
    assert not np.allclose(a, c, atol=1e-3)

    class FakePipe:
        def batches(self, epoch=0):
            yield {
                "rgb": rgb,
                "label": np.zeros(4, np.int64),
                "valid": np.ones(4, bool),
                "index": np.arange(4),
            }

    probs = member_probabilities(
        bundle, vars_list, FakePipe(), input_scale=1 / 255.0
    )
    np.testing.assert_allclose(probs, a, atol=1e-5)
