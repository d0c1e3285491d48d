"""int8 quantized-inference tests (beyond reference — TPU MXU int8 path).

The quantized forward (models.common.quant_conv_general) runs every conv
contraction int8×int8→int32 with per-output-channel weight scales and a
dynamic per-tensor activation scale.  On TPU v5e the MXU int8 rate is 2×
bf16; these tests pin the semantics on CPU:

1. the int8 math path is EXACT when both operands are exactly
   representable (integer-valued activations at full scale, per-channel
   integer-scaled weights);
2. the parameter tree is IDENTICAL to the f32 modules (same checkpoints
   load either way) for every architecture in the zoo;
3. on a realistic reference-layout I3D checkpoint (the same synthetic
   Keras h5 the golden-parity chain uses), the quantized softmax stays
   close to f32 and the top-1 decision is unchanged;
4. quant is inference-only: train=True raises.

Reference op being accelerated: the Conv3D inside conv3d_bn
(train.py:615-670) and the C3D/R3D convs (train.py:1224-1273, 1278-1559).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from crowded_scenes_ensemble_classification_tpu.models import build_model
from crowded_scenes_ensemble_classification_tpu.models.common import (
    ConvBN,
    quant_conv_general,
)


# ----------------------------------------------------------------------
# 1. exactness on representable operands
# ----------------------------------------------------------------------


def test_quant_conv_exact_on_representable_operands(rng):
    x = rng.integers(-127, 128, (1, 4, 8, 8, 3)).astype(np.float32)
    x.flat[0] = 127.0  # pin the dynamic scale to exactly 1.0
    # per-output-channel scales c_f on integer weights with max |w| = 127
    ints = rng.integers(-127, 128, (3, 3, 3, 3, 5)).astype(np.float32)
    ints[0, 0, 0, 0, :] = 127.0
    scales = np.array([0.25, 1.0, 3.0, 0.011, 7.5], np.float32)
    kernel = ints * scales

    got = quant_conv_general(jnp.asarray(x), jnp.asarray(kernel), (1, 1, 1), "SAME")

    # Exact int64 oracle: conv(x, ints·c) = int_conv(x, ints) · c, and the
    # integer conv is computed exactly (an f32 XLA conv would NOT do as the
    # oracle: its f32 accumulation over ±1e5-magnitude terms suffers
    # catastrophic cancellation exactly where the int32 path stays exact).
    xp = np.pad(x[0].astype(np.int64), ((1, 1), (1, 1), (1, 1), (0, 0)))
    win = np.lib.stride_tricks.sliding_window_view(xp, (3, 3, 3), axis=(0, 1, 2))
    int_conv = np.einsum(
        "dhwcijk,ijkcf->dhwf", win, ints.astype(np.int64), optimize=True
    )
    want = int_conv.astype(np.float64) * scales.astype(np.float64)

    # int32 accumulation is exact; got's only error is the f32 scale muls,
    # which are MULTIPLICATIVE on the exact integer (no cancellation), so a
    # tight rtol holds even at near-zero outputs.
    np.testing.assert_allclose(
        np.asarray(got)[0].astype(np.float64), want, rtol=3e-6
    )


# ----------------------------------------------------------------------
# 2. identical parameter trees (checkpoints interchangeable)
# ----------------------------------------------------------------------


@pytest.mark.parametrize("model_type", ["C3D", "R3D_18", "I3D", "TWOSTREAM_I3D"])
def test_quant_param_tree_identical(model_type):
    plain = build_model(model_type, num_classes=11)
    quant = build_model(model_type, num_classes=11, quant=True)

    def shapes(bundle):
        return jax.eval_shape(
            lambda k: bundle.init(k, batch_size=1), jax.random.key(0)
        )

    a, b = shapes(plain), shapes(quant)
    assert jax.tree_util.tree_structure(a) == jax.tree_util.tree_structure(b)
    for la, lb in zip(jax.tree_util.tree_leaves(a), jax.tree_util.tree_leaves(b)):
        assert la.shape == lb.shape and la.dtype == lb.dtype


# ----------------------------------------------------------------------
# 3. quantized forward stays close to f32 on a realistic checkpoint
# ----------------------------------------------------------------------


@pytest.mark.slow
def test_quant_i3d_close_to_f32_on_reference_checkpoint(tmp_path):
    from oracle_i3d import random_i3d_h5_layers

    from crowded_scenes_ensemble_classification_tpu.models import weights_io as wio
    from crowded_scenes_ensemble_classification_tpu.models.pretrained import (
        load_pretrained_variables,
    )

    layers = random_i3d_h5_layers(seed=3, num_classes=11)
    h5_path = wio.write_keras_h5(str(tmp_path / "i3d_rgb_synth.h5"), layers)

    rng = np.random.default_rng(11)
    # raw 0-255 pixel statistics, the reference's own input range
    # (train.py:283-289: no normalization anywhere)
    x = rng.uniform(0, 255, (2, 16, 32, 32, 3)).astype(np.float32)

    bundle = build_model("I3D", num_classes=11)
    fresh = bundle.module.init(jax.random.key(0), jnp.zeros_like(jnp.asarray(x)))
    variables = load_pretrained_variables("I3D", fresh, 11, rgb_h5=h5_path)

    qmodule = build_model("I3D", num_classes=11, quant=True).module

    p32 = jax.nn.softmax(bundle.module.apply(variables, jnp.asarray(x), train=False))
    p8 = jax.nn.softmax(qmodule.apply(variables, jnp.asarray(x), train=False))
    p32, p8 = np.asarray(p32), np.asarray(p8)

    assert (p32.argmax(-1) == p8.argmax(-1)).all(), "top-1 changed under int8"
    assert np.abs(p32 - p8).max() < 0.05, f"softmax drift {np.abs(p32 - p8).max()}"


@pytest.mark.parametrize("model_type", ["C3D", "R3D_18"])
def test_quant_forward_close_to_f32_small(model_type, rng):
    kwargs = {"width": 0.25} if model_type == "C3D" else {}
    plain = build_model(model_type, num_classes=5, **kwargs)
    quant = build_model(model_type, num_classes=5, quant=True, **kwargs)
    variables = plain.init(jax.random.key(2), batch_size=2)
    batch = jax.tree_util.tree_map(
        lambda b: jnp.asarray(
            rng.uniform(0, 255, b.shape).astype(np.float32)
        ),
        plain.dummy_batch(batch_size=2),
    )
    l32 = np.asarray(plain.apply(variables, batch, train=False))
    l8 = np.asarray(quant.apply(variables, batch, train=False))
    # random-init logits are O(1); int8 drift must stay well under that
    scale = max(np.abs(l32).max(), 1e-3)
    assert np.abs(l32 - l8).max() / scale < 0.15, (
        f"relative logit drift {np.abs(l32 - l8).max() / scale}"
    )


def test_quant_prestaged_stem_matches_plain_quant_stem(rng):
    """quant=True composes with stem_prestaged=True (the bench's
    amortized-staging form): the s2d rearrangement is an exact rewrite and
    zero padding cannot change max|x|, so both quantized stems see the same
    activation scale and the same int32 contraction — outputs must agree
    to f32 rounding."""
    from crowded_scenes_ensemble_classification_tpu.models.common import (
        s2d_stem_stage,
    )

    bundle = build_model("I3D", num_classes=5, quant=True)
    x = jnp.asarray(rng.uniform(0, 255, (1, 16, 32, 32, 3)).astype(np.float32))
    variables = bundle.module.init(jax.random.key(4), x, train=False)
    prestaged = bundle.module.clone(stem_prestaged=True)

    plain = bundle.module.apply(variables, x, train=False)
    staged = prestaged.apply(variables, s2d_stem_stage(x), train=False)
    np.testing.assert_allclose(
        np.asarray(plain), np.asarray(staged), rtol=1e-5, atol=1e-5
    )


# ----------------------------------------------------------------------
# 4. static calibrated int8 (VERDICT r3 #2)
# ----------------------------------------------------------------------


def test_static_single_conv_matches_dynamic_on_calibration_batch(rng):
    """For one conv, calibrating on the batch being classified makes the
    static per-tensor scale EQUAL the dynamic one (both are max|x|/127
    over the same tensor), so static and dynamic outputs must agree to
    f32 rounding; pre-baked weights (quantize_variables) must agree
    bitwise with in-graph weight quantization."""
    from crowded_scenes_ensemble_classification_tpu.models.quantize import (
        calibrate,
        quantize_variables,
    )

    x = jnp.asarray(rng.uniform(-3, 3, (2, 4, 8, 8, 3)).astype(np.float32))
    dyn = ConvBN(6, (3, 3, 3), quant=True)
    calib = ConvBN(6, (3, 3, 3), quant="calib")
    static = ConvBN(6, (3, 3, 3), quant="static")
    variables = dyn.init(jax.random.key(0), x, train=False)

    calibrated = calibrate(calib, variables, [x], train=False)
    got_dyn = np.asarray(dyn.apply(variables, x, train=False))
    got_static = np.asarray(static.apply(calibrated, x, train=False))
    np.testing.assert_allclose(got_static, got_dyn, rtol=1e-5, atol=1e-6)

    baked = quantize_variables(calibrated)
    assert baked["qparams"]["conv"]["k8"].dtype == jnp.int8
    got_baked = np.asarray(static.apply(baked, x, train=False))
    np.testing.assert_array_equal(got_baked, got_static)


def test_static_saturates_out_of_calibration_range(rng):
    """Activations beyond the calibrated abs-max clip to ±127 (standard
    static-quant semantics) instead of overflowing the int8 operand."""
    from crowded_scenes_ensemble_classification_tpu.models.quantize import calibrate

    x = jnp.asarray(rng.uniform(-1, 1, (1, 4, 8, 8, 3)).astype(np.float32))
    calib = ConvBN(4, (1, 1, 1), quant="calib", use_bn=False, use_relu=False)
    static = ConvBN(4, (1, 1, 1), quant="static", use_bn=False, use_relu=False)
    variables = calibrate(calib, calib.init(jax.random.key(1), x, train=False), [x])
    big = static.apply(variables, 10.0 * x, train=False)
    small = static.apply(variables, x, train=False)
    assert np.all(np.isfinite(np.asarray(big)))
    # saturated: scaling the input 10x moves the output by at most ~10x
    # of the unsaturated response (no int8 wraparound sign flips)
    assert np.abs(np.asarray(big)).max() <= 10.5 * np.abs(np.asarray(small)).max()


@pytest.mark.slow
def test_static_quant_i3d_close_to_f32_on_reference_checkpoint(tmp_path):
    """Model-level: calibrate → quantize_variables → static forward stays
    within the same drift gates as the dynamic path on a realistic
    reference-layout I3D checkpoint, with top-1 unchanged."""
    from oracle_i3d import random_i3d_h5_layers

    from crowded_scenes_ensemble_classification_tpu.models import weights_io as wio
    from crowded_scenes_ensemble_classification_tpu.models.pretrained import (
        load_pretrained_variables,
    )
    from crowded_scenes_ensemble_classification_tpu.models.quantize import (
        calibrate,
        calibration_summary,
        quantize_variables,
    )

    layers = random_i3d_h5_layers(seed=3, num_classes=11)
    h5_path = wio.write_keras_h5(str(tmp_path / "i3d_rgb_synth.h5"), layers)
    rng2 = np.random.default_rng(11)
    x = rng2.uniform(0, 255, (2, 16, 32, 32, 3)).astype(np.float32)

    bundle = build_model("I3D", num_classes=11)
    fresh = bundle.module.init(jax.random.key(0), jnp.zeros_like(jnp.asarray(x)))
    variables = load_pretrained_variables("I3D", fresh, 11, rgb_h5=h5_path)

    cmodule = build_model("I3D", num_classes=11, quant="calib").module
    smodule = build_model("I3D", num_classes=11, quant="static").module
    calibrated = calibrate(cmodule, variables, [jnp.asarray(x)], train=False)
    summary = calibration_summary(calibrated)
    assert len(summary) > 50 and all(v > 0 for v in summary.values())
    baked = quantize_variables(calibrated)

    p32 = jax.nn.softmax(bundle.module.apply(variables, jnp.asarray(x), train=False))
    p8 = jax.nn.softmax(smodule.apply(baked, jnp.asarray(x), train=False))
    p32, p8 = np.asarray(p32), np.asarray(p8)
    assert (p32.argmax(-1) == p8.argmax(-1)).all(), "top-1 changed under static int8"
    assert np.abs(p32 - p8).max() < 0.05, f"softmax drift {np.abs(p32 - p8).max()}"

    # held-out batch (different statistics): still finite and top-1 stable
    # vs the f32 forward on the same batch
    x2 = jnp.asarray(rng2.uniform(0, 255, (2, 16, 32, 32, 3)).astype(np.float32))
    q2 = np.asarray(jax.nn.softmax(smodule.apply(baked, x2, train=False)))
    f2 = np.asarray(jax.nn.softmax(bundle.module.apply(variables, x2, train=False)))
    assert np.all(np.isfinite(q2))
    assert (q2.argmax(-1) == f2.argmax(-1)).all()


def test_static_quant_prestaged_stem_close(rng):
    """quant='static' composes with stem_prestaged=True (the bench's
    amortized-staging form): the stem quantizes its DERIVED s2d kernel
    in-graph against its calibrated scale.  Zero padding cannot change
    max|x|, so both forms see the same activation scale; outputs agree
    to the int8 rounding of the (slightly different) conv forms."""
    from crowded_scenes_ensemble_classification_tpu.models.common import (
        s2d_stem_stage,
    )
    from crowded_scenes_ensemble_classification_tpu.models.quantize import calibrate

    x = jnp.asarray(rng.uniform(0, 255, (1, 16, 32, 32, 3)).astype(np.float32))
    cal_bundle = build_model("I3D", num_classes=5, quant="calib")
    variables = cal_bundle.module.init(jax.random.key(4), x, train=False)
    cal_prestaged = cal_bundle.module.clone(stem_prestaged=True)
    # calibrate BOTH forms so each stem variant has its scale recorded
    calibrated = calibrate(cal_bundle.module, variables, [x], train=False)
    calibrated = calibrate(
        cal_prestaged, calibrated, [s2d_stem_stage(x)], train=False
    )

    s_bundle = build_model("I3D", num_classes=5, quant="static")
    plain = s_bundle.module.apply(calibrated, x, train=False)
    staged = s_bundle.module.clone(stem_prestaged=True).apply(
        calibrated, s2d_stem_stage(x), train=False
    )
    np.testing.assert_allclose(
        np.asarray(plain), np.asarray(staged), rtol=1e-4, atol=1e-4
    )


def test_static_quant_fuse_1x1_exact(rng):
    """fuse_1x1 composes with quant='static' (InceptionBlock docstring):
    the three block-input int8 1x1x1 convs run as ONE int8 conv under
    their shared calibrated activation scale.  Because all three branches
    calibrate on the SAME block input (equal act_absmax), the fused graph
    is BIT-IDENTICAL to the unfused static path — int32 accumulation over
    a concatenated kernel equals the concatenation of the per-branch
    int32 results, and the per-channel dequant scales are unchanged."""
    from crowded_scenes_ensemble_classification_tpu.models.i3d import (
        INCEPTION_SPECS,
        InceptionBlock,
    )
    from crowded_scenes_ensemble_classification_tpu.models.quantize import (
        calibrate,
        quantize_variables,
    )

    # block level
    spec = INCEPTION_SPECS["Mixed_3b"]
    xb = jnp.asarray(rng.uniform(-3, 3, (1, 4, 8, 8, 192)).astype(np.float32))
    calib = InceptionBlock(spec, pool_impl="xla", quant="calib")
    vb = calib.init(jax.random.key(1), xb, train=False)
    baked = quantize_variables(calibrate(calib, vb, [xb], train=False))

    plain = InceptionBlock(spec, pool_impl="xla", quant="static")
    fused = InceptionBlock(spec, pool_impl="xla", quant="static", fuse_1x1=True)
    a = np.asarray(plain.apply(baked, xb, train=False))
    b = np.asarray(fused.apply(baked, xb, train=False))
    np.testing.assert_array_equal(a, b)

    # variable trees are interchangeable (same structure incl. qstats/
    # qparams collections) and the model-level forward agrees on a
    # calibrated reference-layout tree
    x = jnp.asarray(rng.uniform(0, 255, (1, 16, 32, 32, 3)).astype(np.float32))
    cmod = build_model("I3D", num_classes=5, quant="calib").module
    variables = cmod.init(jax.random.key(2), x, train=False)
    mbaked = quantize_variables(calibrate(cmod, variables, [x], train=False))
    smod = build_model("I3D", num_classes=5, quant="static").module
    sfused = build_model(
        "I3D", num_classes=5, quant="static", fuse_1x1=True
    ).module
    sa = jax.eval_shape(lambda: smod.init(jax.random.key(3), x, train=False))
    sb = jax.eval_shape(lambda: sfused.init(jax.random.key(3), x, train=False))
    assert jax.tree_util.tree_structure(sa) == jax.tree_util.tree_structure(sb)
    pa = np.asarray(smod.apply(mbaked, x, train=False))
    pb = np.asarray(sfused.apply(mbaked, x, train=False))
    np.testing.assert_array_equal(pa, pb)

    # 'calib' mode ignores fuse_1x1 (stats must record at the canonical
    # per-branch paths): calibrating through a fuse_1x1 calib module
    # yields the same stats tree
    cfused = build_model(
        "I3D", num_classes=5, quant="calib", fuse_1x1=True
    ).module
    cal_a = calibrate(cmod, variables, [x], train=False)["qstats"]
    cal_b = calibrate(cfused, variables, [x], train=False)["qstats"]
    for la, lb in zip(
        jax.tree_util.tree_leaves(cal_a), jax.tree_util.tree_leaves(cal_b)
    ):
        np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))


# ----------------------------------------------------------------------
# 5. inference-only guard
# ----------------------------------------------------------------------


def test_quant_train_raises(rng):
    module = ConvBN(4, (3, 3, 3), quant=True)
    x = jnp.asarray(rng.uniform(0, 1, (1, 4, 8, 8, 3)).astype(np.float32))
    variables = module.init(jax.random.key(0), x, train=False)
    with pytest.raises(ValueError, match="inference-only"):
        module.apply(
            variables, x, train=True, mutable=["batch_stats"]
        )


@pytest.mark.slow
def test_calibrate_members_static_probs_pipeline(tmp_path):
    """ensemble.members.calibrate_members drives the production static
    path: calibrate two members on the pipeline's first batches, bake,
    and run member_probabilities with a quant='static' bundle — top-1
    must agree with the f32 members on every clip."""
    from crowded_scenes_ensemble_classification_tpu.core.config import ClipSpec
    from crowded_scenes_ensemble_classification_tpu.data.pipeline import (
        BatchPipeline,
        SampleSpec,
    )
    from crowded_scenes_ensemble_classification_tpu.data.synthetic import (
        generate_synthetic_dataset,
    )
    from crowded_scenes_ensemble_classification_tpu.ensemble.members import (
        calibrate_members,
        member_probabilities,
    )
    from crowded_scenes_ensemble_classification_tpu.models import C3D
    from crowded_scenes_ensemble_classification_tpu.models.registry import ModelBundle

    def bundle_for(quant):
        return ModelBundle(
            model_type="C3D",
            module=C3D(num_classes=3, width=0.125, quant=quant),
            clip=ClipSpec(frames=16, height=32, width=32),
            num_classes=3,
            two_stream=False,
        )

    plain = bundle_for(False)
    members = [plain.init(jax.random.key(i)) for i in range(2)]
    df = generate_synthetic_dataset(
        str(tmp_path / "data"), num_scenes=4, clips_per_scene=2, num_classes=3,
        num_frames=16, hw=(40, 40), as_videos=False,
    ).rename(columns={"label": "class"})
    spec = SampleSpec(num_frames=16, staging_hw=(40, 40), two_stream=False)

    def pipe():
        return BatchPipeline(df, spec, batch_size=4, shuffle=False, num_workers=2)

    baked = calibrate_members(
        bundle_for("calib"), members, pipe(), input_scale=1 / 255.0
    )
    for b in baked:
        assert "qstats" in b and "qparams" in b
    p32 = member_probabilities(plain, members, pipe(), input_scale=1 / 255.0)
    p8 = member_probabilities(
        bundle_for("static"), baked, pipe(), input_scale=1 / 255.0
    )
    assert p8.shape == p32.shape == (2, len(df), 3)
    np.testing.assert_allclose(p8.sum(-1), 1.0, atol=1e-5)
    assert (p8.argmax(-1) == p32.argmax(-1)).mean() > 0.95


def test_static_quant_block_policy_mixed(rng):
    """quant_blocks (VERDICT r4 item 4): int8 restricted to named
    stem/Mixed_* sites, bf16/f32 elsewhere.  Gates: (a) calibrating with
    a policy records qstats ONLY at the policy's sites; (b) the mixed
    static forward stays within the all-int8 drift gate vs f32; (c) an
    EMPTY policy is bit-identical to the unquantized model; (d) the
    params tree is unchanged, so checkpoints load across policies."""
    from crowded_scenes_ensemble_classification_tpu.models.quantize import (
        calibrate,
        quantize_variables,
    )

    policy = ("Conv3d_1a_7x7", "Mixed_4f", "Mixed_5b", "Mixed_5c")
    x = jnp.asarray(rng.uniform(0, 255, (2, 16, 32, 32, 3)).astype(np.float32))

    plain = build_model("I3D", num_classes=5)
    variables = plain.module.init(jax.random.key(7), x, train=False)

    cmod = build_model(
        "I3D", num_classes=5, quant="calib", quant_blocks=policy
    ).module
    baked = quantize_variables(calibrate(cmod, variables, [x], train=False))
    # (a) qstats cover exactly the policy's sites
    trunk_stats = baked["qstats"]["trunk"]
    assert set(trunk_stats) == set(policy), sorted(trunk_stats)
    # params unchanged (d)
    assert jax.tree_util.tree_structure(
        baked["params"]
    ) == jax.tree_util.tree_structure(variables["params"])

    smod = build_model(
        "I3D", num_classes=5, quant="static", quant_blocks=policy
    ).module
    p32 = np.asarray(
        jax.nn.softmax(plain.module.apply(variables, x, train=False))
    )
    p8 = np.asarray(jax.nn.softmax(smod.apply(baked, x, train=False)))
    assert (p32.argmax(-1) == p8.argmax(-1)).all()
    assert np.abs(p32 - p8).max() < 0.05

    # (c) empty policy == no quant anywhere, bit-identical
    none_mod = build_model(
        "I3D", num_classes=5, quant="static", quant_blocks=()
    ).module
    p_none = np.asarray(none_mod.apply(variables, x, train=False))
    p_ref = np.asarray(plain.module.apply(variables, x, train=False))
    np.testing.assert_array_equal(p_none, p_ref)


def test_quant_blocks_production_plumbing(tmp_path, monkeypatch):
    """quant_blocks through the production surface (cli probs/ensemble →
    orchestration.cache_probabilities): policy resolution, cache-path
    qualification (differently-quantized caches must never alias), and
    the guard rails.  Cheap: probabilities_exist is stubbed True so no
    model ever runs."""
    from crowded_scenes_ensemble_classification_tpu import orchestration as orch
    from crowded_scenes_ensemble_classification_tpu.core.config import (
        ExperimentConfig,
    )
    from crowded_scenes_ensemble_classification_tpu.models.quantize import (
        MIXED_INT8_POLICY,
        resolve_quant_blocks,
    )

    # resolution rules
    assert resolve_quant_blocks(None) is None
    assert resolve_quant_blocks("all") is None
    assert resolve_quant_blocks("mixed") == MIXED_INT8_POLICY
    assert MIXED_INT8_POLICY == tuple(sorted(MIXED_INT8_POLICY))
    assert resolve_quant_blocks("Mixed_5b, Conv3d_1a_7x7") == (
        "Conv3d_1a_7x7", "Mixed_5b",
    )

    monkeypatch.setattr(orch, "probabilities_exist", lambda p: True)
    config = ExperimentConfig(model_type="I3D")
    layout = orch.WorkLayout(str(tmp_path))

    def path_for(**kw):
        return orch.cache_probabilities(config, layout, 0, "test", **kw)

    base = path_for(quant="static")
    mixed = path_for(quant="static", quant_blocks="mixed")
    custom = path_for(quant="static", quant_blocks="Mixed_5b,Mixed_5c")
    assert "_int8static_probabilities.npz" in base
    assert "_int8static-mixed_probabilities.npz" in mixed
    assert "-c2x" in custom and custom != mixed != base
    # stable across calls (no process-salted hash in the path)
    assert custom == path_for(quant="static", quant_blocks="Mixed_5c,Mixed_5b")
    # 'all' collapses to the unrestricted static path
    assert path_for(quant="static", quant_blocks="all") == base

    with pytest.raises(ValueError, match="quant='static'"):
        path_for(quant="dynamic", quant_blocks="mixed")
    c3d = ExperimentConfig(model_type="C3D")
    with pytest.raises(ValueError, match="I3D-family"):
        orch.cache_probabilities(
            c3d, layout, 0, "test", quant="static", quant_blocks="mixed"
        )
