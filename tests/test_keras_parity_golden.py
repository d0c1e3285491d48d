"""Pretrained-checkpoint parity without egress (VERDICT round-1, item 7).

Two layers of proof that real Kinetics h5s will load correctly the day
they are reachable:

1. A COMMITTED Keras-2.x-layout h5 fixture (tests/fixtures/stem_convbn.h5,
   written with raw h5py by make_stem_fixture.py) + float64 golden
   activations: the full read_keras_h5 → variable-overlay → flax forward
   chain must reproduce the frozen oracle output at 1e-6, proving the
   layer semantics the reference relies on (TF-SAME asymmetric padding,
   BN eps 1e-3 with scale=False; reference conv3d_bn train.py:615-670).

2. The FULL I3D load→forward chain: a complete reference-named synthetic
   checkpoint (every Conv3d_*/Mixed_* layer, train.py:1026-1193) written
   in Keras layout, converted by weights_io, loaded into the flax I3D —
   per-stage activations and the final softmax must match the independent
   numpy float64 oracle (tests/oracle_i3d.py), with the softmax inside the
   1e-4 north-star parity bar (BASELINE.json) and far tighter in practice.

Plus the registry/convert path: URL tables mirror train.py:41-57; the
convert CLI round-trips a reference-layout h5 into a .msgpack the trainer
can consume.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from crowded_scenes_ensemble_classification_tpu.models import weights_io as wio
from crowded_scenes_ensemble_classification_tpu.models import weights_registry as wreg

from oracle_i3d import i3d_forward, random_i3d_h5_layers

FIXTURES = os.path.join(os.path.dirname(os.path.abspath(__file__)), "fixtures")


# ----------------------------------------------------------------------
# 1. committed fixture → ConvBN forward at 1e-6
# ----------------------------------------------------------------------


def test_committed_stem_fixture_matches_golden():
    layers = wio.read_keras_h5(os.path.join(FIXTURES, "stem_convbn.h5"))
    gold = np.load(os.path.join(FIXTURES, "stem_convbn_golden.npz"))

    from crowded_scenes_ensemble_classification_tpu.models.common import ConvBN

    conv = layers["Conv3d_1a_7x7_rgb_conv"]
    bn = layers["Conv3d_1a_7x7_rgb_bn"]
    filters = conv["kernel"].shape[-1]
    module = ConvBN(filters, (7, 7, 7), strides=(2, 2, 2))
    variables = {
        "params": {
            "conv": {"kernel": jnp.asarray(conv["kernel"])},
            "bn": {"bias": jnp.asarray(bn["beta"])},
        },
        "batch_stats": {
            "bn": {
                "mean": jnp.asarray(bn["moving_mean"]),
                "var": jnp.asarray(bn["moving_variance"]),
            }
        },
    }
    out = module.apply(variables, jnp.asarray(gold["x"]), train=False)
    np.testing.assert_allclose(np.asarray(out), gold["golden"], atol=1e-6)


# ----------------------------------------------------------------------
# 2. full I3D load→forward chain vs the independent float64 oracle
# ----------------------------------------------------------------------


@pytest.mark.slow
def test_full_i3d_keras_checkpoint_forward_matches_oracle(tmp_path):
    layers = random_i3d_h5_layers(seed=3, num_classes=11)
    h5_path = wio.write_keras_h5(str(tmp_path / "i3d_rgb_synth.h5"), layers)

    # --- the real load path -------------------------------------------
    from crowded_scenes_ensemble_classification_tpu.models import build_model
    from crowded_scenes_ensemble_classification_tpu.models.pretrained import (
        load_pretrained_variables,
    )

    rng = np.random.default_rng(7)
    x = rng.uniform(-1, 1, (1, 16, 32, 32, 3)).astype(np.float32)

    # init at the oracle's clip geometry — the head fan-in follows the
    # temporal length (2048 at the reference's 20 frames, 1024 at 16)
    bundle = build_model("I3D", num_classes=11)
    fresh = bundle.module.init(jax.random.key(0), jnp.zeros_like(jnp.asarray(x)))
    variables = load_pretrained_variables("I3D", fresh, 11, rgb_h5=h5_path)

    logits, state = bundle.module.apply(
        variables,
        jnp.asarray(x),
        train=False,
        capture_intermediates=True,
        mutable=["intermediates"],
    )
    inter = state["intermediates"]["trunk"]
    softmax = np.asarray(jax.nn.softmax(logits, axis=-1))

    # --- the independent oracle ----------------------------------------
    oracle = i3d_forward(layers, x, stream="rgb", num_classes=11)

    stem = np.asarray(inter["Conv3d_1a_7x7"]["__call__"][0])
    # 2e-6: f32 forward vs f64 oracle (the committed fixture holds 1e-6 on
    # the same layer; at 131k stem elements one lands at 1.15e-6)
    np.testing.assert_allclose(stem, oracle["stem"], atol=2e-6)
    for name in ("Mixed_3b", "Mixed_4f", "Mixed_5c"):
        got = np.asarray(inter[name]["__call__"][0])
        np.testing.assert_allclose(got, oracle[name], atol=5e-6, err_msg=name)
    np.testing.assert_allclose(np.asarray(logits), oracle["logits"], atol=1e-5)
    # the BASELINE.json north-star parity bar, and the practical bound
    np.testing.assert_allclose(softmax, oracle["softmax"], atol=1e-4)
    np.testing.assert_allclose(softmax, oracle["softmax"], atol=5e-6)


# ----------------------------------------------------------------------
# registry + convert CLI
# ----------------------------------------------------------------------


def test_registry_mirrors_reference_urls():
    # exact URLs from reference train.py:44-57
    assert (
        wreg.WEIGHTS_PATH["rgb_kinetics_only"]
        == "https://github.com/dlpbc/keras-kinetics-i3d/releases/download/v0.2/"
        "rgb_inception_i3d_kinetics_only_tf_dim_ordering_tf_kernels.h5"
    )
    assert (
        wreg.WEIGHTS_PATH_NO_TOP["flow_imagenet_and_kinetics"]
        == "https://github.com/dlpbc/keras-kinetics-i3d/releases/download/v0.2/"
        "flow_inception_i3d_imagenet_and_kinetics_tf_dim_ordering_tf_kernels_no_top.h5"
    )
    assert set(wreg.WEIGHTS_NAME) == set(wreg.WEIGHTS_PATH)
    # cached names mirror train.py:775-804
    assert (
        wreg.cached_filename("rgb_kinetics_only", include_top=True)
        == "i3d_inception_rgb_kinetics_only.h5"
    )
    assert (
        wreg.cached_filename("flow_imagenet_and_kinetics", include_top=False)
        == "i3d_inception_flow_imagenet_and_kinetics_no_top.h5"
    )


def test_fetch_uses_cache_before_network(tmp_path):
    cache = tmp_path / "models"
    cache.mkdir()
    target = cache / wreg.cached_filename("rgb_kinetics_only", False)
    target.write_bytes(b"cached")
    assert wreg.fetch_weights("rgb_kinetics_only", False, str(cache)) == str(target)
    with pytest.raises(KeyError):
        wreg.fetch_weights("nope", False, str(cache))


def test_convert_cli_roundtrip(tmp_path):
    """One command converts a reference-layout h5 → .msgpack that the
    pretrained loader consumes (fine-tune-ready, no TF needed)."""
    layers = random_i3d_h5_layers(seed=5, num_classes=11)
    h5_path = wio.write_keras_h5(str(tmp_path / "rgb.h5"), layers)
    out_path = str(tmp_path / "rgb_converted.msgpack")

    from crowded_scenes_ensemble_classification_tpu.cli.main import main as cli_main

    rc = cli_main(
        ["convert", "-mt", "I3D", "--rgb-h5", h5_path, "--num-classes", "11",
         "--out", out_path]
    )
    assert rc == 0 and os.path.exists(out_path)

    from crowded_scenes_ensemble_classification_tpu.models import build_model
    from crowded_scenes_ensemble_classification_tpu.models.pretrained import (
        load_pretrained_variables,
    )

    bundle = build_model("I3D", num_classes=11)
    fresh = bundle.module.init(
        jax.random.key(0), jnp.zeros((1, 16, 32, 32, 3), jnp.float32)
    )
    via_msgpack = load_pretrained_variables("I3D", fresh, 11, rgb_h5=out_path)
    via_h5 = load_pretrained_variables("I3D", fresh, 11, rgb_h5=h5_path)

    flat_a = jax.tree_util.tree_leaves(via_msgpack)
    flat_b = jax.tree_util.tree_leaves(via_h5)
    assert len(flat_a) == len(flat_b)
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.slow
def test_i3d_kinetics_include_top_forward_matches_oracle(tmp_path):
    """The include_top Kinetics path (reference train.py:1196-1213): full
    h5 (trunk + Conv3d_6a_1x1 conv head) → i3d_kinetics_variables_from_keras
    → I3DKinetics forward at the 224² geometry the head hard-codes."""
    from oracle_i3d import i3d_kinetics_forward

    layers = random_i3d_h5_layers(seed=31, num_classes=7, include_top=True)
    h5_path = wio.write_keras_h5(str(tmp_path / "i3d_rgb_top.h5"), layers)

    from crowded_scenes_ensemble_classification_tpu.models.i3d import I3DKinetics

    read = wio.read_keras_h5(h5_path)
    variables = wio.i3d_kinetics_variables_from_keras(read, stream="rgb")

    rng = np.random.default_rng(32)
    x = rng.uniform(-1, 1, (1, 16, 224, 224, 3)).astype(np.float32)
    module = I3DKinetics(num_classes=7)
    logits = module.apply(variables, jnp.asarray(x), train=False)

    oracle_logits = i3d_kinetics_forward(layers, x, stream="rgb")
    np.testing.assert_allclose(np.asarray(logits), oracle_logits, atol=2e-5)


def test_twostream_msgpack_convert_and_load(tmp_path):
    """convert CLI for TWOSTREAM_I3D (two h5s → one msgpack with both
    trunks) and the loader consuming it."""
    rgb_layers = random_i3d_h5_layers(seed=41, stream="rgb")
    flow_layers = random_i3d_h5_layers(seed=42, stream="flow")
    rgb_layers.pop("predictions"); flow_layers.pop("predictions")
    rgb_h5 = wio.write_keras_h5(str(tmp_path / "rgb.h5"), rgb_layers)
    flow_h5 = wio.write_keras_h5(str(tmp_path / "flow.h5"), flow_layers)
    out = str(tmp_path / "ts.msgpack")

    from crowded_scenes_ensemble_classification_tpu.cli.main import main as cli_main

    rc = cli_main(["convert", "-mt", "TWOSTREAM_I3D", "--rgb-h5", rgb_h5,
                   "--flow-h5", flow_h5, "--out", out])
    assert rc == 0

    from crowded_scenes_ensemble_classification_tpu.models import TwoStreamI3D
    from crowded_scenes_ensemble_classification_tpu.models.pretrained import (
        load_pretrained_variables,
    )

    module = TwoStreamI3D(num_classes=11)
    fresh = module.init(
        jax.random.key(0), jnp.zeros((1, 16, 32, 32, 3)),
        jnp.zeros((1, 16, 32, 32, 2)),
    )
    v = load_pretrained_variables("TWOSTREAM_I3D", fresh, 11, rgb_h5=out)
    # trunk weights came from the checkpoints, head stayed fresh
    got = np.asarray(v["params"]["rgb_trunk"]["Conv3d_1a_7x7"]["conv"]["kernel"])
    np.testing.assert_array_equal(
        got, rgb_layers["Conv3d_1a_7x7_rgb_conv"]["kernel"]
    )
    got_f = np.asarray(v["params"]["flow_trunk"]["Conv3d_1a_7x7"]["conv"]["kernel"])
    np.testing.assert_array_equal(
        got_f, flow_layers["Conv3d_1a_7x7_flow_conv"]["kernel"]
    )


def test_twostream_msgpack_rejects_mixed_inputs(tmp_path):
    """ADVICE r2: a TwoStream msgpack must be the single combined file —
    mixed msgpack/h5 inputs error instead of silently half-loading."""
    import flax.serialization

    from crowded_scenes_ensemble_classification_tpu.models.pretrained import (
        load_pretrained_variables,
    )

    # an rgb-only msgpack (no flow_trunk): loading it for TWOSTREAM must fail
    rgb_only = {"params": {"rgb_trunk": {"k": np.zeros(1, np.float32)}}}
    rgb_mp = str(tmp_path / "rgb_only.msgpack")
    with open(rgb_mp, "wb") as f:
        f.write(flax.serialization.msgpack_serialize(rgb_only))
    with pytest.raises(ValueError, match="flow_trunk"):
        load_pretrained_variables("TWOSTREAM_I3D", {"params": {}}, 11, rgb_h5=rgb_mp)

    # a combined msgpack + an extra flow h5 must fail (flow would be ignored)
    combined = {
        "params": {
            "rgb_trunk": {"k": np.zeros(1, np.float32)},
            "flow_trunk": {"k": np.zeros(1, np.float32)},
        }
    }
    comb_mp = str(tmp_path / "combined.msgpack")
    with open(comb_mp, "wb") as f:
        f.write(flax.serialization.msgpack_serialize(combined))
    with pytest.raises(ValueError, match="combined"):
        load_pretrained_variables(
            "TWOSTREAM_I3D", {"params": {}}, 11, rgb_h5=comb_mp,
            flow_h5=str(tmp_path / "flow.h5"),
        )

    # a msgpack passed as flow_h5 must fail with a clear message (it used
    # to fall through to read_keras_h5 and die with an h5py error)
    with pytest.raises(ValueError, match="msgpack"):
        load_pretrained_variables(
            "TWOSTREAM_I3D", {"params": {}}, 11,
            rgb_h5=str(tmp_path / "rgb.h5"), flow_h5=comb_mp,
        )


def test_convert_include_top_routes_to_kinetics_converter(tmp_path):
    """ADVICE r2: `convert -mt I3D --include-top` must keep the Kinetics
    Conv3d_6a_1x1 head (via i3d_kinetics_variables_from_keras), not drop it."""
    layers = random_i3d_h5_layers(seed=61, num_classes=7, include_top=True)
    h5_path = wio.write_keras_h5(str(tmp_path / "i3d_top.h5"), layers)
    out = str(tmp_path / "i3d_top.msgpack")

    from crowded_scenes_ensemble_classification_tpu.cli.main import main as cli_main

    rc = cli_main(["convert", "-mt", "I3D", "--rgb-h5", h5_path,
                   "--include-top", "--out", out])
    assert rc == 0
    v = wreg.load_converted_variables(out)
    assert "Conv3d_6a_1x1" in v["params"], "Kinetics head must survive convert"
    np.testing.assert_array_equal(
        v["params"]["Conv3d_6a_1x1"]["conv"]["kernel"],
        layers["Conv3d_6a_1x1_rgb_conv"]["kernel"],
    )

    # include_top is I3D-only: C3D keeps fc8 verbatim, TwoStream loads
    # no-top trunks — reject with a clear message
    with pytest.raises(ValueError, match="include-top"):
        wreg.convert_keras_checkpoint(
            "C3D", str(tmp_path / "x.msgpack"), rgb_h5=h5_path, include_top=True
        )
