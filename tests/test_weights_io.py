"""Weight-converter tests: Keras-h5 round-trips for C3D and I3D, head
surgery, and forward-pass consistency of converted weights
(SURVEY.md §4b — golden-parity scaffolding; real reference checkpoints plug
into the same code path)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from crowded_scenes_ensemble_classification_tpu.models import C3D, I3D, TwoStreamI3D, build_model
from crowded_scenes_ensemble_classification_tpu.models import weights_io as wio


def test_c3d_keras_roundtrip(tmp_path):
    bundle = build_model("C3D", num_classes=487)
    variables = bundle.init(jax.random.key(0))
    layers = wio.c3d_variables_to_keras(variables)
    path = str(tmp_path / "c3d.h5")
    wio.write_keras_h5(path, layers)
    back = wio.read_keras_h5(path)
    restored = wio.c3d_variables_from_keras(back)
    for name in wio.C3D_CONV_LAYERS + wio.C3D_DENSE_LAYERS:
        np.testing.assert_array_equal(
            restored["params"][name]["kernel"], variables["params"][name]["kernel"]
        )

    # forward equivalence on the same input
    x = jnp.asarray(np.random.default_rng(0).normal(size=(1, 16, 112, 112, 3)), jnp.float32)
    a = bundle.module.apply(variables, x, train=False)
    b = bundle.module.apply(restored, x, train=False)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_c3d_head_surgery(tmp_path):
    """487-class sports1M checkpoint → 11-class model: trunk kept, fc8
    replaced (reference train.py:1672-1678)."""
    bundle = build_model("C3D", num_classes=487)
    variables = bundle.init(jax.random.key(0))
    path = str(tmp_path / "c3d.h5")
    wio.write_keras_h5(path, wio.c3d_variables_to_keras(variables))

    new_bundle = build_model("C3D", num_classes=11)
    fresh = new_bundle.init(jax.random.key(1))
    converted = wio.c3d_variables_from_keras(
        wio.read_keras_h5(path),
        num_classes=11,
        head_init=np.asarray(fresh["params"]["fc8"]["kernel"]),
        head_bias=np.asarray(fresh["params"]["fc8"]["bias"]),
    )
    assert converted["params"]["fc8"]["kernel"].shape == (4096, 11)
    np.testing.assert_array_equal(
        converted["params"]["conv1"]["kernel"], variables["params"]["conv1"]["kernel"]
    )
    merged = wio.merge_pretrained(fresh, converted)
    x = jnp.zeros((1, 16, 112, 112, 3))
    logits = new_bundle.module.apply(merged, x, train=False)
    assert logits.shape == (1, 11)


def test_i3d_keras_roundtrip_small(tmp_path):
    """Round-trip the full I3D variable tree through the Keras layout."""
    bundle = build_model("I3D", num_classes=5)
    # init at reduced spatial size to keep CPU cost down (params identical)
    variables = bundle.module.init(
        jax.random.key(0), jnp.zeros((1, 16, 64, 64, 3)), train=False
    )
    layers = wio.i3d_variables_to_keras(variables, stream="rgb")
    assert "Conv3d_1a_7x7_rgb_conv" in layers
    assert "Conv3d_3b_0a_1x1_rgb_bn" in layers
    path = str(tmp_path / "i3d.h5")
    wio.write_keras_h5(path, layers)
    restored = wio.i3d_variables_from_keras(
        wio.read_keras_h5(path), stream="rgb", num_classes=5
    )

    flat_a = jax.tree_util.tree_leaves(variables["params"]["trunk"])
    flat_b = jax.tree_util.tree_leaves(restored["params"]["trunk"])
    assert len(flat_a) == len(flat_b)
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # batch_stats too
    np.testing.assert_array_equal(
        np.asarray(variables["batch_stats"]["trunk"]["Conv3d_1a_7x7"]["bn"]["mean"]),
        restored["batch_stats"]["trunk"]["Conv3d_1a_7x7"]["bn"]["mean"],
    )
    # predictions dense came along
    assert "predictions" in restored["params"]


def test_twostream_from_per_stream_h5(tmp_path):
    rgb_bundle = build_model("I3D", num_classes=5)
    rgb_vars = rgb_bundle.module.init(
        jax.random.key(0), jnp.zeros((1, 16, 64, 64, 3)), train=False
    )
    flow_module = I3D(num_classes=5)
    flow_vars = flow_module.init(
        jax.random.key(1), jnp.zeros((1, 16, 64, 64, 2)), train=False
    )
    rgb_path = str(tmp_path / "rgb.h5")
    flow_path = str(tmp_path / "flow.h5")
    wio.write_keras_h5(rgb_path, wio.i3d_variables_to_keras(rgb_vars, "rgb"))
    wio.write_keras_h5(flow_path, wio.i3d_variables_to_keras(flow_vars, "flow"))

    ts = wio.twostream_variables_from_keras(
        wio.read_keras_h5(rgb_path), wio.read_keras_h5(flow_path)
    )
    assert "rgb_trunk" in ts["params"] and "flow_trunk" in ts["params"]
    # flow trunk stem must have 2 input channels
    k = ts["params"]["flow_trunk"]["Conv3d_1a_7x7"]["conv"]["kernel"]
    assert k.shape[3] == 2

    model = TwoStreamI3D(num_classes=5)
    fresh = model.init(
        jax.random.key(2),
        jnp.zeros((1, 16, 64, 64, 3)),
        jnp.zeros((1, 16, 64, 64, 2)),
        train=False,
    )
    merged = wio.merge_pretrained(fresh, ts)
    logits = model.apply(
        merged, jnp.zeros((1, 16, 64, 64, 3)), jnp.zeros((1, 16, 64, 64, 2)), train=False
    )
    assert logits.shape == (1, 5)


def test_merge_pretrained_shape_mismatch_raises():
    a = {"params": {"fc": {"kernel": np.zeros((4, 2))}}}
    b = {"params": {"fc": {"kernel": np.zeros((4, 3))}}}
    with pytest.raises(ValueError):
        wio.merge_pretrained(a, b)


def test_write_keras_h5_keras2_layout(tmp_path):
    """Keras 2.x load_weights resolves layer_group[weight_name] where
    weight_name is the full 'layer/base:0' string from the weight_names
    attr — the dataset must exist at that nested path (ADVICE r1)."""
    import h5py

    bundle = build_model("C3D", num_classes=11)
    variables = bundle.init(jax.random.key(0))
    path = str(tmp_path / "c3d.h5")
    wio.write_keras_h5(path, wio.c3d_variables_to_keras(variables))
    def _s(x):
        return x.decode() if isinstance(x, bytes) else str(x)

    with h5py.File(path, "r") as f:
        for layer in f.attrs["layer_names"]:
            g = f[_s(layer)]
            for wname in g.attrs["weight_names"]:
                # exactly what keras Network.load_weights does:
                ds = g[_s(wname)]
                assert isinstance(ds, h5py.Dataset)
