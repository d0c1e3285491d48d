"""C3D + TwoStream-I3D load→forward golden chains (extends
test_keras_parity_golden.py to the remaining pretrained families;
VERDICT round-1 item 7).

Both tests drive the REAL conversion path (write Keras-layout h5 →
read_keras_h5 → family converter → merge onto init → flax forward) and
compare against the independent float64 oracles at f32-rounding tolerances
(softmax well inside the 1e-4 BASELINE.json bar).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from crowded_scenes_ensemble_classification_tpu.models import weights_io as wio

from oracle_c3d import c3d_forward, random_c3d_h5_layers
from oracle_i3d import i3d_forward, random_i3d_h5_layers


@pytest.mark.slow
def test_full_c3d_keras_checkpoint_forward_matches_oracle(tmp_path):
    """Reference C3D geometry (16×112×112, train.py:1593-1601) at
    width=0.25; exercises SAME convs with bias, VALID pools, the
    zeropad5 quirk (train.py:1259-1261) and the FC stack."""
    width = 0.25
    layers = random_c3d_h5_layers(seed=11, width=width, num_classes=11, fc6_in=2048)
    h5_path = wio.write_keras_h5(str(tmp_path / "c3d_synth.h5"), layers)

    from crowded_scenes_ensemble_classification_tpu.models import C3D
    from crowded_scenes_ensemble_classification_tpu.models.pretrained import (
        load_pretrained_variables,
    )

    rng = np.random.default_rng(12)
    x = rng.uniform(0, 1, (1, 16, 112, 112, 3)).astype(np.float32)

    module = C3D(num_classes=11, width=width)
    fresh = module.init(jax.random.key(0), jnp.zeros_like(jnp.asarray(x)))
    variables = load_pretrained_variables("C3D", fresh, 11, rgb_h5=h5_path)

    logits = module.apply(variables, jnp.asarray(x), train=False)
    softmax = np.asarray(jax.nn.softmax(logits, -1))

    oracle = c3d_forward(layers, x)
    np.testing.assert_allclose(np.asarray(logits), oracle["logits"], atol=2e-5)
    np.testing.assert_allclose(softmax, oracle["softmax"], atol=1e-4)
    np.testing.assert_allclose(softmax, oracle["softmax"], atol=5e-6)


@pytest.mark.slow
def test_full_twostream_keras_checkpoints_forward_matches_oracle(tmp_path):
    """Two per-stream synthetic Kinetics checkpoints → twostream converter
    (fusion Dense stays fresh, reference train.py:989-1009) → forward
    matches concat(features_rgb, features_flow) @ the model's own head."""
    rgb_layers = random_i3d_h5_layers(seed=21, stream="rgb", num_classes=11)
    flow_layers = random_i3d_h5_layers(seed=22, stream="flow", num_classes=11)
    # converter ignores stream heads for TwoStream — drop to mirror no_top
    rgb_layers.pop("predictions")
    flow_layers.pop("predictions")
    rgb_h5 = wio.write_keras_h5(str(tmp_path / "rgb.h5"), rgb_layers)
    flow_h5 = wio.write_keras_h5(str(tmp_path / "flow.h5"), flow_layers)

    from crowded_scenes_ensemble_classification_tpu.models import TwoStreamI3D
    from crowded_scenes_ensemble_classification_tpu.models.pretrained import (
        load_pretrained_variables,
    )

    rng = np.random.default_rng(23)
    rgb = rng.uniform(-1, 1, (1, 16, 32, 32, 3)).astype(np.float32)
    flow = rng.uniform(-1, 1, (1, 16, 32, 32, 2)).astype(np.float32)

    module = TwoStreamI3D(num_classes=11)
    fresh = module.init(
        jax.random.key(0), jnp.zeros_like(jnp.asarray(rgb)),
        jnp.zeros_like(jnp.asarray(flow)),
    )
    variables = load_pretrained_variables(
        "TWOSTREAM_I3D", fresh, 11, rgb_h5=rgb_h5, flow_h5=flow_h5
    )
    logits = module.apply(
        variables, jnp.asarray(rgb), jnp.asarray(flow), train=False
    )

    # oracle: per-stream trunk features + the model's OWN fresh fusion head
    feats_rgb = i3d_forward({**rgb_layers, "predictions": {"kernel": np.zeros((1024, 11), np.float32), "bias": np.zeros(11, np.float32)}}, rgb, stream="rgb")["features"]
    feats_flow = i3d_forward({**flow_layers, "predictions": {"kernel": np.zeros((1024, 11), np.float32), "bias": np.zeros(11, np.float32)}}, flow, stream="flow")["features"]
    feats = np.concatenate([feats_rgb, feats_flow], -1)
    head_w = np.asarray(variables["params"]["predictions"]["kernel"], np.float64)
    head_b = np.asarray(variables["params"]["predictions"]["bias"], np.float64)
    oracle_logits = feats @ head_w + head_b

    np.testing.assert_allclose(np.asarray(logits), oracle_logits, atol=2e-5)
    sm = np.asarray(jax.nn.softmax(logits, -1))
    e = np.exp(oracle_logits - oracle_logits.max(-1, keepdims=True))
    np.testing.assert_allclose(sm, e / e.sum(-1, keepdims=True), atol=5e-6)
