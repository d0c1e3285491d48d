"""Independent numpy oracle for the Keras/TF1 layer semantics the models
must reproduce (SURVEY.md §7.3.2: SAME-padding asymmetry, BN eps 1e-3 with
scale=False, C3D's asymmetric zero-pad).  Guards against convention drift
without needing TensorFlow installed."""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from crowded_scenes_ensemble_classification_tpu.models.common import (
    ConvBN,
    KERAS_BN_EPS,
    max_pool_3d,
)


def same_pads(n, k, s):
    """TF SAME padding amounts for one axis."""
    out = -(-n // s)
    total = max((out - 1) * s + k - n, 0)
    return total // 2, total - total // 2


def conv3d_same_oracle(x, w, strides):
    """Naive direct conv, NTHWC × DHWIO, TF-SAME."""
    n, t, h, ww, cin = x.shape
    kt, kh, kw, _, cout = w.shape
    pt = same_pads(t, kt, strides[0])
    ph = same_pads(h, kh, strides[1])
    pw = same_pads(ww, kw, strides[2])
    xp = np.pad(x, ((0, 0), pt, ph, pw, (0, 0)))
    ot = -(-t // strides[0])
    oh = -(-h // strides[1])
    ow = -(-ww // strides[2])
    out = np.zeros((n, ot, oh, ow, cout))
    for a in range(ot):
        for b in range(oh):
            for c in range(ow):
                patch = xp[
                    :,
                    a * strides[0] : a * strides[0] + kt,
                    b * strides[1] : b * strides[1] + kh,
                    c * strides[2] : c * strides[2] + kw,
                    :,
                ]
                out[:, a, b, c, :] = np.einsum("nijkc,ijkcf->nf", patch, w)
    return out


def maxpool3d_same_oracle(x, window, strides):
    n, t, h, ww, c = x.shape
    pt = same_pads(t, window[0], strides[0])
    ph = same_pads(h, window[1], strides[1])
    pw = same_pads(ww, window[2], strides[2])
    xp = np.pad(x, ((0, 0), pt, ph, pw, (0, 0)), constant_values=-np.inf)
    ot, oh, ow = (-(-t // strides[0]), -(-h // strides[1]), -(-ww // strides[2]))
    out = np.zeros((n, ot, oh, ow, c))
    for a in range(ot):
        for b in range(oh):
            for cc in range(ow):
                patch = xp[
                    :,
                    a * strides[0] : a * strides[0] + window[0],
                    b * strides[1] : b * strides[1] + window[1],
                    cc * strides[2] : cc * strides[2] + window[2],
                    :,
                ]
                out[:, a, b, cc, :] = patch.max(axis=(1, 2, 3))
    return out


@pytest.mark.parametrize("strides", [(1, 1, 1), (2, 2, 2), (1, 2, 2)])
def test_conv_same_matches_oracle(strides, rng):
    """Odd input sizes expose the asymmetric-right-pad convention."""
    x = rng.normal(size=(1, 5, 9, 7, 2)).astype(np.float32)
    w = rng.normal(size=(3, 3, 3, 2, 4)).astype(np.float32) * 0.3
    got = np.asarray(
        jax.lax.conv_general_dilated(
            jnp.asarray(x), jnp.asarray(w), strides, "SAME",
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        )
    )
    want = conv3d_same_oracle(x, w, strides)
    np.testing.assert_allclose(got, want, atol=1e-4)


@pytest.mark.parametrize(
    "window,strides", [((3, 3, 3), (1, 1, 1)), ((1, 3, 3), (1, 2, 2)), ((2, 2, 2), (2, 2, 2))]
)
def test_maxpool_same_matches_oracle(window, strides, rng):
    x = rng.normal(size=(1, 5, 9, 7, 3)).astype(np.float32)
    got = np.asarray(max_pool_3d(jnp.asarray(x), window, strides, "SAME"))
    want = maxpool3d_same_oracle(x, window, strides)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_convbn_inference_matches_keras_formula(rng):
    """ConvBN at inference: relu((conv(x) − mean)/sqrt(var + 1e-3) + beta)
    — Keras BatchNorm(scale=False) with eps 1e-3 (reference train.py:665)."""
    x = rng.normal(size=(1, 4, 6, 6, 2)).astype(np.float32)
    m = ConvBN(3, (3, 3, 3))
    v = m.init(jax.random.key(0), jnp.asarray(x), train=False)
    # plant nontrivial BN stats
    v = jax.tree_util.tree_map(lambda a: a, v)
    stats = {
        "bn": {
            "mean": jnp.asarray(rng.normal(size=(3,)), jnp.float32),
            "var": jnp.asarray(rng.uniform(0.5, 2.0, (3,)), jnp.float32),
        }
    }
    params = dict(v["params"])
    params["bn"] = {"bias": jnp.asarray(rng.normal(size=(3,)), jnp.float32)}
    got = np.asarray(
        m.apply({"params": params, "batch_stats": stats}, jnp.asarray(x), train=False)
    )

    conv = conv3d_same_oracle(x, np.asarray(params["conv"]["kernel"]), (1, 1, 1))
    bn = (conv - np.asarray(stats["bn"]["mean"])) / np.sqrt(
        np.asarray(stats["bn"]["var"]) + KERAS_BN_EPS
    ) + np.asarray(params["bn"]["bias"])
    want = np.maximum(bn, 0.0)
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_c3d_zeropad_then_valid_pool(rng):
    """C3D's ZeroPadding3D((0,0),(0,1),(0,1)) + VALID 2³ pool
    (reference train.py:1259-1261) — verify the padded-edge behaviour."""
    x = rng.normal(size=(1, 2, 3, 3, 1)).astype(np.float32)
    xp = np.pad(x, ((0, 0), (0, 0), (0, 1), (0, 1), (0, 0)))
    got = np.asarray(
        max_pool_3d(jnp.asarray(xp), (2, 2, 2), (2, 2, 2), "VALID")
    )
    assert got.shape == (1, 1, 2, 2, 1)
    # last spatial cell pools the zero-padded corner: max(x[.,2,2], 0, ...)
    want_corner = max(float(x[0, :2, 2, 2, 0].max()), 0.0)
    np.testing.assert_allclose(got[0, 0, 1, 1, 0], want_corner, atol=1e-6)
