"""Independent numpy (float64) oracle of the reference I3D forward pass.

This module deliberately imports NOTHING from the framework package: layer
names, graph topology, and layer semantics are transcribed directly from
the reference (train.py:1026-1217 — Inception_Inflated3d; conv3d_bn at
train.py:615-670: Conv3D no-bias + BatchNorm(eps 1e-3, scale=False) + ReLU,
TF-SAME padding) so that the load→forward golden test cross-checks both the
h5 converter's name mapping and the model's math against a second,
hand-written implementation.
"""

from __future__ import annotations

import numpy as np

BN_EPS = 1e-3

# (b0_1x1, b1_1x1, b1_3x3, b2_1x1, b2_3x3, b3_1x1) widths per Mixed block
# (reference train.py:1048-1193).
MIXED_SPECS = {
    "3b": (64, 96, 128, 16, 32, 32),
    "3c": (128, 128, 192, 32, 96, 64),
    "4b": (192, 96, 208, 16, 48, 64),
    "4c": (160, 112, 224, 24, 64, 64),
    "4d": (128, 128, 256, 24, 64, 64),
    "4e": (112, 144, 288, 32, 64, 64),
    "4f": (256, 160, 320, 32, 128, 128),
    "5b": (256, 160, 320, 32, 128, 128),
    "5c": (384, 192, 384, 48, 128, 128),
}

# branch conv-name infixes as conv3d_bn names them (train.py:1048-1193)
BRANCH_INFIXES = ("0a_1x1", "1a_1x1", "1b_3x3", "2a_1x1", "2b_3x3", "3b_1x1")


def same_pads(n: int, k: int, s: int):
    out = -(-n // s)
    total = max((out - 1) * s + k - n, 0)
    return total // 2, total - total // 2


def _windows(xp: np.ndarray, kt: int, kh: int, kw: int, strides):
    """(N, T', H', W', C, kt, kh, kw) strided view of padded NTHWC input."""
    v = np.lib.stride_tricks.sliding_window_view(xp, (kt, kh, kw), axis=(1, 2, 3))
    return v[:, :: strides[0], :: strides[1], :: strides[2]]


def conv3d_same(x: np.ndarray, w: np.ndarray, strides=(1, 1, 1)) -> np.ndarray:
    """TF-SAME Conv3D, NTHWC × (kt, kh, kw, cin, cout), no bias."""
    n, t, h, ww, cin = x.shape
    kt, kh, kw, _, cout = w.shape
    xp = np.pad(
        x,
        (
            (0, 0),
            same_pads(t, kt, strides[0]),
            same_pads(h, kh, strides[1]),
            same_pads(ww, kw, strides[2]),
            (0, 0),
        ),
    )
    v = _windows(xp, kt, kh, kw, strides)
    return np.einsum("nthwcijk,ijkcf->nthwf", v, w, optimize=True)


def bn_infer(x, beta, mean, var):
    """Keras BatchNorm inference, scale=False (gamma≡1), eps 1e-3
    (train.py:661-668)."""
    return (x - mean) / np.sqrt(var + BN_EPS) + beta


def conv_bn_relu(x, layers, name, strides=(1, 1, 1)):
    """conv3d_bn (train.py:615-670): conv (no bias) → BN → ReLU."""
    w = np.asarray(layers[name + "_conv"]["kernel"], np.float64)
    bn = layers[name + "_bn"]
    y = conv3d_same(x, w, strides)
    y = bn_infer(
        y,
        np.asarray(bn["beta"], np.float64),
        np.asarray(bn["moving_mean"], np.float64),
        np.asarray(bn["moving_variance"], np.float64),
    )
    return np.maximum(y, 0.0)


def maxpool3d_same(x, window, strides):
    n, t, h, ww, c = x.shape
    xp = np.pad(
        x,
        (
            (0, 0),
            same_pads(t, window[0], strides[0]),
            same_pads(h, window[1], strides[1]),
            same_pads(ww, window[2], strides[2]),
            (0, 0),
        ),
        constant_values=-np.inf,
    )
    v = _windows(xp, *window, strides)
    return v.max(axis=(-3, -2, -1))


def avgpool3d_valid(x, window):
    v = _windows(x, *window, (1, 1, 1))
    return v.mean(axis=(-3, -2, -1))


def mixed_block(x, layers, short: str, stream: str):
    """One Mixed_* block: 4 branches concatenated on channels
    (train.py:1048-1073 pattern, repeated per block)."""
    nm = lambda infix: f"Conv3d_{short}_{infix}_{stream}"
    b0 = conv_bn_relu(x, layers, nm("0a_1x1"))
    b1 = conv_bn_relu(x, layers, nm("1a_1x1"))
    b1 = conv_bn_relu(b1, layers, nm("1b_3x3"))
    b2 = conv_bn_relu(x, layers, nm("2a_1x1"))
    b2 = conv_bn_relu(b2, layers, nm("2b_3x3"))
    b3 = maxpool3d_same(x, (3, 3, 3), (1, 1, 1))
    b3 = conv_bn_relu(b3, layers, nm("3b_1x1"))
    return np.concatenate([b0, b1, b2, b3], axis=-1)


def i3d_forward(layers, x, stream: str = "rgb", num_classes: int = 11):
    """Full reference I3D forward (include_top=False trunk,
    train.py:1026-1193, + the Crowd-11 head: AvgPool3D((2,h,w)) → Flatten →
    Dense softmax, train.py:824-841).  Returns per-stage activations."""
    acts = {}
    x = np.asarray(x, np.float64)
    x = conv_bn_relu(x, layers, f"Conv3d_1a_7x7_{stream}", strides=(2, 2, 2))
    acts["stem"] = x
    x = maxpool3d_same(x, (1, 3, 3), (1, 2, 2))
    x = conv_bn_relu(x, layers, f"Conv3d_2b_1x1_{stream}")
    x = conv_bn_relu(x, layers, f"Conv3d_2c_3x3_{stream}")
    x = maxpool3d_same(x, (1, 3, 3), (1, 2, 2))
    acts["pre_mixed"] = x

    for short in ("3b", "3c"):
        x = mixed_block(x, layers, short, stream)
        acts[f"Mixed_{short}"] = x
    x = maxpool3d_same(x, (3, 3, 3), (2, 2, 2))
    for short in ("4b", "4c", "4d", "4e", "4f"):
        x = mixed_block(x, layers, short, stream)
        acts[f"Mixed_{short}"] = x
    x = maxpool3d_same(x, (2, 2, 2), (2, 2, 2))
    for short in ("5b", "5c"):
        x = mixed_block(x, layers, short, stream)
        acts[f"Mixed_{short}"] = x

    h, w = x.shape[2], x.shape[3]
    x = avgpool3d_valid(x, (2, h, w))
    feats = x.reshape(x.shape[0], -1)
    acts["features"] = feats
    dense = layers["predictions"]
    logits = feats @ np.asarray(dense["kernel"], np.float64) + np.asarray(
        dense["bias"], np.float64
    )
    acts["logits"] = logits
    e = np.exp(logits - logits.max(axis=-1, keepdims=True))
    acts["softmax"] = e / e.sum(axis=-1, keepdims=True)
    return acts


def i3d_kinetics_forward(layers, x, stream: str = "rgb"):
    """include_top=True Kinetics head (reference train.py:1196-1213):
    trunk → AvgPool3D((2,7,7)) VALID → 1×1×1 conv WITH bias (no BN/ReLU)
    → squeeze spatial → mean over remaining frames = logits."""
    dummy = dict(layers)
    dummy["predictions"] = {
        "kernel": np.zeros((1024, 1), np.float64),
        "bias": np.zeros((1,), np.float64),
    }
    acts = i3d_forward(dummy, x, stream=stream)
    feat = acts["Mixed_5c"]
    p = avgpool3d_valid(feat, (2, 7, 7))  # (N, T'-1, h-6, w-6, 1024)
    head = layers[f"Conv3d_6a_1x1_{stream}_conv"]
    k = np.asarray(head["kernel"], np.float64)[0, 0, 0]  # (1024, C)
    b = np.asarray(head["bias"], np.float64)
    y = p @ k + b  # (N, T'', h', w', C)
    y = y.reshape(y.shape[0], y.shape[1], -1, y.shape[-1]).mean(2)  # spatial
    return y.mean(1)  # temporal mean → logits


# ----------------------------------------------------------------------
# Synthetic reference-layout checkpoint generation (for golden fixtures)
# ----------------------------------------------------------------------


def random_i3d_h5_layers(
    seed: int = 0,
    stream: str = "rgb",
    num_classes: int = 11,
    include_top: bool = False,
):
    """Seeded random weights for every reference I3D layer, in the Keras h5
    layer-dict layout that weights_io.read_keras_h5 returns."""
    rng = np.random.default_rng(seed)
    layers = {}

    def add_conv_bn(name, kt, kh, kw, cin, cout):
        fan_in = kt * kh * kw * cin
        layers[name + "_conv"] = {
            "kernel": rng.normal(0, 1 / np.sqrt(fan_in), (kt, kh, kw, cin, cout)).astype(
                np.float32
            )
        }
        layers[name + "_bn"] = {
            "beta": rng.normal(0, 0.1, (cout,)).astype(np.float32),
            "moving_mean": rng.normal(0, 0.05, (cout,)).astype(np.float32),
            "moving_variance": rng.uniform(0.8, 1.2, (cout,)).astype(np.float32),
        }

    add_conv_bn(f"Conv3d_1a_7x7_{stream}", 7, 7, 7, 3 if stream == "rgb" else 2, 64)
    add_conv_bn(f"Conv3d_2b_1x1_{stream}", 1, 1, 1, 64, 64)
    add_conv_bn(f"Conv3d_2c_3x3_{stream}", 3, 3, 3, 64, 192)

    cin = 192
    for short, (b0, b1r, b1, b2r, b2, b3) in MIXED_SPECS.items():
        nm = lambda infix: f"Conv3d_{short}_{infix}_{stream}"
        add_conv_bn(nm("0a_1x1"), 1, 1, 1, cin, b0)
        add_conv_bn(nm("1a_1x1"), 1, 1, 1, cin, b1r)
        add_conv_bn(nm("1b_3x3"), 3, 3, 3, b1r, b1)
        add_conv_bn(nm("2a_1x1"), 1, 1, 1, cin, b2r)
        add_conv_bn(nm("2b_3x3"), 3, 3, 3, b2r, b2)
        add_conv_bn(nm("3b_1x1"), 1, 1, 1, cin, b3)
        cin = b0 + b1 + b2 + b3

    if include_top:
        # the Kinetics 1×1×1 conv head (use_bias, no BN — train.py:1196-1213)
        layers[f"Conv3d_6a_1x1_{stream}_conv"] = {
            "kernel": rng.normal(
                0, 1 / np.sqrt(cin), (1, 1, 1, cin, num_classes)
            ).astype(np.float32),
            "bias": rng.normal(0, 0.01, (num_classes,)).astype(np.float32),
        }
    else:
        layers["predictions"] = {
            "kernel": rng.normal(0, 1 / np.sqrt(cin), (cin, num_classes)).astype(
                np.float32
            ),
            "bias": rng.normal(0, 0.01, (num_classes,)).astype(np.float32),
        }
    return layers
