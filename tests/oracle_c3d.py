"""Independent numpy float64 oracle of the reference C3D forward pass.

Transcribed from ConvNets3D (reference train.py:1224-1273): 8 SAME convs
with bias+ReLU, VALID max-pools (1,2,2)/(2,2,2), the asymmetric
ZeroPadding3D((0,0),(0,1),(0,1)) before pool5, Flatten, FC6/FC7 ReLU
(dropout inactive at inference), FC8 softmax.  Imports nothing from the
framework package (shares only the generic conv helper with oracle_i3d).
"""

from __future__ import annotations

import numpy as np

from oracle_i3d import _windows, conv3d_same


def maxpool3d_valid(x, window, strides):
    n, t, h, w, c = x.shape
    v = _windows(x, *window, strides)
    # _windows assumes a padded input; for VALID just trim to full windows
    return v.max(axis=(-3, -2, -1))


def conv_bias_relu(x, layers, name):
    w = np.asarray(layers[name]["kernel"], np.float64)
    b = np.asarray(layers[name]["bias"], np.float64)
    return np.maximum(conv3d_same(x, w) + b, 0.0)


def c3d_forward(layers, x, num_classes=None):
    """Full reference C3D inference; returns per-stage activations."""
    acts = {}
    x = np.asarray(x, np.float64)
    x = conv_bias_relu(x, layers, "conv1")
    x = maxpool3d_valid(x, (1, 2, 2), (1, 2, 2))
    acts["block1"] = x
    x = conv_bias_relu(x, layers, "conv2")
    x = maxpool3d_valid(x, (2, 2, 2), (2, 2, 2))
    x = conv_bias_relu(x, layers, "conv3a")
    x = conv_bias_relu(x, layers, "conv3b")
    x = maxpool3d_valid(x, (2, 2, 2), (2, 2, 2))
    x = conv_bias_relu(x, layers, "conv4a")
    x = conv_bias_relu(x, layers, "conv4b")
    x = maxpool3d_valid(x, (2, 2, 2), (2, 2, 2))
    x = conv_bias_relu(x, layers, "conv5a")
    x = conv_bias_relu(x, layers, "conv5b")
    # ZeroPadding3D(((0,0),(0,1),(0,1))) then VALID pool (train.py:1259-1261)
    x = np.pad(x, ((0, 0), (0, 0), (0, 1), (0, 1), (0, 0)))
    x = maxpool3d_valid(x, (2, 2, 2), (2, 2, 2))
    acts["trunk"] = x
    x = x.reshape(x.shape[0], -1)

    def dense(x, name, relu=True):
        w = np.asarray(layers[name]["kernel"], np.float64)
        b = np.asarray(layers[name]["bias"], np.float64)
        y = x @ w + b
        return np.maximum(y, 0.0) if relu else y

    x = dense(x, "fc6")
    x = dense(x, "fc7")
    logits = dense(x, "fc8", relu=False)
    acts["logits"] = logits
    e = np.exp(logits - logits.max(-1, keepdims=True))
    acts["softmax"] = e / e.sum(-1, keepdims=True)
    return acts


def random_c3d_h5_layers(seed=0, width=0.25, num_classes=11, fc6_in=2048):
    """Seeded reference-named C3D weights (scaled widths for test speed)."""
    rng = np.random.default_rng(seed)
    w_ = lambda f: max(int(f * width), 8)
    layers = {}

    def add_conv(name, cin, cout):
        fan = 27 * cin
        layers[name] = {
            "kernel": rng.normal(0, 1 / np.sqrt(fan), (3, 3, 3, cin, cout)).astype(
                np.float32
            ),
            "bias": rng.normal(0, 0.01, (cout,)).astype(np.float32),
        }

    widths = [
        ("conv1", 3, w_(64)), ("conv2", w_(64), w_(128)),
        ("conv3a", w_(128), w_(256)), ("conv3b", w_(256), w_(256)),
        ("conv4a", w_(256), w_(512)), ("conv4b", w_(512), w_(512)),
        ("conv5a", w_(512), w_(512)), ("conv5b", w_(512), w_(512)),
    ]
    for name, cin, cout in widths:
        add_conv(name, cin, cout)

    def add_dense(name, cin, cout):
        layers[name] = {
            "kernel": rng.normal(0, 1 / np.sqrt(cin), (cin, cout)).astype(np.float32),
            "bias": rng.normal(0, 0.01, (cout,)).astype(np.float32),
        }

    add_dense("fc6", fc6_in, w_(4096))
    add_dense("fc7", w_(4096), w_(4096))
    add_dense("fc8", w_(4096), num_classes)
    return layers
