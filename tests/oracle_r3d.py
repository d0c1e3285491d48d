"""Independent numpy (float64) oracle of the reference R3D forward pass.

Like oracle_i3d/oracle_c3d, this module imports NOTHING from the framework
package: the graph topology, Keras auto-naming and layer semantics are
transcribed directly from the reference keras-resnet3d port
(train.py:1278-1559) — pre-activation `bn→relu→conv` blocks
(`_bn_relu_conv3d` train.py:1303-1322), the `_shortcut3d` projection with
ceil-shape-ratio strides and a VALID 1×1×1 conv (train.py:1324-1346),
basic (train.py:1368-1393) and bottleneck (train.py:1396-1425) blocks, and
the Resnet3DBuilder stem/stage/head layout (train.py:1483-1516).  Keras
BatchNormalization here is FULL affine (gamma+beta, eps 1e-3), unlike
I3D's scale=False conv3d_bn.

Keras layer names: the reference never names R3D layers, so Keras 2.2.4
auto-names them per type in creation order from a fresh session
(conv3d_1…, batch_normalization_1…, dense_1); the `_shortcut3d`
projection conv is created AFTER the residual-path convs of its block.
"""

from __future__ import annotations

import math

import numpy as np

from oracle_i3d import avgpool3d_valid, conv3d_same, maxpool3d_same

BN_EPS = 1e-3

# depth → (block kind, repetitions): Resnet3DBuilder presets
# (train.py:1526-1559)
PRESETS = {
    18: ("basic", (2, 2, 2, 2)),
    34: ("basic", (3, 4, 6, 3)),
    50: ("bottleneck", (3, 4, 6, 3)),
    101: ("bottleneck", (3, 4, 23, 3)),
    152: ("bottleneck", (3, 8, 36, 3)),
}


def _block_descs(depth: int):
    """Per-block static description in builder order (train.py:1491-1500)."""
    kind, reps = PRESETS[depth]
    descs = []
    in_ch = 64
    for s, r in enumerate(reps):
        filters = 64 * (2**s)
        out_ch = filters * (4 if kind == "bottleneck" else 1)
        for i in range(r):
            strides = (2, 2, 2) if (i == 0 and s != 0) else (1, 1, 1)
            descs.append(
                dict(
                    kind=kind,
                    filters=filters,
                    strides=strides,
                    first=(s == 0 and i == 0),
                    in_ch=in_ch,
                    out_ch=out_ch,
                    # projection on stride OR channel mismatch
                    # (train.py:1337-1346)
                    has_proj=(strides != (1, 1, 1)) or (in_ch != out_ch),
                )
            )
            in_ch = out_ch
    return descs, in_ch


class _Names:
    """Keras 2.2.4 fresh-session auto-naming counters."""

    def __init__(self):
        self.conv = 0
        self.bn = 0

    def next_conv(self):
        self.conv += 1
        return f"conv3d_{self.conv}"

    def next_bn(self):
        self.bn += 1
        return f"batch_normalization_{self.bn}"


def bn_affine(x, layer):
    """Keras BatchNormalization inference, full affine, eps 1e-3."""
    gamma = np.asarray(layer["gamma"], np.float64)
    beta = np.asarray(layer["beta"], np.float64)
    mean = np.asarray(layer["moving_mean"], np.float64)
    var = np.asarray(layer["moving_variance"], np.float64)
    return (x - mean) / np.sqrt(var + BN_EPS) * gamma + beta


def bn_relu(x, layer):
    """`_bn_relu` (train.py:1278-1281)."""
    return np.maximum(bn_affine(x, layer), 0.0)


def conv_bias_same(x, layer, strides=(1, 1, 1)):
    """Keras Conv3D SAME with bias (R3D convs keep the default use_bias)."""
    w = np.asarray(layer["kernel"], np.float64)
    b = np.asarray(layer["bias"], np.float64)
    return conv3d_same(x, w, strides) + b


def shortcut3d(x, residual, layers, names):
    """`_shortcut3d` (train.py:1324-1346): identity, or VALID 1×1×1
    projection conv with ceil-shape-ratio strides, then sum."""
    strides = tuple(
        math.ceil(int(x.shape[i]) / int(residual.shape[i])) for i in (1, 2, 3)
    )
    if any(s > 1 for s in strides) or x.shape[-1] != residual.shape[-1]:
        layer = layers[names.next_conv()]
        w = np.asarray(layer["kernel"], np.float64)[0, 0, 0]  # (cin, cout)
        b = np.asarray(layer["bias"], np.float64)
        x = x[:, :: strides[0], :: strides[1], :: strides[2]] @ w + b
    return x + residual


def basic_block(x, layers, names, desc):
    """train.py:1368-1393."""
    if desc["first"]:
        y = conv_bias_same(x, layers[names.next_conv()], desc["strides"])
    else:
        y = bn_relu(x, layers[names.next_bn()])
        y = conv_bias_same(y, layers[names.next_conv()], desc["strides"])
    y = bn_relu(y, layers[names.next_bn()])
    y = conv_bias_same(y, layers[names.next_conv()])
    return shortcut3d(x, y, layers, names)


def bottleneck_block(x, layers, names, desc):
    """train.py:1396-1425."""
    if desc["first"]:
        y = conv_bias_same(x, layers[names.next_conv()], desc["strides"])
    else:
        y = bn_relu(x, layers[names.next_bn()])
        y = conv_bias_same(y, layers[names.next_conv()], desc["strides"])
    y = bn_relu(y, layers[names.next_bn()])
    y = conv_bias_same(y, layers[names.next_conv()])
    y = bn_relu(y, layers[names.next_bn()])
    y = conv_bias_same(y, layers[names.next_conv()])
    return shortcut3d(x, y, layers, names)


def r3d_forward(layers, x, depth: int):
    """Full reference R3D forward (Resnet3DBuilder.build, train.py:1483-
    1516).  Returns per-stage activations incl. logits and softmax."""
    acts = {}
    names = _Names()
    x = np.asarray(x, np.float64)
    # stem: conv7³/2 SAME + bias → bn → relu → maxpool 3³/2 SAME
    x = conv_bias_same(x, layers[names.next_conv()], (2, 2, 2))
    x = bn_relu(x, layers[names.next_bn()])
    x = maxpool3d_same(x, (3, 3, 3), (2, 2, 2))
    acts["stem"] = x

    descs, final_ch = _block_descs(depth)
    for j, desc in enumerate(descs):
        fn = basic_block if desc["kind"] == "basic" else bottleneck_block
        x = fn(x, layers, names, desc)
        acts[f"block{j}"] = x

    x = bn_relu(x, layers[names.next_bn()])
    # full-volume average pool (train.py:1502-1507), VALID
    x = avgpool3d_valid(x, (x.shape[1], x.shape[2], x.shape[3]))
    feats = x.reshape(x.shape[0], -1)
    acts["features"] = feats
    dense = layers["dense_1"]
    logits = feats @ np.asarray(dense["kernel"], np.float64) + np.asarray(
        dense["bias"], np.float64
    )
    acts["logits"] = logits
    e = np.exp(logits - logits.max(axis=-1, keepdims=True))
    acts["softmax"] = e / e.sum(axis=-1, keepdims=True)
    return acts


# ----------------------------------------------------------------------
# Synthetic reference-layout checkpoint generation (for golden fixtures)
# ----------------------------------------------------------------------


def random_r3d_h5_layers(seed: int = 0, depth: int = 18, num_classes: int = 11):
    """Seeded random weights for every reference R3D layer, keyed by the
    Keras 2.2.4 auto-names, in the layer-dict layout weights_io.read_keras_h5
    returns."""
    rng = np.random.default_rng(seed)
    layers = {}
    names = _Names()

    def add_conv(kt, kh, kw, cin, cout):
        fan_in = kt * kh * kw * cin
        layers[names.next_conv()] = {
            "kernel": rng.normal(0, 1 / np.sqrt(fan_in), (kt, kh, kw, cin, cout)).astype(
                np.float32
            ),
            "bias": rng.normal(0, 0.01, (cout,)).astype(np.float32),
        }

    def add_bn(c):
        layers[names.next_bn()] = {
            "gamma": rng.uniform(0.8, 1.2, (c,)).astype(np.float32),
            "beta": rng.normal(0, 0.1, (c,)).astype(np.float32),
            "moving_mean": rng.normal(0, 0.05, (c,)).astype(np.float32),
            "moving_variance": rng.uniform(0.8, 1.2, (c,)).astype(np.float32),
        }

    add_conv(7, 7, 7, 3, 64)
    add_bn(64)
    descs, final_ch = _block_descs(depth)
    for desc in descs:
        f, in_ch, out_ch = desc["filters"], desc["in_ch"], desc["out_ch"]
        if desc["kind"] == "basic":
            if not desc["first"]:
                add_bn(in_ch)
            add_conv(3, 3, 3, in_ch, f)
            add_bn(f)
            add_conv(3, 3, 3, f, f)
        else:
            if not desc["first"]:
                add_bn(in_ch)
            add_conv(1, 1, 1, in_ch, f)
            add_bn(f)
            add_conv(3, 3, 3, f, f)
            add_bn(f)
            add_conv(1, 1, 1, f, 4 * f)
        if desc["has_proj"]:
            add_conv(1, 1, 1, in_ch, out_ch)
    add_bn(final_ch)
    layers["dense_1"] = {
        "kernel": rng.normal(0, 1 / np.sqrt(final_ch), (final_ch, num_classes)).astype(
            np.float32
        ),
        "bias": rng.normal(0, 0.01, (num_classes,)).astype(np.float32),
    }
    return layers
