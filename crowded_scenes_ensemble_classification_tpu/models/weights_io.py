"""Keras-HDF5 ↔ Flax weight conversion for the pretrained model families.

The reference loads pretrained checkpoints in Keras 2.2.4 HDF5 layout:
- C3D sports1M (built with 487 classes, softmax popped and replaced,
  train.py:1672-1678),
- I3D Kinetics/ImageNet h5s per stream (train.py:41-57, 808, 830-835),
- TwoStream: one h5 per stream (train.py:989-997).

Keras Conv3D kernels are (kt, kh, kw, in, out) — identical to Flax's DHWIO
for NDHWC models, so conversion is pure tree re-labelling (no transposes).
BatchNorm maps gamma/beta → scale/bias and moving_mean/variance →
batch_stats (the I3D BNs have scale=False → no gamma, train.py:665).

An exporter writes our params back into the same layout so reference
tooling can consume checkpoints trained here, and so tests can round-trip
without TensorFlow installed.
"""

from __future__ import annotations

import os
from typing import Dict, Optional, Tuple

import h5py
import numpy as np

from .i3d import INCEPTION_SPECS

# ----------------------------------------------------------------------
# Generic Keras h5 access
# ----------------------------------------------------------------------


def read_keras_h5(path: str) -> Dict[str, Dict[str, np.ndarray]]:
    """→ {layer_name: {weight_basename: array}}.  Handles both the
    `model_weights/` wrapper (full-model saves) and flat weight files, and
    strips the `:0` tensor suffixes."""
    out: Dict[str, Dict[str, np.ndarray]] = {}
    with h5py.File(path, "r") as f:
        root = f["model_weights"] if "model_weights" in f else f

        def visit(name, obj):
            if isinstance(obj, h5py.Dataset):
                parts = [p for p in name.split("/") if p]
                base = parts[-1].split(":")[0]
                layer = parts[-2] if len(parts) >= 2 else parts[0]
                out.setdefault(layer, {})[base] = np.asarray(obj)

        root.visititems(visit)
    return out


def _write_layer(root: h5py.Group, layer: str, weights: Dict[str, np.ndarray]):
    g = root.create_group(layer) if layer not in root else root[layer]
    names = []
    for base, arr in weights.items():
        full = f"{layer}/{base}:0"
        # Keras 2.x load_weights resolves g[weight_name] with the full
        # 'layer/base:0' name relative to the layer group, so the dataset
        # must live at that nested path (h5py creates the inner group).
        g.create_dataset(full, data=np.asarray(arr))
        names.append(full.encode())
    g.attrs["weight_names"] = names


def write_keras_h5(path: str, layers: Dict[str, Dict[str, np.ndarray]]) -> str:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with h5py.File(path, "w") as f:
        f.attrs["layer_names"] = [k.encode() for k in layers]
        for layer, weights in layers.items():
            _write_layer(f, layer, weights)
    return path


# ----------------------------------------------------------------------
# C3D
# ----------------------------------------------------------------------

C3D_CONV_LAYERS = ("conv1", "conv2", "conv3a", "conv3b", "conv4a", "conv4b", "conv5a", "conv5b")
C3D_DENSE_LAYERS = ("fc6", "fc7", "fc8")


def c3d_variables_from_keras(
    h5_layers: Dict[str, Dict[str, np.ndarray]],
    num_classes: Optional[int] = None,
    head_init: Optional[np.ndarray] = None,
    head_bias: Optional[np.ndarray] = None,
) -> Dict:
    """Keras C3D layers → Flax variables.  When `num_classes` differs from
    the checkpoint's fc8 width, the head is dropped and replaced (the
    reference's pop-softmax surgery, train.py:1672-1678): pass fresh
    head_init/head_bias or get zeros."""
    params: Dict = {}
    for name in C3D_CONV_LAYERS + C3D_DENSE_LAYERS:
        w = h5_layers[name]
        params[name] = {
            "kernel": np.asarray(w["kernel"], np.float32),
            "bias": np.asarray(w["bias"], np.float32),
        }
    ckpt_classes = params["fc8"]["kernel"].shape[-1]
    if num_classes is not None and num_classes != ckpt_classes:
        fan_in = params["fc8"]["kernel"].shape[0]
        if head_init is None:
            head_init = np.zeros((fan_in, num_classes), np.float32)
        if head_bias is None:
            head_bias = np.zeros((num_classes,), np.float32)
        params["fc8"] = {"kernel": head_init, "bias": head_bias}
    return {"params": params}


def c3d_variables_to_keras(variables: Dict) -> Dict[str, Dict[str, np.ndarray]]:
    params = variables["params"]
    return {
        name: {
            "kernel": np.asarray(params[name]["kernel"]),
            "bias": np.asarray(params[name]["bias"]),
        }
        for name in C3D_CONV_LAYERS + C3D_DENSE_LAYERS
    }


# ----------------------------------------------------------------------
# I3D
# ----------------------------------------------------------------------

# our trunk module name → reference Keras layer stem (suffix _rgb/_flow and
# _conv/_bn appended by conv3d_bn, train.py:646-650)
_I3D_STEM_LAYERS = {
    "Conv3d_1a_7x7": "Conv3d_1a_7x7",
    "Conv3d_2b_1x1": "Conv3d_2b_1x1",
    "Conv3d_2c_3x3": "Conv3d_2c_3x3",
}

# branch-module name → reference conv name infix per Mixed block
_BRANCH_INFIX = {
    "b0_1x1": "0a_1x1",
    "b1_1x1": "1a_1x1",
    "b1_3x3": "1b_3x3",
    "b2_1x1": "2a_1x1",
    "b2_3x3": "2b_3x3",
    "b3_1x1": "3b_1x1",
}


def _i3d_layer_map(stream_suffix: str) -> Dict[Tuple[str, ...], str]:
    """{(trunk-relative module path…): keras layer stem}."""
    mapping: Dict[Tuple[str, ...], str] = {}
    for mod, stem in _I3D_STEM_LAYERS.items():
        mapping[(mod,)] = stem + stream_suffix
    for block in INCEPTION_SPECS:
        short = block.split("_")[1]  # "3b" …
        for branch, infix in _BRANCH_INFIX.items():
            mapping[(block, branch)] = f"Conv3d_{short}_{infix}{stream_suffix}"
    return mapping


def i3d_trunk_variables_from_keras(
    h5_layers: Dict[str, Dict[str, np.ndarray]],
    stream: str = "rgb",
) -> Tuple[Dict, Dict]:
    """→ (params, batch_stats) for one I3DTrunk (module names as in i3d.py)."""
    suffix = "_" + stream
    params: Dict = {}
    stats: Dict = {}

    def put(tree, path, leaf):
        node = tree
        for k in path[:-1]:
            node = node.setdefault(k, {})
        node[path[-1]] = leaf

    for mod_path, stem in _i3d_layer_map(suffix).items():
        conv = h5_layers[stem + "_conv"]
        bn = h5_layers[stem + "_bn"]
        put(params, mod_path + ("conv",), {"kernel": np.asarray(conv["kernel"], np.float32)})
        put(
            params,
            mod_path + ("bn",),
            {"bias": np.asarray(bn["beta"], np.float32)},
        )
        put(
            stats,
            mod_path + ("bn",),
            {
                "mean": np.asarray(bn["moving_mean"], np.float32),
                "var": np.asarray(bn["moving_variance"], np.float32),
            },
        )
    return params, stats


def i3d_variables_from_keras(
    h5_layers: Dict[str, Dict[str, np.ndarray]],
    stream: str = "rgb",
    num_classes: Optional[int] = None,
) -> Dict:
    """Full single-stream I3D (trunk under 'trunk', optional 'predictions'
    Dense when the checkpoint has one and num_classes matches)."""
    params, stats = i3d_trunk_variables_from_keras(h5_layers, stream)
    variables = {"params": {"trunk": params}, "batch_stats": {"trunk": stats}}
    if "predictions" in h5_layers:
        dense = h5_layers["predictions"]
        k = np.asarray(dense["kernel"], np.float32)
        if num_classes is None or k.shape[-1] == num_classes:
            variables["params"]["predictions"] = {
                "kernel": k,
                "bias": np.asarray(dense["bias"], np.float32),
            }
    return variables


def i3d_trunk_variables_to_keras(
    params: Dict, stats: Dict, stream: str = "rgb"
) -> Dict[str, Dict[str, np.ndarray]]:
    suffix = "_" + stream
    layers: Dict[str, Dict[str, np.ndarray]] = {}

    def get(tree, path):
        node = tree
        for k in path:
            node = node[k]
        return node

    for mod_path, stem in _i3d_layer_map(suffix).items():
        conv = get(params, mod_path + ("conv",))
        bn_p = get(params, mod_path + ("bn",))
        bn_s = get(stats, mod_path + ("bn",))
        layers[stem + "_conv"] = {"kernel": np.asarray(conv["kernel"])}
        layers[stem + "_bn"] = {
            "beta": np.asarray(bn_p["bias"]),
            "moving_mean": np.asarray(bn_s["mean"]),
            "moving_variance": np.asarray(bn_s["var"]),
        }
    return layers


def i3d_variables_to_keras(variables: Dict, stream: str = "rgb") -> Dict:
    layers = i3d_trunk_variables_to_keras(
        variables["params"]["trunk"], variables["batch_stats"]["trunk"], stream
    )
    if "predictions" in variables["params"]:
        d = variables["params"]["predictions"]
        layers["predictions"] = {
            "kernel": np.asarray(d["kernel"]),
            "bias": np.asarray(d["bias"]),
        }
    return layers


def i3d_kinetics_variables_from_keras(
    h5_layers: Dict[str, Dict[str, np.ndarray]],
    stream: str = "rgb",
) -> Dict:
    """Full include_top Kinetics checkpoint → I3DKinetics variables:
    trunk + the `Conv3d_6a_1x1` 1×1×1 conv head (use_bias=True, no BN —
    reference train.py:1196-1213 via conv3d_bn)."""
    params, stats = i3d_trunk_variables_from_keras(h5_layers, stream)
    variables = {"params": {"trunk": params}, "batch_stats": {"trunk": stats}}
    head = h5_layers[f"Conv3d_6a_1x1_{stream}_conv"]
    variables["params"]["Conv3d_6a_1x1"] = {
        "conv": {
            "kernel": np.asarray(head["kernel"], np.float32),
            "bias": np.asarray(head["bias"], np.float32),
        }
    }
    return variables


def twostream_variables_from_keras(
    rgb_h5_layers: Dict, flow_h5_layers: Dict
) -> Dict:
    """Two per-stream checkpoints → TwoStreamI3D variables (trunks only;
    the fusion Dense trains fresh — reference train.py:989-1009)."""
    rgb_p, rgb_s = i3d_trunk_variables_from_keras(rgb_h5_layers, "rgb")
    flow_p, flow_s = i3d_trunk_variables_from_keras(flow_h5_layers, "flow")
    return {
        "params": {"rgb_trunk": rgb_p, "flow_trunk": flow_p},
        "batch_stats": {"rgb_trunk": rgb_s, "flow_trunk": flow_s},
    }


def merge_pretrained(init_variables: Dict, pretrained: Dict) -> Dict:
    """Overlay pretrained subtrees onto freshly-initialized variables
    (missing leaves — e.g. a new head — keep their init values)."""
    import jax

    def overlay(dst, src):
        if not isinstance(src, dict):
            return src
        out = dict(dst) if isinstance(dst, dict) else {}
        for k, v in src.items():
            out[k] = overlay(out.get(k, {}), v)
        return out

    merged = {}
    for col in init_variables:
        merged[col] = overlay(init_variables[col], pretrained.get(col, {}))
    # sanity: shapes must match where both sides define a leaf
    def check(a, b, path=""):
        if isinstance(a, dict) and isinstance(b, dict):
            for k in b:
                if k in a:
                    check(a[k], b[k], f"{path}/{k}")
        elif hasattr(a, "shape") and hasattr(b, "shape"):
            if tuple(a.shape) != tuple(b.shape):
                raise ValueError(f"shape mismatch at {path}: {a.shape} vs {b.shape}")

    for col in merged:
        check(init_variables.get(col, {}), pretrained.get(col, {}), col)
    return merged


# ----------------------------------------------------------------------
# R3D
# ----------------------------------------------------------------------


def _r3d_layer_walk(depth: int):
    """(flax module path, keras auto-name, kind) triples in the reference's
    construction order (Resnet3DBuilder.build, train.py:1483-1516).

    The reference never names its R3D layers, so Keras 2.2.4 auto-names
    them per type with fresh-session counters (conv3d_1…, 
    batch_normalization_1…, dense_1); the reference builds one model per
    process and clears the session afterwards (train.py:2050), so a
    from-scratch checkpoint it saves carries exactly these names.  Layer
    creation order per block follows basic_block/bottleneck
    (train.py:1368-1425): [preact bn] → conv(s), with the `_shortcut3d`
    projection conv created LAST (train.py:1324-1346, called after the
    residual path)."""
    from .r3d import R3D_PRESETS

    kind, reps = R3D_PRESETS[depth]
    conv_n = 0
    bn_n = 0
    entries = []

    def conv(path):
        nonlocal conv_n
        conv_n += 1
        entries.append((path, f"conv3d_{conv_n}", "conv"))

    def bn(path):
        nonlocal bn_n
        bn_n += 1
        entries.append((path, f"batch_normalization_{bn_n}", "bn"))

    conv(("conv1",))
    bn(("stem_bnrelu", "bn"))
    in_ch = 64
    for s, r in enumerate(reps):
        filters = 64 * (2**s)
        out_ch = filters * (4 if kind == "bottleneck" else 1)
        for i in range(r):
            blk = f"stage{s}_block{i}"
            first = s == 0 and i == 0
            strided = i == 0 and s != 0
            if not first:
                bn((blk, "preact1", "bn"))
            conv((blk, "conv1"))
            bn((blk, "preact2", "bn"))
            conv((blk, "conv2"))
            if kind == "bottleneck":
                bn((blk, "preact3", "bn"))
                conv((blk, "conv3"))
            if strided or in_ch != out_ch:
                conv((blk, "shortcut", "proj"))
            in_ch = out_ch
    bn(("final_bnrelu", "bn"))
    entries.append((("predictions",), "dense_1", "dense"))
    return entries


def r3d_variables_from_keras(
    h5_layers: Dict[str, Dict[str, np.ndarray]],
    depth: int,
    num_classes: Optional[int] = None,
) -> Dict:
    """Keras-layout R3D checkpoint → Flax variables ({'params', 
    'batch_stats'}).  The reference trains R3D from scratch
    (train.py:1683-1707) so no published checkpoint exists; this converter
    exists so checkpoints trained elsewhere (or the golden-parity fixtures)
    load through the same real conversion path as C3D/I3D.

    When `num_classes` differs from the checkpoint head width, the head is
    dropped (merge keeps the fresh init) — the C3D pop-softmax convention."""
    params: Dict = {}
    stats: Dict = {}

    def put(tree, path, leaf):
        node = tree
        for k in path[:-1]:
            node = node.setdefault(k, {})
        node[path[-1]] = leaf

    for path, name, kind in _r3d_layer_walk(depth):
        w = h5_layers[name]
        if kind in ("conv", "dense"):
            if kind == "dense" and num_classes is not None and (
                np.asarray(w["kernel"]).shape[-1] != num_classes
            ):
                continue
            put(params, path + ("kernel",), np.asarray(w["kernel"], np.float32))
            put(params, path + ("bias",), np.asarray(w["bias"], np.float32))
        else:  # bn: full affine (Keras BatchNormalization defaults)
            put(params, path + ("scale",), np.asarray(w["gamma"], np.float32))
            put(params, path + ("bias",), np.asarray(w["beta"], np.float32))
            put(stats, path + ("mean",), np.asarray(w["moving_mean"], np.float32))
            put(stats, path + ("var",), np.asarray(w["moving_variance"], np.float32))
    return {"params": params, "batch_stats": stats}


def r3d_variables_to_keras(variables: Dict, depth: int) -> Dict:
    """Inverse of r3d_variables_from_keras (for fixture round-trips)."""
    def get(tree, path):
        node = tree
        for k in path:
            node = node[k]
        return node

    params = variables["params"]
    stats = variables.get("batch_stats", {})
    layers: Dict = {}
    for path, name, kind in _r3d_layer_walk(depth):
        if kind in ("conv", "dense"):
            layers[name] = {
                "kernel": np.asarray(get(params, path + ("kernel",))),
                "bias": np.asarray(get(params, path + ("bias",))),
            }
        else:
            layers[name] = {
                "gamma": np.asarray(get(params, path + ("scale",))),
                "beta": np.asarray(get(params, path + ("bias",))),
                "moving_mean": np.asarray(get(stats, path + ("mean",))),
                "moving_variance": np.asarray(get(stats, path + ("var",))),
            }
    return layers
