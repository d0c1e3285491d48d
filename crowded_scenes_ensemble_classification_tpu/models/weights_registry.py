"""Pretrained-weight registry + download/convert path.

Mirrors the reference's weight-acquisition machinery:
- the I3D Kinetics/ImageNet URL tables WEIGHTS_PATH / WEIGHTS_PATH_NO_TOP
  (reference train.py:41-57) and per-variant cached filenames
  (train.py:775-804, 941-962),
- Keras's ``get_file(model_name, weights_url, cache_subdir='models')``
  download-into-cache behaviour (train.py:808, 964-965),
- the C3D sports1M local checkpoint path (train.py:1673).

This environment has no network egress, so ``fetch_weights`` resolves from
the local cache first and only then attempts a download; conversion from a
fetched/local Keras h5 into framework variables is one call
(``convert_keras_checkpoint``) or one CLI command (``... convert``).
"""

from __future__ import annotations

import os
from typing import Dict, Optional, Tuple

WEIGHTS_NAME = (
    "rgb_kinetics_only",
    "flow_kinetics_only",
    "rgb_imagenet_and_kinetics",
    "flow_imagenet_and_kinetics",
)

_RELEASE = "https://github.com/dlpbc/keras-kinetics-i3d/releases/download/v0.2"

# with classification top (reference train.py:44-49)
WEIGHTS_PATH = {
    "rgb_kinetics_only": f"{_RELEASE}/rgb_inception_i3d_kinetics_only_tf_dim_ordering_tf_kernels.h5",
    "flow_kinetics_only": f"{_RELEASE}/flow_inception_i3d_kinetics_only_tf_dim_ordering_tf_kernels.h5",
    "rgb_imagenet_and_kinetics": f"{_RELEASE}/rgb_inception_i3d_imagenet_and_kinetics_tf_dim_ordering_tf_kernels.h5",
    "flow_imagenet_and_kinetics": f"{_RELEASE}/flow_inception_i3d_imagenet_and_kinetics_tf_dim_ordering_tf_kernels.h5",
}

# no top (reference train.py:52-57) — what the Crowd-11 fine-tune loads
WEIGHTS_PATH_NO_TOP = {
    name: url.replace("_tf_kernels.h5", "_tf_kernels_no_top.h5")
    for name, url in WEIGHTS_PATH.items()
}

# cached file names, as the reference passes to get_file (train.py:775-804)
def cached_filename(name: str, include_top: bool) -> str:
    suffix = "" if include_top else "_no_top"
    return f"i3d_inception_{name}{suffix}.h5"


# C3D sports1M checkpoint: the reference expects a local file
# (train.py:1673) — no published URL; record the expected name.
SPORTS1M_FILENAME = "sports1M_weights_tf.h5"


def default_cache_dir() -> str:
    """~/.keras/models analogue (reference get_file cache_subdir='models')."""
    return os.environ.get(
        "CROWDED_SCENES_TPU_WEIGHTS_CACHE",
        os.path.join(os.path.expanduser("~"), ".cache", "crowded_scenes_tpu", "models"),
    )


def fetch_weights(
    name: str,
    include_top: bool = False,
    cache_dir: Optional[str] = None,
) -> str:
    """Resolve (and if necessary download) a registry checkpoint.

    Returns the local h5 path.  Raises KeyError for unknown names and
    RuntimeError when the file is absent and the download fails (e.g. in a
    zero-egress environment).
    """
    if name not in WEIGHTS_NAME:
        raise KeyError(f"unknown weights name {name!r}; known: {WEIGHTS_NAME}")
    cache_dir = cache_dir or default_cache_dir()
    path = os.path.join(cache_dir, cached_filename(name, include_top))
    if os.path.exists(path):
        return path
    url = (WEIGHTS_PATH if include_top else WEIGHTS_PATH_NO_TOP)[name]
    os.makedirs(cache_dir, exist_ok=True)
    tmp = path + ".download"
    try:
        import shutil
        import urllib.request

        # explicit timeout: in an egress-less environment urlretrieve would
        # block forever instead of raising
        with urllib.request.urlopen(url, timeout=60) as r, open(tmp, "wb") as f:  # noqa: S310
            shutil.copyfileobj(r, f)
        os.replace(tmp, path)
    except Exception as e:  # pragma: no cover — network-dependent
        if os.path.exists(tmp):
            os.remove(tmp)
        raise RuntimeError(
            f"could not download {url} (no network egress?). Place the file "
            f"manually at {path} and re-run."
        ) from e
    return path


# ----------------------------------------------------------------------
# One-call conversion: Keras h5 → framework variables file
# ----------------------------------------------------------------------


def convert_keras_checkpoint(
    model_type: str,
    out_path: str,
    rgb_h5: Optional[str] = None,
    flow_h5: Optional[str] = None,
    num_classes: Optional[int] = None,
    include_top: bool = False,
) -> Tuple[str, Dict]:
    """Convert reference-format Keras h5 checkpoint(s) into a single
    msgpack variables file loadable by ``load_converted_variables``.

    model_type: C3D | I3D | TWOSTREAM_I3D | R3D_{18,34,50,101,152} (the
    reference trains R3D from scratch, train.py:1683-1707 — R3D conversion
    is for checkpoints trained elsewhere).

    For C3D the checkpoint head is kept verbatim (e.g. sports1M's 487-way
    fc8); the pop-softmax surgery (train.py:1672-1678) happens at LOAD
    time, where a mismatched head is dropped in favour of the fresh init
    (models.pretrained).  num_classes only filters the I3D 'predictions'
    Dense.

    include_top=True (I3D only) converts a with-classification-top Kinetics
    checkpoint — trunk + the Conv3d_6a_1x1 head — into I3DKinetics
    variables via i3d_kinetics_variables_from_keras (the plain I3D
    converter would silently drop that head)."""
    import flax.serialization

    from . import weights_io as wio

    if include_top and model_type != "I3D":
        raise ValueError(
            "--include-top only applies to -mt I3D (the Kinetics "
            "classification top, reference train.py:1196-1213); C3D keeps "
            "its fc8 verbatim and TwoStream loads no-top trunks"
        )
    if model_type == "C3D":
        if rgb_h5 is None:
            raise ValueError("C3D conversion needs --rgb-h5 (sports1M)")
        variables = wio.c3d_variables_from_keras(
            wio.read_keras_h5(rgb_h5), num_classes=None
        )
    elif model_type == "I3D" and include_top:
        if rgb_h5 is None:
            raise ValueError("I3D conversion needs --rgb-h5")
        variables = wio.i3d_kinetics_variables_from_keras(
            wio.read_keras_h5(rgb_h5), stream="rgb"
        )
    elif model_type == "I3D":
        if rgb_h5 is None:
            raise ValueError("I3D conversion needs --rgb-h5")
        variables = wio.i3d_variables_from_keras(
            wio.read_keras_h5(rgb_h5), stream="rgb", num_classes=num_classes
        )
    elif model_type == "TWOSTREAM_I3D":
        if rgb_h5 is None or flow_h5 is None:
            raise ValueError("TWOSTREAM_I3D conversion needs --rgb-h5 and --flow-h5")
        variables = wio.twostream_variables_from_keras(
            wio.read_keras_h5(rgb_h5), wio.read_keras_h5(flow_h5)
        )
    elif model_type.startswith("R3D_"):
        # No published R3D checkpoint exists (the reference trains from
        # scratch, train.py:1683-1707), but Keras-layout R3D checkpoints
        # trained elsewhere convert through the same golden-tested path
        # (weights_io.r3d_variables_from_keras).
        if rgb_h5 is None:
            raise ValueError(f"{model_type} conversion needs --rgb-h5")
        variables = wio.r3d_variables_from_keras(
            wio.read_keras_h5(rgb_h5),
            int(model_type.split("_")[1]),
            num_classes=num_classes,
        )
    else:
        raise ValueError(
            f"no pretrained path for {model_type} (reference train.py:1683-1707)"
        )

    os.makedirs(os.path.dirname(os.path.abspath(out_path)), exist_ok=True)
    blob = flax.serialization.msgpack_serialize(variables)
    tmp = out_path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(blob)
    os.replace(tmp, out_path)
    return out_path, variables


def load_converted_variables(path: str) -> Dict:
    """Load a variables file written by convert_keras_checkpoint."""
    import flax.serialization

    with open(path, "rb") as f:
        return flax.serialization.msgpack_restore(f.read())
