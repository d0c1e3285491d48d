"""Generate the committed Keras-layout stem fixture + golden activations.

Run from the repo root:  python tests/fixtures/make_stem_fixture.py

Writes (both committed to git):
- stem_convbn.h5      — a Keras-2.x-layout h5 holding one reference-named
                        I3D stem layer (Conv3d_1a_7x7_rgb_conv/_bn) with
                        seeded random weights, written with RAW h5py (not
                        the framework's exporter) so the fixture is an
                        independent artifact of the reference layout
                        (weight_names attr + 'layer/name:0' nested datasets,
                        as Keras 2.2.4 save_weights produces),
- stem_convbn_golden.npz — input clip + float64 oracle output of
                        conv(7³/2, TF-SAME, no bias) → BN(eps 1e-3,
                        scale=False) → ReLU (reference conv3d_bn,
                        train.py:615-670).
"""

import os
import sys

import h5py
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from oracle_i3d import conv_bn_relu  # noqa: E402

HERE = os.path.dirname(os.path.abspath(__file__))
SEED = 20240816
FILTERS = 8


def main():
    rng = np.random.default_rng(SEED)
    kernel = rng.normal(0, 1 / np.sqrt(7 * 7 * 7 * 3), (7, 7, 7, 3, FILTERS)).astype(
        np.float32
    )
    beta = rng.normal(0, 0.1, (FILTERS,)).astype(np.float32)
    mean = rng.normal(0, 0.05, (FILTERS,)).astype(np.float32)
    var = rng.uniform(0.8, 1.2, (FILTERS,)).astype(np.float32)

    h5_path = os.path.join(HERE, "stem_convbn.h5")
    with h5py.File(h5_path, "w") as f:
        f.attrs["layer_names"] = [
            b"Conv3d_1a_7x7_rgb_conv",
            b"Conv3d_1a_7x7_rgb_bn",
        ]
        g = f.create_group("Conv3d_1a_7x7_rgb_conv")
        g.attrs["weight_names"] = [b"Conv3d_1a_7x7_rgb_conv/kernel:0"]
        g.create_dataset("Conv3d_1a_7x7_rgb_conv/kernel:0", data=kernel)
        g = f.create_group("Conv3d_1a_7x7_rgb_bn")
        g.attrs["weight_names"] = [
            b"Conv3d_1a_7x7_rgb_bn/beta:0",
            b"Conv3d_1a_7x7_rgb_bn/moving_mean:0",
            b"Conv3d_1a_7x7_rgb_bn/moving_variance:0",
        ]
        g.create_dataset("Conv3d_1a_7x7_rgb_bn/beta:0", data=beta)
        g.create_dataset("Conv3d_1a_7x7_rgb_bn/moving_mean:0", data=mean)
        g.create_dataset("Conv3d_1a_7x7_rgb_bn/moving_variance:0", data=var)

    x = rng.uniform(-1, 1, (1, 6, 12, 12, 3)).astype(np.float32)
    layers = {
        "Conv3d_1a_7x7_rgb_conv": {"kernel": kernel},
        "Conv3d_1a_7x7_rgb_bn": {
            "beta": beta,
            "moving_mean": mean,
            "moving_variance": var,
        },
    }
    golden = conv_bn_relu(x, layers, "Conv3d_1a_7x7_rgb", strides=(2, 2, 2))
    np.savez(
        os.path.join(HERE, "stem_convbn_golden.npz"), x=x, golden=golden
    )
    print(f"wrote {h5_path} and golden ({golden.shape}, mean {golden.mean():.6f})")


if __name__ == "__main__":
    main()
