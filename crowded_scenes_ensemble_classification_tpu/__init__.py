"""crowded_scenes_ensemble_classification_tpu — TPU-native crowd-video ensemble framework.

A from-scratch JAX / Flax / pjit / Pallas re-design of the capabilities of
MounirB/Crowded-scenes-Ensemble-classification (Crowd-11 ensemble classification):

- scene-stratified k-fold split generation          (``data.folds``)
- device-side video augmentation                    (``ops``)
- dense optical flow (Farneback, TV-L1) on device   (``flow``)
- 3D-CNN model zoo: C3D, I3D, TwoStream-I3D,
  R3D-18/34/50/101/152 as jitted Flax modules       (``models``)
- sharded training engine (optax/orbax, pjit)       (``train``)
- vmapped multi-member ensemble inference and
  on-device score fusion with 5 weighting schemes   (``ensemble``)
- confusion / difference / agreement reporting      (``reports``)
- mesh & sharding utilities (data/member axes,
  temporal halo sharding for long clips)            (``parallel``)

The reference pipeline communicated between stages through path-encoded
experiment names and stringified-CSV softmax caches; here every stage speaks
through typed configs (``core.config``) and npz/orbax artifacts, with CSV
export kept for reference comparability.
"""

__version__ = "0.1.0"

from . import core  # noqa: F401
