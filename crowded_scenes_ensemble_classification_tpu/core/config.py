"""Typed experiment configuration.

The reference encoded experiment identity in directory/file names and parsed
it back with regexes (reference: train.py:1983-2008, evaluate_ensemble.py:17-31,
evaluate_ensemble.py:105-152).  Here the experiment config is a frozen
dataclass which *generates* those legacy names for artifact compatibility but
is never re-parsed from a path.
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Optional, Tuple

# Model registry keys — mirror reference CLI whitelist (train.py:2076).
MODEL_TYPES = (
    "TWOSTREAM_I3D",
    "I3D",
    "C3D",
    "R3D_18",
    "R3D_34",
    "R3D_50",
    "R3D_101",
    "R3D_152",
)

# reference train.py:2083
TRAINING_CONDITIONS = ("_SCRATCH", "_PRETRAINED")
# reference train.py:2089
CLASSES_STATUSES = ("balanced", "unbalanced")
# reference train.py:2128
AUGMENTATION_STATUSES = ("non_augmented", "augmented_onTheFly", "augmented_precomputed")
# reference train.py:2143
OPTICAL_FLOW_STATUSES = ("TVL1_precomputed", "FarneBack_onTheFly")
# reference evaluate_ensemble.py:1733
WEIGHTING_SCHEMES = (
    "GRID_SEARCH",
    "DIFFERENTIAL_EVOLUTION",
    "SUM",
    "VALIDATION_ERROR_INVERSE",
    "MAXIMUM",
)


@dataclasses.dataclass(frozen=True)
class ClipSpec:
    """Canonical clip geometry for a model family (reference train.py:1566-1616)."""

    frames: int
    height: int
    width: int
    rgb_channels: int = 3
    flow_channels: int = 0  # nonzero only for two-stream

    @property
    def rgb_shape(self) -> Tuple[int, int, int, int]:
        return (self.frames, self.height, self.width, self.rgb_channels)

    @property
    def flow_shape(self) -> Tuple[int, int, int, int]:
        return (self.frames, self.height, self.width, self.flow_channels)


# Per-architecture canonical input geometry (reference define_input, train.py:1566-1616).
CLIP_SPECS = {
    "I3D": ClipSpec(frames=20, height=224, width=224),
    "TWOSTREAM_I3D": ClipSpec(frames=20, height=224, width=224, flow_channels=2),
    "C3D": ClipSpec(frames=16, height=112, width=112),
    "R3D_18": ClipSpec(frames=16, height=112, width=112),
    "R3D_34": ClipSpec(frames=16, height=112, width=112),
    "R3D_50": ClipSpec(frames=16, height=112, width=112),
    "R3D_101": ClipSpec(frames=16, height=112, width=112),
    "R3D_152": ClipSpec(frames=16, height=112, width=112),
}


def clip_spec(model_type: str) -> ClipSpec:
    try:
        return CLIP_SPECS[model_type]
    except KeyError:
        raise ValueError(f"Unknown model_type {model_type!r}; valid: {MODEL_TYPES}")


@dataclasses.dataclass(frozen=True)
class ExperimentConfig:
    """One experiment = (architecture, training condition, data pipeline flags).

    Field meanings mirror the reference train.py CLI (train.py:2064-2165).
    """

    model_type: str = "C3D"
    training_condition: str = "_SCRATCH"
    folds_number: int = 5
    classes_status: str = "unbalanced"
    augmentation_status: str = "non_augmented"
    augmentation_frequency: int = 1
    optical_flow_status: str = "FarneBack_onTheFly"
    num_classes: int = 11  # Crowd-11
    batch_size: int = 16
    epochs: int = 100
    # TPU-specific knobs (no reference equivalent):
    compute_dtype: str = "bfloat16"
    data_axis: str = "data"
    member_axis: str = "member"
    # Pixel pre-scale applied to model inputs (1.0 = reference parity:
    # raw 0-255 BGR floats, train.py:283-289; 1/255 stabilises scratch
    # training).  Lives in the config so training and probability
    # caching CANNOT silently disagree: cache_probabilities reads it
    # from here, and the launch/train CLIs persist it with the rest of
    # the experiment identity.
    input_scale: float = 1.0
    # Exact augmented-Farnebäck semantics (reference train.py:176-184):
    # in augmented_onTheFly + FarneBack_onTheFly runs, compute flow from
    # the AUGMENTED frames (same crop/flip decisions as the rgb stream,
    # plus salt/pepper before flow).  False (default) computes flow from
    # the unaugmented staged frames — the TVL1-augmented mode's semantics
    # (train.py:195-221); see PARITY.md.  Only meaningful for TwoStream
    # augmented on-the-fly-flow experiments (the SPECIALCASE config).
    flow_from_augmented: bool = False
    # On-device Farnebäck iteration schedule for FarneBack_onTheFly runs
    # (training AND probability caching — the two must agree, so it lives
    # in the persisted config like input_scale):
    #   'full'  — the reference's 5-iteration schedule at every pyramid
    #             level (cv2 parity; train.py:223-239).
    #   'turbo' — flow.farneback.TURBO_PARAMS: full budget at coarse
    #             levels, one residual refinement pass at the 3 finest.
    #             ~2-3× flow throughput, EPE within ≤0.01 px of 'full'
    #             on every motion-suite case (tests/test_flow.py gates).
    # Ignored by TVL1_precomputed and RGB-only runs.
    flow_schedule: str = "full"

    def __post_init__(self):
        if self.model_type not in MODEL_TYPES:
            raise ValueError(f"model_type {self.model_type!r} not in {MODEL_TYPES}")
        if self.training_condition not in TRAINING_CONDITIONS:
            raise ValueError(
                f"training_condition {self.training_condition!r} not in {TRAINING_CONDITIONS}"
            )
        if self.augmentation_status not in AUGMENTATION_STATUSES:
            raise ValueError(
                f"augmentation_status {self.augmentation_status!r} not in {AUGMENTATION_STATUSES}"
            )
        if self.optical_flow_status not in OPTICAL_FLOW_STATUSES:
            raise ValueError(
                f"optical_flow_status {self.optical_flow_status!r} not in {OPTICAL_FLOW_STATUSES}"
            )
        if self.flow_schedule not in ("full", "turbo"):
            raise ValueError(
                f"flow_schedule {self.flow_schedule!r} not in ('full', 'turbo')"
            )
        if self.folds_number < 3:
            # every (test, val) fold pair must leave ≥1 train fold
            # (k−2 ≥ 1; reference runs k=5, generate_folds.py:163-204)
            raise ValueError(
                f"folds_number must be ≥3 (got {self.folds_number}): the "
                "k·(k−1) member grid needs at least one training fold per "
                "(test, validation) pair"
            )

    # ------------------------------------------------------------------
    # Legacy artifact naming (write-only; reference train.py:1983-2008)
    # ------------------------------------------------------------------

    @property
    def clip(self) -> ClipSpec:
        return clip_spec(self.model_type)

    @property
    def is_two_stream(self) -> bool:
        return self.model_type == "TWOSTREAM_I3D"

    def subfolder_name(self) -> str:
        """`{k}folds_{MODEL}{COND}_CS_{cs}_OF_{of}_AS_{as}`."""
        return (
            f"{self.folds_number}folds_{self.model_type}{self.training_condition}"
            f"_CS_{self.classes_status}"
            f"_OF_{self.optical_flow_status}"
            f"_AS_{self.augmentation_status}"
        )

    def split_suffix(self, test_index: int, val_index: int) -> str:
        return f"_split_test{test_index}_val{val_index}"

    def artifact_stem(self, test_index: int, val_index: int) -> str:
        """Basename of all per-split artifacts (weights/history/probabilities)."""
        stem = self.subfolder_name()
        if self.augmentation_status == "augmented_precomputed":
            stem += f"_Freq{self.augmentation_frequency}"
        return stem + self.split_suffix(test_index, val_index)

    def weights_relpath(self, test_index: int, val_index: int) -> str:
        """Relative path of the per-split checkpoint directory, mirroring the
        reference layout `{subfolder}/TestSplit{t}/{stem}_weights.hdf5`
        (reference train.py:1996-2008; checkpoint name suffix train.py:1850-1853)."""
        return os.path.join(
            self.subfolder_name(),
            f"TestSplit{test_index}",
            self.artifact_stem(test_index, val_index) + "_weights",
        )

    def history_relpath(self, test_index: int, val_index: int) -> str:
        """Val-loss history artifact (reference store_history train.py:63-82)."""
        return os.path.join(
            self.subfolder_name(),
            f"TestSplit{test_index}",
            self.artifact_stem(test_index, val_index) + "_validation_losses.npy",
        )

    # ------------------------------------------------------------------
    # Serialization
    # ------------------------------------------------------------------

    def to_json(self) -> str:
        return json.dumps(dataclasses.asdict(self), indent=2, sort_keys=True)

    @classmethod
    def from_json(cls, text: str) -> "ExperimentConfig":
        return cls(**json.loads(text))

    def save(self, path: str) -> None:
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        # atomic: concurrent member processes (2-process fan-out) may save
        # the same config; readers must never see a torn file
        tmp = f"{path}.{os.getpid()}.tmp"
        with open(tmp, "w") as f:
            f.write(self.to_json())
        os.replace(tmp, path)

    @classmethod
    def load(cls, path: str) -> "ExperimentConfig":
        with open(path) as f:
            return cls.from_json(f.read())


def split_pairs(folds_number: int):
    """All (test_index, val_index) pairs of the k×(k−1) split matrix
    (reference launch_train_ensemble.py:117-127)."""
    return [
        (t, v)
        for t in range(folds_number)
        for v in range(folds_number)
        if v != t
    ]


def member_val_indices(folds_number: int, test_index: int):
    """Validation indices of the k−1 members of the homogeneous ensemble for
    one test fold."""
    return [v for v in range(folds_number) if v != test_index]
