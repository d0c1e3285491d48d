from .config import (  # noqa: F401
    AUGMENTATION_STATUSES,
    CLASSES_STATUSES,
    CLIP_SPECS,
    ClipSpec,
    ExperimentConfig,
    MODEL_TYPES,
    OPTICAL_FLOW_STATUSES,
    TRAINING_CONDITIONS,
    WEIGHTING_SCHEMES,
    clip_spec,
    member_val_indices,
    split_pairs,
)
from .manifest import ArtifactRecord, Manifest  # noqa: F401
from . import mesh, prng  # noqa: F401
