#!/usr/bin/env bash
# Offline (precomputed) augmentation — equivalent of the reference's
# augment_dataset.sh:2 (defaults: Folds/5_folds, frequency 5).  Writes
# the augmented clip copies and appends rgbclips_augmented_{i}_path
# columns to every fold CSV; idempotent (update-links mode on re-run),
# matching augment_dataset.py:131-148.
set -euo pipefail

FOLDS_FOLDER=${1:-Folds/5_folds}
AUG_DATA=${2:-Data/Crowd-11-augmented}
FREQ=${3:-5}
FOLDS=${4:-5}

exec python -m crowded_scenes_ensemble_classification_tpu augment \
  --folds-folder "$FOLDS_FOLDER" \
  --augmented-data-folder "$AUG_DATA" \
  --augmentation-frequency "$FREQ" \
  --folds-number "$FOLDS"
