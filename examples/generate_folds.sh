#!/usr/bin/env bash
# Scene-stratified fold generation — equivalent of the reference's
# generate_folds.sh:3 (same defaults: Crowd-11 dataset dir, Folds/
# parent, 5 folds, preprocessing metadata csv).
set -euo pipefail

DATASET_DIR=${1:-Data/Crowd-11/}
PARENT_FOLDS=${2:-Folds/}
DATABASE=${3:-Data/preprocessing.csv}
FOLDS=${4:-5}

exec python -m crowded_scenes_ensemble_classification_tpu folds \
  --dataset-directory "$DATASET_DIR" \
  --parent-folds-folder "$PARENT_FOLDS" \
  --database-file "$DATABASE" \
  --folds-number "$FOLDS"
