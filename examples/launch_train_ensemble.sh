#!/usr/bin/env bash
# Interactive ensemble-training launcher — the UX equivalent of the
# reference's launch_train_ensemble.sh (prompt-driven), driving the typed
# CLI instead of positional sbatch relays.
set -euo pipefail

read -rp "Work dir [work]: " WORK_DIR; WORK_DIR=${WORK_DIR:-work}
read -rp "Dataset directory (with rgb/ and flow/) [Data/Crowd-11]: " DATA; DATA=${DATA:-Data/Crowd-11}
read -rp "Database csv [Data/database.csv]: " DB; DB=${DB:-Data/database.csv}
read -rp "Model type [C3D|I3D|TWOSTREAM_I3D|R3D_18|R3D_34|R3D_50|R3D_101|R3D_152] [C3D]: " MT; MT=${MT:-C3D}
read -rp "Training condition [_SCRATCH|_PRETRAINED] [_SCRATCH]: " TC; TC=${TC:-_SCRATCH}
read -rp "Folds [5]: " FN; FN=${FN:-5}
read -rp "Augmentation [non_augmented|augmented_onTheFly|augmented_precomputed] [non_augmented]: " AS; AS=${AS:-non_augmented}
read -rp "Optical flow [TVL1_precomputed|FarneBack_onTheFly] [FarneBack_onTheFly]: " OFS; OFS=${OFS:-FarneBack_onTheFly}
read -rp "Batch size [16]: " BS; BS=${BS:-16}
read -rp "Epochs [100]: " EP; EP=${EP:-100}
read -rp "Runner [local|commands] [local]: " RUNNER; RUNNER=${RUNNER:-local}

exec python -m crowded_scenes_ensemble_classification_tpu launch \
  --work-dir "$WORK_DIR" \
  --dataset-directory "$DATA" \
  --database-file "$DB" \
  --model-type "$MT" \
  --training-condition "$TC" \
  --folds-number "$FN" \
  --augmentation-status "$AS" \
  --optical-flow-status "$OFS" \
  --batch-size "$BS" \
  --epochs "$EP" \
  --runner "$RUNNER"
