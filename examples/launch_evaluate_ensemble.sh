#!/usr/bin/env bash
# Ensemble-evaluation launcher — UX equivalent of the reference's
# launch_evaluate_ensemble.sh (op-dispatching wrapper).
set -euo pipefail

WORK_DIR=${1:?usage: $0 WORK_DIR OPERATION [MODEL_TYPE] [WEIGHTS_TYPE]}
OP=${2:?operation: evaluate|global|combine|probs|confusion|difference|agreement}
MT=${3:-C3D}
WT=${4:-SUM}
# the reference's default global model list incl. the SPECIALCASE alias
# (launch_evaluate_ensemble.sh:23)
MODELS=${MODELS:-"C3D_PRETRAINED I3D_PRETRAINED TWOSTREAM_I3D_PRETRAINED SPECIALCASE_PRETRAINED R3D_34_SCRATCH"}

case "$OP" in
  probs)
    exec python -m crowded_scenes_ensemble_classification_tpu probs \
      --work-dir "$WORK_DIR" --model-type "$MT" ;;
  evaluate)
    exec python -m crowded_scenes_ensemble_classification_tpu ensemble \
      --work-dir "$WORK_DIR" --model-type "$MT" --operation evaluate \
      --weights-type "$WT" ;;
  global|combine)
    # shellcheck disable=SC2086
    exec python -m crowded_scenes_ensemble_classification_tpu ensemble \
      --work-dir "$WORK_DIR" --operation "$OP" --models $MODELS ;;
  confusion|difference|agreement)
    exec python -m crowded_scenes_ensemble_classification_tpu report \
      --work-dir "$WORK_DIR" --model-type "$MT" --operation "$OP" \
      --weights-type "$WT" ;;
  *)
    echo "unknown operation $OP" >&2; exit 2 ;;
esac
