#!/usr/bin/env bash
# Op-dependent evaluation router — equivalent of the reference's
# evaluate_ensemble.sh:1-71 (the unit sbatch'd by the interactive
# launcher).  Accepts the reference's operation names and positional
# experiment dimensions (-mt/-tc relayed positionally there too) and
# routes them onto the typed CLI; the remaining dimensions (-b/-ofs/
# -as/-fn/…) live in WORK_DIR/experiment.json written by `launch`.
#
#   evaluate_ensemble.sh WORK_DIR Store_models_probabilities [MT] [TC] [SUBSET]
#   evaluate_ensemble.sh WORK_DIR Evaluate_ensembles [MT] [TC] [WEIGHTS_TYPE]
#   evaluate_ensemble.sh WORK_DIR Global_evaluate_models [MODELS…]
#   evaluate_ensemble.sh WORK_DIR Combine_ensembles [MODELS…]
#   evaluate_ensemble.sh WORK_DIR Confusion_matrices Global [WT] [MODELS…]
#   evaluate_ensemble.sh WORK_DIR Confusion_matrices Unique [MT] [TC] [WT]
#   evaluate_ensemble.sh WORK_DIR Difference_matrices (same as Confusion)
#   evaluate_ensemble.sh WORK_DIR StickDiagrams_wellClassifiedClips_per_numberOfModels [MT] [TC] [test|train_val]
#
# Default global model list = the reference launcher's
# (launch_evaluate_ensemble.sh:23, incl. the SPECIALCASE alias).
set -euo pipefail

WORK_DIR=${1:?usage: $0 WORK_DIR OPERATION [op args…]}
OP=${2:?missing OPERATION (reference evaluate_ensemble.py:1681-1683 names)}
shift 2
DEFAULT_MODELS=(SPECIALCASE_PRETRAINED R3D_34_SCRATCH TWOSTREAM_I3D_PRETRAINED
  TWOSTREAM_I3D_SCRATCH C3D_PRETRAINED C3D_SCRATCH I3D_PRETRAINED I3D_SCRATCH)

# exec inside the function replaces the shell (the reference relays
# into one python process the same way)
cli() { exec python -m crowded_scenes_ensemble_classification_tpu "$@"; }

case "$OP" in
  Store_models_probabilities)
    cli probs --work-dir "$WORK_DIR" --model-type "${1:-C3D}" \
      --training-condition "${2:-_SCRATCH}" --subset "${3:-test}" ;;
  Evaluate_ensembles)
    cli ensemble --work-dir "$WORK_DIR" --operation evaluate \
      --model-type "${1:-C3D}" --training-condition "${2:-_SCRATCH}" \
      --weights-type "${3:-SUM}" ;;
  Global_evaluate_models|Combine_ensembles)
    [ "$OP" = Global_evaluate_models ] && CLIOP=global || CLIOP=combine
    MODELS=("${@:-${DEFAULT_MODELS[@]}}")
    cli ensemble --work-dir "$WORK_DIR" --operation "$CLIOP" \
      --models "${MODELS[@]}" ;;
  Confusion_matrices|Difference_matrices)
    [ "$OP" = Confusion_matrices ] && CLIOP=confusion || CLIOP=difference
    ET=${1:-Unique}; [ $# -gt 0 ] && shift
    if [ "$ET" = Global ]; then
      WT=${1:-SUM}; [ $# -gt 0 ] && shift
      MODELS=("${@:-${DEFAULT_MODELS[@]}}")
      cli report --work-dir "$WORK_DIR" --operation "$CLIOP" \
        --scope global --weights-type "$WT" --models "${MODELS[@]}"
    fi
    cli report --work-dir "$WORK_DIR" --operation "$CLIOP" \
      --scope homogeneous --model-type "${1:-C3D}" \
      --training-condition "${2:-_SCRATCH}" --weights-type "${3:-SUM}" ;;
  StickDiagrams_wellClassifiedClips_per_numberOfModels)
    cli report --work-dir "$WORK_DIR" --operation agreement \
      --model-type "${1:-C3D}" --training-condition "${2:-_SCRATCH}" \
      --subset "${3:-test}" ;;
  *)
    echo "unknown operation: $OP" >&2; exit 2 ;;
esac
