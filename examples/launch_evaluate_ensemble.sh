#!/usr/bin/env bash
# Interactive ensemble-evaluation launcher — UX equivalent of the
# reference's launch_evaluate_ensemble.sh (prompt-driven op dispatch,
# launch_evaluate_ensemble.sh:3-103), delegating to the op router
# examples/evaluate_ensemble.sh the way the reference sbatch'd its
# evaluate_ensemble.sh per operation.  Under Slurm, replace the final
# delegation with `sbatch evaluate_ensemble.sh …`.
set -euo pipefail
here=$(cd "$(dirname "$0")" && pwd)

read -rp "Work dir [work]: " WORK_DIR; WORK_DIR=${WORK_DIR:-work}
echo "Insert the operation name :
    ['Confusion_matrices',
    'Difference_matrices',
    'Evaluate_ensembles',
    'Store_models_probabilities',
    'StickDiagrams_wellClassifiedClips_per_numberOfModels',
    'Global_evaluate_models',
    'Combine_ensembles']"
read -r OPERATION

ask_mt_tc() {
  read -rp "Model type [C3D|I3D|TWOSTREAM_I3D|R3D_18|R3D_34|R3D_50|R3D_101|R3D_152] [C3D]: " MT
  MT=${MT:-C3D}
  read -rp "Training condition [_SCRATCH|_PRETRAINED] [_SCRATCH]: " TC
  TC=${TC:-_SCRATCH}
}

case "$OPERATION" in
  Global_evaluate_models|Combine_ensembles)
    echo "Would you like to mention the models to integrate ? [Yes/No]"
    read -r INTEGRATE
    if [ "$INTEGRATE" = "Yes" ]; then
      echo "What is the list of models : Example TWOSTREAM_I3D_PRETRAINED C3D_SCRATCH"
      read -r MODELS_LIST
      # shellcheck disable=SC2086
      exec "$here/evaluate_ensemble.sh" "$WORK_DIR" "$OPERATION" $MODELS_LIST
    fi
    exec "$here/evaluate_ensemble.sh" "$WORK_DIR" "$OPERATION" ;;
  Confusion_matrices|Difference_matrices)
    echo "Which ensemble type ? [Unique/Global]"
    read -r ET
    read -rp "Weighting scheme [SUM]: " WT; WT=${WT:-SUM}
    if [ "$ET" = "Global" ]; then
      echo "Would you like to mention the models to integrate ? [Yes/No]"
      read -r INTEGRATE
      if [ "$INTEGRATE" = "Yes" ]; then
        echo "What is the list of models : Example TWOSTREAM_I3D_PRETRAINED C3D_SCRATCH"
        read -r MODELS_LIST
        # shellcheck disable=SC2086
        exec "$here/evaluate_ensemble.sh" "$WORK_DIR" "$OPERATION" Global "$WT" $MODELS_LIST
      fi
      exec "$here/evaluate_ensemble.sh" "$WORK_DIR" "$OPERATION" Global "$WT"
    fi
    ask_mt_tc
    exec "$here/evaluate_ensemble.sh" "$WORK_DIR" "$OPERATION" Unique "$MT" "$TC" "$WT" ;;
  Evaluate_ensembles)
    ask_mt_tc
    read -rp "Weighting scheme [SUM|MAXIMUM|VALIDATION_ERROR_INVERSE|GRID_SEARCH|DIFFERENTIAL_EVOLUTION] [SUM]: " WT
    exec "$here/evaluate_ensemble.sh" "$WORK_DIR" "$OPERATION" "$MT" "$TC" "${WT:-SUM}" ;;
  Store_models_probabilities|StickDiagrams_wellClassifiedClips_per_numberOfModels)
    ask_mt_tc
    echo "Which sets are involved ? [test/train_val]"
    read -r SUBSET
    exec "$here/evaluate_ensemble.sh" "$WORK_DIR" "$OPERATION" "$MT" "$TC" "${SUBSET:-test}" ;;
  *)
    echo "unknown operation: $OPERATION" >&2; exit 2 ;;
esac
