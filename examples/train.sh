#!/usr/bin/env bash
# Per-member training relay — the unit the launcher fans out, equivalent
# of the reference's train.sh (positional→flag sbatch relay of 14 args,
# train.sh:1-17).  In this framework the experiment dimensions the
# reference relayed positionally (-mt/-tc/-fn/-b/-cs/-as/-af/-ofs/-e …)
# live in WORK_DIR/experiment.json, written once by `launch`; a member
# run is fully identified by (work dir, test index, val index).
#
#   usage: train.sh WORK_DIR TEST_INDEX VAL_INDEX [extra `train` flags…]
#
# Under Slurm, submit this exact script per member:
#   sbatch train.sh work 0 1
set -euo pipefail

WORK_DIR=${1:?usage: $0 WORK_DIR TEST_INDEX VAL_INDEX [extra flags…]}
TEST_INDEX=${2:?missing TEST_INDEX}
VAL_INDEX=${3:?missing VAL_INDEX}
shift 3

exec python -u -m crowded_scenes_ensemble_classification_tpu train \
  --work-dir "$WORK_DIR" \
  --test-index "$TEST_INDEX" \
  --val-index "$VAL_INDEX" \
  "$@"
