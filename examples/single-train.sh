#!/usr/bin/env bash
# Crash-recovery rerun of ONE ensemble member — equivalent of the
# reference's single-train.sh ("if any job crashes due to memory-related
# problems", single-train.sh:3): re-launch the member until it completes.
# Safe to re-run any number of times: training warm-resumes from the
# member's checkpoint (the reference reloads the best weights file,
# train.py:1887-1890; this framework restores the FULL train state —
# params + optimizer + step + PRNG — so the retry continues exactly
# where the crash stopped).
#
#   usage: single-train.sh WORK_DIR TEST_INDEX VAL_INDEX [extra flags…]
#   env:   MAX_ATTEMPTS (default 5), RETRY_DELAY_S (default 10)
set -uo pipefail

WORK_DIR=${1:?usage: $0 WORK_DIR TEST_INDEX VAL_INDEX [extra flags…]}
TEST_INDEX=${2:?missing TEST_INDEX}
VAL_INDEX=${3:?missing VAL_INDEX}
shift 3
MAX_ATTEMPTS=${MAX_ATTEMPTS:-5}
RETRY_DELAY_S=${RETRY_DELAY_S:-10}

here=$(cd "$(dirname "$0")" && pwd)
for attempt in $(seq 1 "$MAX_ATTEMPTS"); do
  echo "[single-train] attempt $attempt/$MAX_ATTEMPTS: split_test${TEST_INDEX}_val${VAL_INDEX}"
  if "$here/train.sh" "$WORK_DIR" "$TEST_INDEX" "$VAL_INDEX" "$@"; then
    echo "[single-train] member completed"
    exit 0
  fi
  echo "[single-train] member failed; retrying in ${RETRY_DELAY_S}s" >&2
  sleep "$RETRY_DELAY_S"
done
echo "[single-train] gave up after $MAX_ATTEMPTS attempts" >&2
exit 1
