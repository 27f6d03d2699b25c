#!/usr/bin/env bash
# Resume-friendly training launcher (the reference's run.sh resumes
# latest.pth; here the trainer picks up the newest checkpoint).
#
# Usage: ./run.sh <config> <work_dir> [data_root] [extra args...]
set -euo pipefail

CONFIG=${1:?usage: run.sh <config> <work_dir> [data_root] [extra...]}
WORK_DIR=${2:?usage: run.sh <config> <work_dir> [data_root] [extra...]}
DATA_ROOT=${3:-data/nuscenes}
shift $(( $# > 3 ? 3 : $# ))

LATEST=$(ls -d "${WORK_DIR}"/checkpoints/step_* 2>/dev/null \
         | sort -t_ -k2 -n | tail -1 || true)
RESUME=()
if [[ -n "${LATEST}" ]]; then
    echo "resuming from ${LATEST}"
    RESUME=(--resume-from "${LATEST}")
fi

exec python tools/train.py "${CONFIG}" \
    --work-dir "${WORK_DIR}" \
    --data-root "${DATA_ROOT}" \
    "${RESUME[@]}" "$@"
