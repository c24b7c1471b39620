#!/usr/bin/env bash
# Multi-host evaluation (reference tools/dist_test.sh). See dist_train.sh.
set -euo pipefail
CONFIG=$1
CKPT=$2
shift 2
export SRFDET_COORD_ADDR=${COORD_ADDR:-}
export SRFDET_NUM_HOSTS=${NUM_HOSTS:-1}
export SRFDET_HOST_ID=${HOST_ID:-0}
exec python "$(dirname "$0")/test.py" "$CONFIG" "$CKPT" "$@"
