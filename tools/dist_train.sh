#!/usr/bin/env bash
# Multi-host data-parallel training (reference tools/dist_train.sh).
#
# The torch.distributed.launch + NCCL bootstrap is replaced by JAX's
# coordinator-based init: run this script once per host with the SAME
# COORD_ADDR and NUM_HOSTS, distinct HOST_ID.  Inside one host, all local
# TPU chips join the mesh automatically.
#
# Usage: COORD_ADDR=host0:1234 NUM_HOSTS=2 HOST_ID=0 \
#        ./tools/dist_train.sh <config_name> [train.py args...]
set -euo pipefail
CONFIG=$1
shift
export SRFDET_COORD_ADDR=${COORD_ADDR:-}
export SRFDET_NUM_HOSTS=${NUM_HOSTS:-1}
export SRFDET_HOST_ID=${HOST_ID:-0}
exec python "$(dirname "$0")/train.py" "$CONFIG" "$@"
