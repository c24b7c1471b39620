#!/bin/bash
# Serialized TPU measurement campaign for tunnel-restore (round 2):
#   1. bench.py          — headline + warms .jax_cache for the driver
#   2. bench_train.py    — train-step (VERDICT item 7, target <=400 ms)
#   3. bench_roi.py      — patch vs pairs RoI A/B (+ misfit counts)
#   4. bench_encoder_grad_parts.py — backward localization
#   5. bench_matrix.sh   — occupancy-honest rows (VERDICT item 9)
# One process at a time (TPU tunnel serializes); run:
#   nohup bash tools/tpu_campaign.sh > /tmp/tpu_campaign.log 2>&1 &
set -u
cd "$(dirname "$0")/.."
run() { echo "=== $(date +%H:%M:%S) $* ==="; timeout 3600 "$@" 2>&1 | grep -v WARNING; }

run python bench.py
run python tools/bench_train.py bitmap onehot
run env SRFDET_REMAT=1 python tools/bench_train.py bitmap onehot
run python tools/bench_roi.py
run python tools/bench_img_branch.py
run python tools/bench_encoder_grad_parts.py bitmap onehot
bash tools/bench_matrix.sh
run python -m pytest tests_tpu/ -q
echo "=== campaign done ==="
