#!/bin/bash
# Session-11 TPU measurement queue (serialized; one TPU process at a time).
# Re-measures the headline numbers with the zy window grouping + split
# train step committed at 68beda9.
set -u
cd /root/repo
LOG=/tmp/s11_campaign.log
echo "=== $(date +%H:%M:%S) session-11 campaign start ===" >> $LOG

run() {
  echo "=== $(date +%H:%M:%S) $* ===" >> $LOG
  timeout 3000 "$@" >> $LOG 2>&1
  echo "=== $(date +%H:%M:%S) rc=$? ===" >> $LOG
}

# 1. headline bench (judged artifact): predict p50 + stream
run python bench.py
# 2. train step with zy + split
run python tools/bench_train.py bitmap onehot
# 3. backward bisect at flagship caps with zy (stage-2 wall localization)
run python tools/bench_encoder_grad_parts.py
# 4. LC flagship at parity-honest 928x1600
run python tools/bench_config.py srfdet_voxel_nusc_LC 1 float32 0.5
echo "=== $(date +%H:%M:%S) campaign done ===" >> $LOG
