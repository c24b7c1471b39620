#!/bin/bash
# Occupancy-honest benchmark matrix (VERDICT r1 item 9): batch 1/2/4,
# worst-case (0.5 = voxel caps saturated) vs real-scene (0.25) occupancy,
# fp32 vs bf16, across config families, plus the train step.
# One process per combo serializes TPU access; the persistent compile
# cache makes repeats cheap.  Run:  nohup bash tools/bench_matrix.sh &
set -u
cd "$(dirname "$0")/.."
run() { echo "=== $* ==="; timeout 3600 python "$@" 2>&1 | grep -v WARNING; }

run tools/bench_config.py srfdet_voxel_nusc_L 1 float32 0.5
run tools/bench_config.py srfdet_voxel_nusc_L 2 float32 0.5
run tools/bench_config.py srfdet_voxel_nusc_L 4 float32 0.5
run tools/bench_config.py srfdet_voxel_nusc_L 1 float32 0.25
run tools/bench_config.py srfdet_voxel_nusc_L 1 bfloat16 0.5
run tools/bench_config.py srfdet_voxel_nusc_LC 1 float32 0.5
run tools/bench_config.py srfdet_voxel_nusc_LC 1 bfloat16 0.5
run tools/bench_config.py srfdet_voxel_nusc_LC 1 img_bf16 0.5
run tools/bench_config.py srfdet_pillar_nusc_L 1 float32 0.5
run tools/bench_config.py srfdet_voxel_kitti_L 1 float32 0.5
run tools/bench_config.py srfdet_dvoxel_waymo_L 1 float32 0.5
run tools/bench_train.py bitmap onehot
echo "=== matrix done ==="
