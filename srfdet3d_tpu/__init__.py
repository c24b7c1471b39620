"""srfdet3d_tpu: TPU-native sparse-region-fusion 3D object detection.

A from-scratch JAX/XLA/Pallas reimplementation of the capabilities of the
SRFDet3D reference (gopi-erabati/SRFDet3D): LiDAR-only and LiDAR+camera
sparse-proposal 3D detection on nuScenes / KITTI / Waymo, designed TPU-first:

- static shapes + capacity padding everywhere (points, voxels, GTs, NMS),
- voxelization / VFE as segment ops instead of CUDA scatter kernels,
- submanifold & strided sparse 3D conv as gather-GEMM-scatter over sorted
  voxel keys (exact spconv active-site semantics),
- fully batched decoder (no per-sample python loops),
- OTA dynamic-k assignment as fixed-shape masked ops,
- data-parallel training via GSPMD (jit + NamedSharding over a device mesh).
"""

__version__ = "0.1.0"
