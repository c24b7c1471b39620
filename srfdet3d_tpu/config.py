"""Configuration dataclasses for SRFDet-TPU experiments.

Replaces the reference's mmcv python-dict Config + registry `type=` strings
(configs/{nus,kitti,waymo,others}/*.py) with typed frozen dataclasses.  Every
logical field of the reference configs maps to a field here; additional
`*_cap` fields size the static buffers that TPU execution requires (the
reference gets dynamic shapes for free from CUDA; we must fix capacities).

The 11 shipped experiment configs live in :mod:`srfdet3d_tpu.configs`.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence, Tuple

from .assign.ota import OTAConfig
from .models.losses import LossConfig
from .ops.voxelize import VoxelizationSpec


@dataclasses.dataclass(frozen=True)
class TestConfig:
    """cfg test_cfg (srfdet_voxel_nusc_L.py:164-172)."""
    use_nms: bool = True
    nms_thr: float = 0.4
    score_thr: float = 0.1
    max_per_img: int = 300
    post_center_range: Tuple[float, ...] = (
        -61.2, -61.2, -10.0, 61.2, 61.2, 10.0)


@dataclasses.dataclass(frozen=True)
class VFEConfig:
    """pts_voxel_encoder (cfg :70 / pillar :41-52 / kitti :40-52)."""
    kind: str = "hard_simple"          # hard_simple | pillar | dynamic
    in_channels: int = 5
    feat_channels: Tuple[int, ...] = ()
    with_distance: bool = False
    with_cluster_center: bool = True
    with_voxel_center: bool = True
    with_centroid_aware: bool = False


@dataclasses.dataclass(frozen=True)
class MiddleConfig:
    """pts_middle_encoder (sparse cfg :72-84 / pillar scatter :53-54)."""
    kind: str = "sparse"               # sparse | pillar_scatter
    in_channels: int = 5
    base_channels: int = 16
    output_channels: int = 128
    encoder_channels: Tuple[Tuple[int, ...], ...] = (
        (16, 16, 32), (32, 32, 64), (64, 64, 128), (128, 128))
    encoder_paddings: Tuple[Tuple, ...] = (
        (0, 0, 1), (0, 0, 1), (0, 0, (0, 1, 1)), (0, 0))
    block_type: str = "basicblock"
    # static voxel capacities after each downsample stage + conv_out
    capacities: Tuple[int, ...] = (60000, 30000, 15000, 15000)
    # rulebook backend: 'bitmap' (z-bitmap columns, default) or 'table'
    # (dense 3D cell tables); see models/sparse_encoder.py
    rulebook: str = "bitmap"


@dataclasses.dataclass(frozen=True)
class BackboneConfig:
    """pts_backbone SECONDCustom (cfg :55-66)."""
    out_channels: Tuple[int, ...] = (128, 256)
    layer_nums: Tuple[int, ...] = (5, 5)
    layer_strides: Tuple[int, ...] = (1, 2)


@dataclasses.dataclass(frozen=True)
class ImgBranchConfig:
    """img_backbone + img_neck (cfg srfdet_voxel_nusc_LC.py:44-66)."""
    backbone: str = "vovnet-99"        # vovnet-99 | resnet-50
    frozen_stages: int = 2
    norm_eval: bool = True
    neck_out_channels: int = 256
    neck_num_outs: int = 4
    relu_before_extra_convs: bool = True
    # only the waymo_LC img_neck carries BN+ReLU ConvModules
    # (dvoxel_waymo_LC.py:74-76); the other img_necks are plain
    neck_norm: bool = False
    # freeze ALL image-backbone BN scale/bias (mmdet norm_cfg
    # requires_grad=False — only the waymo_LC R101 sets it,
    # dvoxel_waymo_LC.py:65)
    norm_frozen: bool = False
    # image-branch compute dtype ('float32' | 'bfloat16' | '' = inherit
    # the model dtype).  The backbone/FPN are conv-heavy (MXU-bound,
    # unlike the gather-bound lidar path), so bf16 here is a near-2x
    # latency lever; features are cast back to the model dtype before
    # the head consumes them.
    compute_dtype: str = ""
    # mmdet ResNet knobs (ignored by VoVNet): 'pytorch' puts the
    # bottleneck stride on the 3x3 conv, 'caffe' on the first 1x1
    # (waymo_LC R101 is caffe, dvoxel_waymo_LC.py:66); stage_with_dcn
    # swaps the 3x3 for a DCNv2 modulated deformable conv per stage
    resnet_style: str = "pytorch"
    stage_with_dcn: Tuple[bool, ...] = (False, False, False, False)
    num_cams: int = 6
    img_shape: Tuple[int, int] = (928, 1600)   # (H, W) network input
    # "pad": place the native image unscaled at the top-left of the
    # (H, W) canvas (mmcv Normalize+Pad(size_divisor=32), reference
    # srfdet_voxel_nusc_LC.py:246-247 — nuScenes 1600x900 -> 1600x928);
    # falls back to resize when the source exceeds img_shape.
    # "resize": scale to img_shape and rescale lidar2img (reference
    # ResizeImageMultiViewImage, used by srfdet_dvoxel_waymo_LC.py:268).
    mode: str = "pad"
    # reference feeds BGR images to every backbone except ResNet-50
    # (img_norm_cfg to_rgb=False with BGR mean/std, e.g.
    # srfdet_voxel_nusc_LC.py:15-18; the r50 configs use to_rgb=True)
    bgr: bool = True
    use_grid_mask: bool = True


@dataclasses.dataclass(frozen=True)
class HeadConfig:
    """bbox_head SRFDetHead (cfg :77-163)."""
    num_classes: int = 10
    feat_channels_lidar: int = 128
    feat_channels_img: int = 256
    hidden_dim: int = 128
    lidar_feat_lvls: int = 4
    img_feat_lvls: int = 4
    num_proposals: int = 900
    num_heads: int = 5
    deep_supervision: bool = True
    prior_prob: float = 0.01
    with_dpg: bool = True
    num_dpg_exp: int = 4
    with_lidar_encoder: bool = False
    code_size: int = 10
    # single_head knobs (cfg single_head_lidar :115-127)
    dim_feedforward: int = 512
    num_cls_convs: int = 2
    num_reg_convs: int = 3
    num_attn_heads: int = 8
    dropout: float = 0.1
    dynamic_dim: int = 32
    lidar_strides: Tuple[int, ...] = (8, 16, 32, 64)
    img_strides: Tuple[int, ...] = (4, 8, 16, 32)
    # >0: compacted visible-pair image RoI gather (models/head.py
    # pooled_img_roi) — exact up to per-camera capacity; 0 = gather every
    # (camera, proposal) pair like the reference
    img_roi_cap: int = 0
    # >0: patch-gather RoIAlign with a PxP cell window (32 covers mmdet
    # level mapping for square-ish RoIs; elongated ones map by sqrt(w*h)
    # and can exceed it).  Oversized RoIs take a compacted corner-pair
    # pass of `roi_patch_fallback` slots: -1 = full-size fallback buffer
    # (always exact but runs the ENTIRE pairs pass on top of the patch
    # pass — strictly slower; only a safety default), 0 = drop oversized
    # RoIs to zeros.  When enabling roi_patch, size the fallback from a
    # measured misfit count (tools/bench_roi.py).
    roi_patch: int = 0
    roi_patch_fallback: int = -1
    # image-path variants of the patch knobs (projected camera RoIs are
    # much larger than BEV RoIs — 123/900 misfits per cam at patch 32 —
    # so the paths are tuned independently; bench_roi measures both)
    img_roi_patch: int = 0
    img_roi_patch_fallback: int = -1
    # x-patch hybrid for the image RoI path (pairs in y, XP-cell row
    # slices in x; ops/roi_align._mla_xpatch) — 14x fewer gather slices
    # than pairs on the 6-camera path; x-misfits take the pairs fallback
    img_roi_xpatch: int = 0
    img_roi_xpatch_fallback: int = -1
    # rematerialize the refinement iterations in backward (jax.checkpoint)
    # — trades one extra decoder forward for O(num_heads) activation
    # memory; off by default (models/head.py SRFDetHead.remat)
    remat: bool = False
    # unroll the refinement scan in TRAIN traces (predict keeps the rolled
    # scan either way).  History: in round 2 this REGRESSED the full step
    # (515 -> 549 ms) because the head backward hid behind the encoder-
    # backward overlap.  After the round-5 block-RMW RoI backward kernel
    # shrank the head bwd (scan grad 145 -> 109 ms standalone), the
    # overlap inverted and unrolling wins end-to-end: full train step
    # p50 352 -> 321 ms / stream 319 -> 282 (tools/bench_train.py,
    # 2026-08-21) — ON by default; the rolled scan remains for predict
    # (5x smaller HLO for the remote compiler).
    unroll_train: bool = True
    # unroll the refinement scan in PREDICT traces too.  The rolled scan
    # pays per-iteration dispatch/loop machinery (head fwd 19.8 ms vs a
    # ~1.4 ms row floor, PERF.md roofline); unrolling lets XLA fuse
    # across iterations at the cost of a ~5x larger HLO for the remote
    # compiler.  A/B knob (tools/bench_config.py head.unroll_predict=1).
    unroll_predict: bool = False


@dataclasses.dataclass(frozen=True)
class OptimConfig:
    """optimizer + schedule (cfg srfdet_voxel_nusc_L.py:346-366)."""
    lr: float = 2e-4
    batch_size_per_device: int = 6
    weight_decay: float = 0.01
    grad_clip: float = 35.0
    warmup_iters: int = 2000           # cfg lr_config warmup_iters=4*500
    warmup_ratio: float = 1.0 / 3
    min_lr_ratio: float = 1e-3
    epochs: int = 20
    freeze_img: bool = False           # freeze_img (detector __init__)
    freeze_lidar: bool = False         # freeze_lidar_components (train.py:221)
    # >1: split each global batch into accum_steps microbatches and
    # accumulate gradients under one jitted lax.scan (train/trainer.py) —
    # reproduces the reference's 8-GPU global batch (2 x 8, dist_train.sh)
    # on fewer chips at 1/accum_steps the activation memory
    accum_steps: int = 1


@dataclasses.dataclass(frozen=True)
class AugConfig:
    """Train-time geometric augmentation (reference train_pipeline blocks).

    Defaults mirror the LiDAR-only nuScenes pipeline
    (srfdet_voxel_nusc_L.py:247-256: GlobalRotScaleTrans rot ±0.785,
    scale 0.9-1.1, trans 0.5; RandomFlip3D h/v 0.5).  The LC fine-tune
    pipelines DROP the geometric augs (srfdet_voxel_nusc_LC.py:226-251 has
    none): rotating/scaling/flipping the lidar frame without compensating
    lidar2img would project boxes onto the wrong image regions."""
    rot_scale_trans: bool = True
    rot_range: Tuple[float, float] = (-0.785, 0.785)
    scale_range: Tuple[float, float] = (0.9, 1.1)
    trans_std: Tuple[float, float, float] = (0.5, 0.5, 0.5)
    flip_horizontal: float = 0.5
    flip_vertical: float = 0.5
    # synced 2D/3D horizontal flip (reference kitti_LC RandomFlip3D
    # sync_2d=True, srfdet_voxel_kitti_LC.py:256 + mmdet3d
    # RandomFlip3D / plugin transform_3d.py:374-430): with probability
    # flip_horizontal, flip the images AND the 3D scene together, with
    # exact lidar2img compensation (image-flip row transform + 3D-flip
    # column negation) so projections stay consistent.  Supersedes the
    # plain flip block when set.
    sync_flip_2d: bool = False
    # per-object noise (mmdet3d ObjectNoise; used by the KITTI L pipeline,
    # reference srfdet_voxel_kitti_L.py:247-251)
    object_noise: bool = False
    object_noise_trans: Tuple[float, float, float] = (1.0, 1.0, 0.5)
    object_noise_rot: Tuple[float, float] = (-0.78539816, 0.78539816)
    object_noise_tries: int = 100

    @staticmethod
    def none() -> "AugConfig":
        return AugConfig(rot_scale_trans=False, flip_horizontal=0.0,
                         flip_vertical=0.0)


@dataclasses.dataclass(frozen=True)
class SRFDetConfig:
    """One experiment = one reference config file."""
    name: str = "srfdet_voxel_nusc_L"
    dataset: str = "nuscenes"          # nuscenes | kitti | waymo
    # model compute dtype ('float32' | 'bfloat16'); losses, assignment and
    # box decode always run fp32, mirroring the reference's force_fp32
    # boundaries (srfdet.py:91,141,204; srfdet_head.py:760,1041,1227)
    compute_dtype: str = "float32"
    class_names: Tuple[str, ...] = (
        "car", "truck", "construction_vehicle", "bus", "trailer", "barrier",
        "motorcycle", "bicycle", "pedestrian", "traffic_cone")
    pc_range: Tuple[float, ...] = (-55.2, -55.2, -5.0, 55.2, 55.2, 3.0)
    voxel_size: Tuple[float, ...] = (0.075, 0.075, 0.2)
    out_size_factor: int = 8
    use_img: bool = False
    # static capacities (TPU): per-sample point and GT buffer sizes
    points_cap: int = 262144
    points_dim: int = 5
    gt_cap: int = 256
    # voxelization (pts_voxel_layer): max_num_points=-1 => dynamic.
    # The reference's hard voxelizer takes max_voxels=(120k train, 160k
    # test) (srfdet_voxel_nusc_L.py:38); we keep ONE static capacity (the
    # train bound — real nuScenes frames occupy far fewer voxels).  For
    # eval at the test bound, override per run:
    #   tools/test.py ... --cfg-options voxels_cap=160000
    max_points_per_voxel: int = 10
    voxels_cap: int = 120000
    vfe: VFEConfig = VFEConfig()
    middle: MiddleConfig = MiddleConfig()
    backbone: BackboneConfig = BackboneConfig()
    neck_out_channels: int = 128
    neck_num_outs: int = 4
    # pts_neck extra-level mode: True = add_extra_convs='on_output'
    # (nusc voxel / waymo / dvoxel configs); False = mmdet's default
    # stride-2 max-pool (pillar + KITTI configs never set
    # add_extra_convs, e.g. srfdet_pillar_nusc_L.py:67-78)
    neck_extra_convs: bool = True
    img: Optional[ImgBranchConfig] = None
    head: HeadConfig = HeadConfig()
    ota: OTAConfig = OTAConfig()
    loss: LossConfig = LossConfig()
    test: TestConfig = TestConfig()
    optim: OptimConfig = OptimConfig()
    aug: AugConfig = AugConfig()

    @property
    def num_classes(self) -> int:
        return len(self.class_names)

    @property
    def voxelization(self) -> VoxelizationSpec:
        return VoxelizationSpec(
            voxel_size=tuple(self.voxel_size),
            point_cloud_range=tuple(self.pc_range),
            max_num_points=self.max_points_per_voxel,
            max_voxels=self.voxels_cap)

    @property
    def grid_size(self) -> Tuple[int, int, int]:
        return self.voxelization.grid_size

    def replace(self, **kw) -> "SRFDetConfig":
        return dataclasses.replace(self, **kw)
