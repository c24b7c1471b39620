"""Voxel feature encoders — point-major segment-op formulations.

TPU-native equivalents of the reference's VFEs:
  - HardSimpleVFE [dep mmdet3d] (cfg srfdet_voxel_nusc_LC.py:70): per-voxel
    mean of (capped) points -> :class:`HardSimpleVFE`.
  - PillarFeatureNetCustom (pillar_encoder_custom.py:14): decorated points +
    PFN layers with per-pillar max -> :class:`PillarFeatureNet`.
  - DynamicVFECustom (voxel_encoder.py:11): cluster/voxel-center/distance
    decorations, centroid-aware pos-enc, VFE layers with scatter-max and
    gather-back concat -> :class:`DynamicVFE`.

All operate on (B, P, C) padded point arrays with per-point voxel slot ids
from :mod:`srfdet3d_tpu.ops.voxelize`; reductions are `jax.ops.segment_*`
instead of mmcv's CUDA DynamicScatter.  Invalid points carry slot id V_cap
and are dropped by the segment ops.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.scatter import segment_mean, segment_max
from ..ops.voxelize import VoxelizationSpec, VoxelizedPoints
from .layers import MaskedBatchNorm


def _gather_voxel_to_point(voxel_feats: jnp.ndarray,
                           point_voxel_idx: jnp.ndarray) -> jnp.ndarray:
    """Gather per-voxel rows back to points; invalid idx V_cap reads zeros."""
    padded = jnp.concatenate(
        [voxel_feats, jnp.zeros_like(voxel_feats[:1])], axis=0)
    return padded[point_voxel_idx]


class HardSimpleVFE(nn.Module):
    """Mean of the (capped) points in each voxel. Parameter-free."""
    num_features: int = 5

    @nn.compact
    def __call__(self, points: jnp.ndarray, vox: VoxelizedPoints,
                 v_cap: int, train: bool = False) -> jnp.ndarray:
        feats = points[:, :self.num_features]
        idx = jnp.where(vox.point_mask, vox.point_voxel_idx, v_cap)
        return segment_mean(feats, idx, v_cap)


class PFNLayer(nn.Module):
    """Linear(no bias) -> masked BN -> ReLU -> per-pillar max [-> concat]."""
    out_channels: int
    last_layer: bool = False
    mode: str = "max"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats, point_mask, point_voxel_idx, v_cap,
                 train=False):
        units = self.out_channels if self.last_layer else self.out_channels // 2
        x = nn.Dense(units, use_bias=False, dtype=self.dtype)(feats)
        x = MaskedBatchNorm(dtype=self.dtype)(x, point_mask, train=train)
        x = nn.relu(x)
        x = jnp.where(point_mask[:, None], x, 0.0)
        idx = jnp.where(point_mask, point_voxel_idx, v_cap)
        if self.mode == "max":
            pooled = segment_max(x, idx, v_cap)
        else:
            pooled = segment_mean(x, idx, v_cap)
        if self.last_layer:
            return pooled, None
        back = _gather_voxel_to_point(pooled, idx)
        return pooled, jnp.concatenate([x, back], axis=-1)


class PillarFeatureNet(nn.Module):
    """PointPillars pillar encoder (reference pillar_encoder_custom.py:14)."""
    in_channels: int = 4
    feat_channels: Sequence[int] = (64,)
    with_distance: bool = False
    with_cluster_center: bool = True
    with_voxel_center: bool = True
    mode: str = "max"
    spec: VoxelizationSpec = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, points: jnp.ndarray, vox: VoxelizedPoints,
                 v_cap: int, train: bool = False) -> jnp.ndarray:
        mask = vox.point_mask
        idx = jnp.where(mask, vox.point_voxel_idx, v_cap)
        feats = [points]
        if self.with_cluster_center:
            mean_xyz = segment_mean(
                jnp.where(mask[:, None], points[:, :3], 0.0), idx, v_cap)
            feats.append(points[:, :3] - _gather_voxel_to_point(mean_xyz, idx))
        if self.with_voxel_center:
            vs = self.spec.voxel_size
            pc = self.spec.point_cloud_range
            coords = vox.voxel_coords  # (V, 3) zyx
            centers = jnp.stack([
                coords[:, 2].astype(jnp.float32) * vs[0] + vs[0] / 2 + pc[0],
                coords[:, 1].astype(jnp.float32) * vs[1] + vs[1] / 2 + pc[1],
                coords[:, 0].astype(jnp.float32) * vs[2] + vs[2] / 2 + pc[2],
            ], axis=-1)
            feats.append(points[:, :3] - _gather_voxel_to_point(centers, idx))
        if self.with_distance:
            feats.append(jnp.linalg.norm(points[:, :3], axis=-1,
                                         keepdims=True))
        x = jnp.concatenate(feats, axis=-1)
        x = jnp.where(mask[:, None], x, 0.0)

        n = len(self.feat_channels)
        for i, ch in enumerate(self.feat_channels):
            pooled, x = PFNLayer(ch, last_layer=(i == n - 1), mode=self.mode,
                                 dtype=self.dtype)(
                x, mask, vox.point_voxel_idx, v_cap,
                train=train)
        return pooled  # (V_cap, feat_channels[-1])


class DynamicVFELayer(nn.Module):
    """Linear(no bias) + masked BN + ReLU (reference utils.py:8-45)."""
    out_channels: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, mask, train=False):
        x = nn.Dense(self.out_channels, use_bias=False, dtype=self.dtype)(x)
        x = MaskedBatchNorm(dtype=self.dtype)(x, mask, train=train)
        return nn.relu(x)


class DynamicVFE(nn.Module):
    """Dynamic (uncapped) VFE with centroid-aware decorations.

    Mirrors DynamicVFECustom (voxel_encoder.py:11-240): cluster-center
    offsets optionally embedded by a Linear-BN-Tanh MLP, voxel-center
    offsets, distance; stacked VFE layers with scatter-max + gather-back
    concat between layers.
    """
    in_channels: int = 4
    feat_channels: Sequence[int] = (64, 128)
    with_distance: bool = False
    with_cluster_center: bool = True
    with_voxel_center: bool = True
    with_centroid_aware: bool = True
    centroid_pos_emb_dims: int = 32
    mode: str = "max"
    spec: VoxelizationSpec = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, points: jnp.ndarray, vox: VoxelizedPoints,
                 v_cap: int, train: bool = False) -> jnp.ndarray:
        mask = vox.point_mask
        idx = jnp.where(mask, vox.point_voxel_idx, v_cap)
        feats = [points]
        if self.with_cluster_center:
            mean_xyz = segment_mean(
                jnp.where(mask[:, None], points[:, :3], 0.0), idx, v_cap)
            f_cluster = points[:, :3] - _gather_voxel_to_point(mean_xyz, idx)
            if self.with_centroid_aware:
                y = nn.Dense(self.centroid_pos_emb_dims, use_bias=False,
                             dtype=self.dtype)(f_cluster)
                y = MaskedBatchNorm(dtype=self.dtype)(y, mask, train=train)
                y = jnp.tanh(y)
                y = nn.Dense(self.centroid_pos_emb_dims, use_bias=False,
                             dtype=self.dtype)(y)
                y = MaskedBatchNorm(dtype=self.dtype)(y, mask, train=train)
                f_cluster = jnp.tanh(y)
            feats.append(f_cluster)
        if self.with_voxel_center:
            vs = self.spec.voxel_size
            pc = self.spec.point_cloud_range
            coords = vox.voxel_coords
            centers = jnp.stack([
                coords[:, 2].astype(jnp.float32) * vs[0] + vs[0] / 2 + pc[0],
                coords[:, 1].astype(jnp.float32) * vs[1] + vs[1] / 2 + pc[1],
                coords[:, 0].astype(jnp.float32) * vs[2] + vs[2] / 2 + pc[2],
            ], axis=-1)
            feats.append(points[:, :3] - _gather_voxel_to_point(centers, idx))
        if self.with_distance:
            feats.append(jnp.linalg.norm(points[:, :3], axis=-1,
                                         keepdims=True))
        x = jnp.concatenate(feats, axis=-1)
        x = jnp.where(mask[:, None], x, 0.0)

        n = len(self.feat_channels)
        voxel_feats = None
        for i, ch in enumerate(self.feat_channels):
            x = DynamicVFELayer(ch, dtype=self.dtype)(x, mask, train=train)
            x = jnp.where(mask[:, None], x, 0.0)
            if self.mode == "max":
                voxel_feats = segment_max(x, idx, v_cap)
            else:
                voxel_feats = segment_mean(x, idx, v_cap)
            if i != n - 1:
                back = _gather_voxel_to_point(voxel_feats, idx)
                x = jnp.concatenate([x, back], axis=-1)
        return voxel_feats  # (V_cap, feat_channels[-1])
