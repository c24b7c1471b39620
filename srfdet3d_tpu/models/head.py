"""SRFDet decoder head: DPG, iterative refinement, fusion — fully batched.

TPU-native redesign of the reference's sparse_heads/srfdet_head.py (2693
lines): SRFDetHead (:48), SingleSRFDetHeadLiDAR (:1348), SingleSRFDetHeadImg
(:1692), SingleSRFDetHead fusion (:2104), DynamicConv (:2633).

Key design differences from the reference (semantics preserved):
  - one `SingleSRFDetHead` module covers the LiDAR / image / fusion variants
    via flags (the reference keeps three near-identical 400-line classes);
  - no per-sample python loops: RoI sampling, NMS and decoding are vmapped,
    multi-camera RoIs are one big batched gather;
  - box buffers are never mutated in place.  The reference's single heads
    denormalize proposal centers in-place inside the RoI samplers, so its
    `apply_deltas` sees ABSOLUTE centers and re-normalizes at the end
    (srfdet_head.py:2043-2051 + :2317); we make that contract explicit.

Box code throughout: [cx, cy, cz, log w, log l, log h, sin, cos (, vx, vy)]
with centers normalized to [0, 1] within pc_range between refinement
iterations, and absolute in the returned predictions (head forward
denormalizes at the end, reference srfdet_head.py:478-495).
"""

from __future__ import annotations

import math
from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..geometry.boxes import boxes3d_to_corners3d, denormalize_bbox
from ..geometry.iou import multiclass_nms_3d
from ..ops.roi_align import multilevel_roi_align
from ..parallel.mesh import shard_proposal_axis
from .layers import ConvBNReLU

_DEFAULT_SCALE_CLAMP = math.log(100000.0 / 16)
_XAVIER = nn.initializers.xavier_uniform()


def _focal_bias(prior_prob: float) -> float:
    return -math.log((1 - prior_prob) / prior_prob)


def _torch_nearest_resize(x: jnp.ndarray, hw: Tuple[int, int]) -> jnp.ndarray:
    """torch F.interpolate(mode='nearest') on (N, H, W, C): legacy
    floor(i * in/out) source indexing (NOT half-pixel — jax.image.resize's
    'nearest' picks floor((i+0.5) * in/out), which differs whenever the
    input size doesn't divide the output, e.g. the LC 29x50 -> 30x30 DPG
    resize).  Static shapes, so indices are trace-time constants."""
    h, w = x.shape[1], x.shape[2]
    iy = (np.arange(hw[0]) * (h / hw[0])).astype(np.int32)
    ix = (np.arange(hw[1]) * (w / hw[1])).astype(np.int32)
    return x[:, iy][:, :, ix]


def denormalize_centers(boxes: jnp.ndarray, pc_range) -> jnp.ndarray:
    """[0, 1] centers -> absolute within pc_range (columns 0:3)."""
    lo = jnp.asarray(pc_range[:3], boxes.dtype)
    hi = jnp.asarray(pc_range[3:6], boxes.dtype)
    ctr = boxes[..., :3] * (hi - lo) + lo
    return jnp.concatenate([ctr, boxes[..., 3:]], axis=-1)


class DynamicConv(nn.Module):
    """Proposal-conditioned dynamic 1x1 convs over the RoI grid.

    Reference srfdet_head.py:2633-2693: parameters for two bmm stages are
    generated per proposal, followed by a flatten + out projection.
    """
    feat_channels: int
    dynamic_dim: int = 64
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, prop_feats: jnp.ndarray,
                 roi_feats: jnp.ndarray) -> jnp.ndarray:
        """prop_feats (N, C), roi_feats (N, S, C) -> (N, C)."""
        n, s, c = roi_feats.shape
        d = self.dynamic_dim
        params = nn.Dense(2 * c * d, kernel_init=_XAVIER,
                          dtype=self.dtype)(prop_feats)        # (N, 2*C*d)
        p1 = params[:, :c * d].reshape(n, c, d)
        p2 = params[:, c * d:].reshape(n, d, c)

        f = jnp.einsum("nsc,ncd->nsd", roi_feats, p1)
        f = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)(f)
        f = nn.relu(f)
        f = jnp.einsum("nsd,ndc->nsc", f, p2)
        f = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)(f)
        f = nn.relu(f)

        f = f.reshape(n, s * c)
        f = nn.Dense(self.feat_channels, kernel_init=_XAVIER,
                     dtype=self.dtype)(f)
        f = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)(f)
        return nn.relu(f)


def lidar_rois_from_boxes(boxes_abs: jnp.ndarray, pc_range, voxel_size
                          ) -> jnp.ndarray:
    """BEV axis-aligned RoIs from (.., code) boxes with ABSOLUTE centers.

    Mirrors points_feats_sampling_bboxes_roi (srfdet_head.py:1627-1690):
    corners (sin/cos yaw, exp of log sizes) -> BEV pixel frame -> min/max.
    Returns (..., 4) [x1, y1, x2, y2] in the stride-1 BEV grid frame.
    """
    corners = boxes3d_to_corners3d(boxes_abs[..., :8], bottom_center=False,
                                   yaw_as_sincos=True, log_size=True)
    lo = jnp.asarray(pc_range[:2], boxes_abs.dtype)
    vs = jnp.asarray(voxel_size[:2], boxes_abs.dtype)
    xy = (corners[..., :2] - lo) / vs                  # (..., 8, 2)
    mn = jnp.min(xy, axis=-2)
    mx = jnp.max(xy, axis=-2)
    return jnp.concatenate([mn, mx], axis=-1)


def img_rois_from_boxes(boxes_abs: jnp.ndarray,
                        lidar2img: jnp.ndarray) -> jnp.ndarray:
    """Per-camera image RoIs by projecting 3D corners.

    boxes_abs (B, n_p, code) with absolute centers; lidar2img (B, n_cam, 4, 4).
    Returns (B, n_cam, n_p, 4) [x1, y1, x2, y2] in image pixels.
    Mirrors img_feats_sampling_bboxes_roi (srfdet_head.py:2424-2529),
    including the z clamp at eps=1e-5 (points behind the camera project to
    huge boxes the RoIAlign then samples as zeros/edges — reference behavior).
    """
    corners = boxes3d_to_corners3d(boxes_abs[..., :8], bottom_center=False,
                                   yaw_as_sincos=True, log_size=True)
    ones = jnp.ones_like(corners[..., :1])
    hom = jnp.concatenate([corners, ones], axis=-1)    # (B, n_p, 8, 4)
    # (B, cam, 4, 4) x (B, n_p, 8, 4) -> (B, cam, n_p, 8, 4)
    cam = jnp.einsum("bkij,bpcj->bkpci", lidar2img, hom)
    eps = 1e-5
    z = jnp.maximum(cam[..., 2:3], eps)
    xy = cam[..., 0:2] / z                             # (B, cam, n_p, 8, 2)
    mn = jnp.min(xy, axis=-2)
    mx = jnp.max(xy, axis=-2)
    return jnp.concatenate([mn, mx], axis=-1)


def pooled_img_roi(img_feats, cam_rois, strides, res: int,
                   cap: int = 0, patch: int = 0,
                   patch_fallback: int = -1, xpatch: int = 0,
                   xpatch_fallback: int = -1) -> jnp.ndarray:
    """Camera-summed multi-level RoI pooling (reference
    img_feats_sampling_bboxes_roi, srfdet_head.py:1963-2103: RoIAlign per
    camera then sum over cameras).

    img_feats: list of (B, n_cam, H_l, W_l, C); cam_rois (B, n_cam, n_p, 4)
    image-pixel [x1, y1, x2, y2].  Returns (B, n_p, res, res, C).

    cap == 0: gather every (camera, proposal) pair like the reference.
    cap > 0: TPU-native compaction — a proposal's box projects into 1-2 of
    the 6 surround cameras, and a pair whose RoI misses the image samples
    only out-of-bounds positions, contributing exactly zero to the sum.
    Such pairs are skipped by compacting the intersecting pairs of each
    (sample, camera) into a `cap`-slot buffer (prefix-sum slots), pooling
    only those, and scatter-adding back per proposal.  Exact whenever each
    camera has <= cap intersecting pairs; overflow pairs are dropped
    (capacity discipline like every other static buffer here).
    """
    b, n_cam, n_p, _ = cam_rois.shape
    c = img_feats[0].shape[-1]
    flat_feats = tuple(f.reshape((b * n_cam,) + f.shape[2:])
                       for f in img_feats)
    if not cap:
        flat_rois = cam_rois.reshape(b * n_cam, n_p, 4)
        per_cam = jax.vmap(
            lambda feats, r: multilevel_roi_align(
                feats, r, strides, out_size=res, patch=patch,
                patch_fallback=patch_fallback, xpatch=xpatch,
                xpatch_fallback=xpatch_fallback))(flat_feats, flat_rois)
        return jnp.sum(per_cam.reshape((b, n_cam, n_p, res, res, c)),
                       axis=1)

    h_img = img_feats[0].shape[2] * strides[0]
    w_img = img_feats[0].shape[3] * strides[0]
    vis = _visible_mask(cam_rois, (h_img, w_img), strides)
    bc = b * n_cam
    vis_f = vis.reshape(bc, n_p)
    slot = jnp.cumsum(vis_f.astype(jnp.int32), axis=1) - 1     # (BC, n_p)
    slot = jnp.where(vis_f & (slot < cap), slot, cap)
    rows = jnp.arange(bc, dtype=jnp.int32)[:, None]
    # off-image placeholder RoI: all samples OOB -> exact zero rows
    rois_c = jnp.full((bc, cap + 1, 4), -1e6, cam_rois.dtype)
    rois_c = rois_c.at[rows, slot].set(
        cam_rois.reshape(bc, n_p, 4), mode="drop")[:, :cap]
    src = jnp.full((bc, cap + 1), n_p, jnp.int32)
    src = src.at[rows, slot].set(
        jnp.broadcast_to(jnp.arange(n_p, dtype=jnp.int32), (bc, n_p)),
        mode="drop")[:, :cap]                                  # (BC, cap)

    per_cam = jax.vmap(
        lambda feats, r: multilevel_roi_align(
            feats, r, strides, out_size=res, patch=patch,
            patch_fallback=patch_fallback, xpatch=xpatch,
            xpatch_fallback=xpatch_fallback))(flat_feats, rois_c)
    # scatter-add pooled slots back to their proposals
    b_idx = jnp.repeat(jnp.arange(b, dtype=jnp.int32), n_cam)[:, None]
    flat_prop = jnp.where(src < n_p, b_idx * n_p + src, b * n_p)
    out = jnp.zeros((b * n_p + 1, res * res * c), per_cam.dtype)
    out = out.at[flat_prop.reshape(-1)].add(
        per_cam.reshape(bc * cap, res * res * c), mode="drop")
    return out[:b * n_p].reshape(b, n_p, res, res, c)


def _visible_mask(cam_rois: jnp.ndarray, img_shape: Tuple[int, int],
                  strides) -> jnp.ndarray:
    """Which (.., RoI) entries intersect the image (+ sampling margin).

    The margin covers the coarsest level's half-pixel sample reach
    (-0.5 * stride); beyond it every bilinear sample is out of bounds and
    contributes exactly zero.  ONE definition shared by the compaction
    (pooled_img_roi) and its sizing diagnostic (visible_pair_counts)."""
    h_img, w_img = img_shape
    margin = float(2 * max(strides))
    x1, y1 = cam_rois[..., 0], cam_rois[..., 1]
    x2, y2 = cam_rois[..., 2], cam_rois[..., 3]
    return ((x2 >= -margin) & (x1 <= w_img + margin) &
            (y2 >= -margin) & (y1 <= h_img + margin))


def visible_pair_counts(cam_rois: jnp.ndarray, img_shape: Tuple[int, int],
                        strides) -> jnp.ndarray:
    """Per-(sample, camera) count of RoIs `pooled_img_roi` would keep.

    Diagnostic for sizing `img_roi_cap`: the compaction is exact only while
    every camera's intersecting-pair count stays <= cap.  Note boxes BEHIND
    a camera project to enormous RoIs (z clamped at 1e-5 in
    img_rois_from_boxes) that straddle the image and therefore COUNT —
    matching the reference, which RoIAligns every (camera, proposal) pair."""
    return jnp.sum(_visible_mask(cam_rois, img_shape, strides), axis=-1)


class SingleSRFDetHead(nn.Module):
    """One refinement iteration (LiDAR / image / fusion).

    Reference classes SingleSRFDetHeadLiDAR (srfdet_head.py:1348),
    SingleSRFDetHeadImg (:1692), SingleSRFDetHead (:2104).
    """
    num_classes: int
    feat_channels: int = 128
    pooler_resolution: int = 7
    dim_feedforward: int = 512
    num_cls_convs: int = 2
    num_reg_convs: int = 3
    num_attn_heads: int = 8
    dropout: float = 0.1
    scale_clamp: float = _DEFAULT_SCALE_CLAMP
    code_size: int = 10
    dynamic_dim: int = 32
    pc_range: Sequence[float] = (-55.2, -55.2, -5.0, 55.2, 55.2, 3.0)
    voxel_size: Sequence[float] = (0.075, 0.075, 0.2)
    use_pts: bool = True
    use_img: bool = False
    lidar_strides: Sequence[int] = (8, 16, 32, 64)
    img_strides: Sequence[int] = (4, 8, 16, 32)
    prior_prob: float = 0.01
    # >0: compacted visible-pair image RoI gather (see pooled_img_roi)
    img_roi_cap: int = 0
    # >0: patch-gather RoIAlign window (ops/roi_align.py multilevel_roi_align)
    # for the BEV (lidar) RoI path.  Measured on v5e at flagship shapes:
    # fwd 29.8 vs 32.3 ms, grad 40.6 vs 44.1 ms, ZERO misfits at 32.
    roi_patch: int = 0
    roi_patch_fallback: int = -1
    # separate knob for the image RoI path: projected camera RoIs are much
    # larger (123/900 misfits per cam at patch 32 on synthetic worst case),
    # and the patch+fallback program exceeded the remote-compile relay's
    # request size limit — keep pair-gathers there until measured.
    img_roi_patch: int = 0
    img_roi_patch_fallback: int = -1
    # x-patch hybrid for the image RoI path (pairs in y, row slices in
    # x — 14x fewer slices; ops/roi_align._mla_xpatch): y-elongated
    # projections keep the fast path, x-misfits take the fallback
    img_roi_xpatch: int = 0
    img_roi_xpatch_fallback: int = -1
    dtype: Any = jnp.float32

    @property
    def use_fusion(self) -> bool:
        return self.use_pts and self.use_img

    @nn.compact
    def __call__(self,
                 point_feats: Optional[Sequence[jnp.ndarray]],
                 img_feats: Optional[Sequence[jnp.ndarray]],
                 bboxes: jnp.ndarray,
                 prop_feats: Optional[jnp.ndarray],
                 lidar2img: Optional[jnp.ndarray] = None,
                 train: bool = False):
        """One iteration.

        Args:
          point_feats: list of (B, H, W, C) BEV maps (strides lidar_strides).
          img_feats: list of (B, n_cam, H, W, C) (strides img_strides).
          bboxes: (B, n_p, code) proposals, centers normalized [0, 1].
          prop_feats: (B, n_p, C) or None (first iteration without DPG).
          lidar2img: (B, n_cam, 4, 4) projection matrices.

        Returns: (logits (B, n_p, #cls), boxes (B, n_p, code) normalized
          centers, obj_feats (B, n_p, C)).
        """
        bs, n_p = bboxes.shape[:2]
        c = self.feat_channels
        res = self.pooler_resolution
        boxes_abs = denormalize_centers(bboxes, self.pc_range)

        pts_roi = img_roi = None
        if self.use_pts:
            rois = lidar_rois_from_boxes(boxes_abs, self.pc_range,
                                         self.voxel_size)       # (B, n_p, 4)
            pts_roi = jax.vmap(
                lambda feats, r: multilevel_roi_align(
                    feats, r, self.lidar_strides, out_size=res,
                    patch=self.roi_patch,
                    patch_fallback=self.roi_patch_fallback))(
                tuple(point_feats), rois)                # (B, n_p, 7, 7, C)
        if self.use_img:
            cam_rois = img_rois_from_boxes(boxes_abs, lidar2img)
            img_roi = pooled_img_roi(img_feats, cam_rois, self.img_strides,
                                     res, cap=self.img_roi_cap,
                                     patch=self.img_roi_patch,
                                     patch_fallback=self.img_roi_patch_fallback,
                                     xpatch=self.img_roi_xpatch,
                                     xpatch_fallback=self.img_roi_xpatch_fallback)

        if self.use_fusion:
            fused = jnp.concatenate([img_roi, pts_roi], axis=-1)
            roi_feats = nn.Dense(c, kernel_init=_XAVIER, dtype=self.dtype,
                                 name="output_fused_proj")(fused)
        else:
            roi_feats = pts_roi if pts_roi is not None else img_roi
        roi_feats = roi_feats.reshape(bs, n_p, res * res, c)
        # optional proposal-axis model parallelism (no-op outside a
        # parallel.proposal_sharding(mesh) trace — see parallel/mesh.py)
        roi_feats = shard_proposal_axis(roi_feats)

        if prop_feats is None:
            prop_feats = jnp.mean(roi_feats, axis=2)            # (B, n_p, C)

        # proposal self-attention (reference srfdet_head.py:2286-2291)
        attn = nn.MultiHeadDotProductAttention(
            num_heads=self.num_attn_heads, qkv_features=c, out_features=c,
            dropout_rate=self.dropout, kernel_init=_XAVIER, dtype=self.dtype,
            name="self_attn")(
            prop_feats, prop_feats, deterministic=not train)
        x = prop_feats + nn.Dropout(self.dropout, deterministic=not train)(
            attn)
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)(x)

        # instance interaction: per-proposal dynamic conv over its RoI
        flat = x.reshape(bs * n_p, c)
        inter = DynamicConv(c, dynamic_dim=self.dynamic_dim, dtype=self.dtype,
                            name="inst_interact")(
            flat, roi_feats.reshape(bs * n_p, res * res, c))
        x = flat + nn.Dropout(self.dropout, deterministic=not train)(inter)
        obj = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)(x)  # (B*n_p, C)

        # FFN
        y = nn.Dense(self.dim_feedforward, kernel_init=_XAVIER,
                     dtype=self.dtype)(obj)
        y = nn.Dropout(self.dropout, deterministic=not train)(nn.relu(y))
        y = nn.Dense(c, kernel_init=_XAVIER, dtype=self.dtype)(y)
        obj = obj + nn.Dropout(self.dropout, deterministic=not train)(y)
        obj = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)(obj)

        cls_f, reg_f = obj, obj
        for i in range(self.num_cls_convs):
            cls_f = nn.Dense(c, use_bias=False, kernel_init=_XAVIER,
                             dtype=self.dtype, name=f"cls_{i}")(cls_f)
            cls_f = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)(cls_f)
            cls_f = nn.relu(cls_f)
        for i in range(self.num_reg_convs):
            reg_f = nn.Dense(c, use_bias=False, kernel_init=_XAVIER,
                             dtype=self.dtype, name=f"reg_{i}")(reg_f)
            reg_f = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)(reg_f)
            reg_f = nn.relu(reg_f)

        logits = nn.Dense(
            self.num_classes, kernel_init=_XAVIER,
            bias_init=nn.initializers.constant(_focal_bias(self.prior_prob)),
            dtype=self.dtype, name="class_logits")(cls_f)
        deltas = nn.Dense(self.code_size, kernel_init=_XAVIER,
                          dtype=self.dtype, name="bboxes_delta")(reg_f)
        pred = self.apply_deltas(deltas.reshape(bs, n_p, -1), boxes_abs)
        return (logits.reshape(bs, n_p, -1), pred,
                obj.reshape(bs, n_p, c))

    def apply_deltas(self, deltas: jnp.ndarray,
                     boxes_abs: jnp.ndarray) -> jnp.ndarray:
        """Refine boxes (reference apply_deltas_lidar, srfdet_head.py:1534).

        deltas (.., code); boxes_abs (.., code) with ABSOLUTE centers and log
        sizes.  Center deltas are scaled by box extents; sin/cos (and vx/vy)
        are REPLACED by the deltas, not accumulated.  Output centers are
        re-normalized to [0, 1] and clipped.
        """
        d = deltas.astype(jnp.float32)
        b = boxes_abs.astype(jnp.float32)
        sizes = jnp.exp(b[..., 3:6])                    # (w, l, h) raw
        ctr = b[..., 0:3] + d[..., 0:3] * sizes
        dsize = jnp.minimum(d[..., 3:6], self.scale_clamp)
        new_sizes = b[..., 3:6] + dsize                 # log-space add
        lo = jnp.asarray(self.pc_range[:3], jnp.float32)
        hi = jnp.asarray(self.pc_range[3:6], jnp.float32)
        ctr = jnp.clip((ctr - lo) / (hi - lo), 0.0, 1.0)
        # boxes stay fp32 regardless of compute dtype: bf16 would quantize
        # normalized centers by ~4e-3 (~0.5 m at nuScenes range)
        return jnp.concatenate([ctr, new_sizes, d[..., 6:]], axis=-1)


class SRFDetHead(nn.Module):
    """Full decoder: DPG + `num_heads` refinement iterations.

    Reference SRFDetHead (srfdet_head.py:48-1345).
    """
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
    is_kitti: bool = False
    use_img: bool = False
    code_size: int = 10
    with_dpg: bool = True
    num_dpg_exp: int = 4
    with_lidar_encoder: bool = False
    pc_range: Sequence[float] = (-55.2, -55.2, -5.0, 55.2, 55.2, 3.0)
    voxel_size: Sequence[float] = (0.075, 0.075, 0.2)
    # single-head knobs (cfg single_head_lidar, srfdet_voxel_nusc_L.py:115)
    dim_feedforward: int = 512
    num_cls_convs: int = 2
    num_reg_convs: int = 3
    num_attn_heads: int = 8
    dropout: float = 0.1
    dynamic_dim: int = 32
    lidar_strides: Sequence[int] = (8, 16, 32, 64)
    img_strides: Sequence[int] = (4, 8, 16, 32)
    img_roi_cap: int = 0
    roi_patch: int = 0
    roi_patch_fallback: int = -1
    img_roi_patch: int = 0
    img_roi_patch_fallback: int = -1
    img_roi_xpatch: int = 0
    img_roi_xpatch_fallback: int = -1
    # unroll the refinement scan when tracing TRAIN programs: the scanned
    # backward pays ~43 ms of loop machinery at flagship scale (stacked-
    # residual dynamic-update-slices + per-iteration param gathers) that
    # disappears when lax.scan inlines the bodies (measured 121 -> 78 ms
    # head bwd, tools/bench_head_parts.py).  Param structure is unchanged
    # (still stacked (num_heads, ...) leaves), predict keeps the rolled
    # scan (5x smaller HLO; the remote TPU compiler is the bottleneck).
    unroll_train: bool = False
    # unroll the scan in predict traces too (A/B for the dispatch-bound
    # head forward; larger HLO for the remote compiler)
    unroll_predict: bool = False
    # rematerialize each refinement iteration in the backward pass: the
    # scan keeps only the (boxes, prop_feats) carry per iteration and
    # recomputes RoI gathers/attention instead of storing them — trades
    # ~1 extra forward of the decoder for O(num_heads) activation memory
    # (jax.checkpoint; useful for large train batches on real chips)
    remat: bool = False
    dtype: Any = jnp.float32

    def _dpg_weights(self, feats: Sequence[jnp.ndarray], tag: str,
                     fc1_dim: int, train: bool) -> jnp.ndarray:
        """DPG staircase (reference _get_init_proposals, srfdet_head.py:524).

        feats: list of (B, H_l, W_l, C) maps, halving resolution per level.
        Returns (B, num_dpg_exp, n_p) raw mixture logits.
        """
        x = feats[0]
        for lvl in range(len(feats) - 1):
            ch = x.shape[-1]
            x = ConvBNReLU(ch, kernel=3, stride=2, padding=1, groups=ch,
                           dtype=self.dtype,
                           name=f"dpg_dw_{tag}_{lvl}")(x, train=train)
            x = jnp.concatenate([feats[lvl + 1], x], axis=-1)
        w = jnp.sum(x, axis=-1)                       # (B, H, W)
        w = w.reshape(w.shape[0], -1)
        w = nn.Dense(fc1_dim, kernel_init=_XAVIER, dtype=self.dtype,
                     name=f"dpg_fc1_{tag}")(w)
        w = nn.relu(w)
        w = nn.Dense(self.num_dpg_exp * self.num_proposals,
                     kernel_init=_XAVIER, dtype=self.dtype,
                     name=f"dpg_fc2_{tag}")(w)
        return w.reshape(-1, self.num_dpg_exp, self.num_proposals)

    @nn.compact
    def __call__(self,
                 point_feats: Optional[Sequence[jnp.ndarray]],
                 img_feats: Optional[Sequence[jnp.ndarray]] = None,
                 lidar2img: Optional[jnp.ndarray] = None,
                 train: bool = False):
        """Forward (reference srfdet_head.py:379-505).

        Args:
          point_feats: list of (B, H, W, C_lidar) BEV maps, strides 8-64.
          img_feats: list of (B, n_cam, H, W, C_img) maps, strides 4-32.
          lidar2img: (B, n_cam, 4, 4).

        Returns:
          pred_logits (L, B, n_p, #cls), pred_boxes (L, B, n_p, code) with
          ABSOLUTE centers (denormalized, reference srfdet_head.py:478-495).
        """
        bs = (point_feats[0] if point_feats is not None
              else img_feats[0]).shape[0]
        n_p, n_exp = self.num_proposals, self.num_dpg_exp

        # optional deformable-attention BEV encoder
        # (reference srfdet_head.py:399-401; off in all shipped configs)
        if self.with_lidar_encoder and point_feats is not None:
            from .deform_attn import LidarBEVEncoder
            point_feats = list(LidarBEVEncoder(
                self.feat_channels_lidar, dtype=self.dtype,
                name="lidar_encoder")(point_feats, train=train))

        # reduce image channels to hidden_dim (reference srfdet_head.py:404)
        if self.use_img and self.hidden_dim != self.feat_channels_img:
            img_feats = [
                nn.Conv(self.hidden_dim, (3, 3), padding=1, dtype=self.dtype,
                        name=f"img_conv_{i}")(f)
                for i, f in enumerate(img_feats)]

        n_emb = n_exp * n_p if self.with_dpg else n_p
        boxes_emb = self.param("init_proposal_boxes",
                               nn.initializers.normal(1.0),
                               (n_emb, self.code_size), jnp.float32)
        feats_emb = self.param("init_proposal_feats",
                               nn.initializers.normal(1.0),
                               (n_emb, self.feat_channels_lidar), jnp.float32)

        if self.with_dpg:
            if point_feats is None:
                # the DPG staircase is built over the BEV pyramid; no
                # image-only config exists in the reference either
                raise ValueError("with_dpg=True requires point_feats "
                                 "(image-only DPG is not supported)")
            w = self._dpg_weights(point_feats, "lidar", 1024, train)
            if self.use_img:
                # per-camera staircase then sum over cameras; resized to a
                # fixed square so the fc input is static
                # (reference srfdet_head.py:555-596)
                n_cam = img_feats[0].shape[1]
                flat = [f.reshape((bs * n_cam,) + f.shape[2:])
                        for f in img_feats]
                x = flat[0]
                for lvl in range(len(flat) - 1):
                    ch = x.shape[-1]
                    x = ConvBNReLU(ch, kernel=3, stride=2, padding=1,
                                   groups=ch, dtype=self.dtype,
                                   name=f"dpg_dw_img_{lvl}")(x, train=train)
                    x = jnp.concatenate([flat[lvl + 1], x], axis=-1)
                hw = (30, 15) if self.is_kitti else (30, 30)
                x = _torch_nearest_resize(x, hw)
                x = x.reshape((bs, n_cam) + x.shape[1:]).sum(axis=1)
                wimg = jnp.sum(x, axis=-1).reshape(bs, -1)
                wimg = nn.Dense(1500, kernel_init=_XAVIER, dtype=self.dtype,
                                name="dpg_fc1_img")(wimg)
                wimg = nn.relu(wimg)
                wimg = nn.Dense(n_exp * n_p, kernel_init=_XAVIER,
                                dtype=self.dtype, name="dpg_fc2_img")(wimg)
                w = (w + wimg.reshape(bs, n_exp, n_p)) / 2.0
            w = jax.nn.softmax(w, axis=1)                  # (B, n_exp, n_p)
            boxes0 = jnp.einsum(
                "ben,end->bnd", w,
                boxes_emb.reshape(n_exp, n_p, self.code_size))
            feats0 = jnp.einsum(
                "ben,enc->bnc", w,
                feats_emb.reshape(n_exp, n_p, self.feat_channels_lidar))
        else:
            boxes0 = jnp.broadcast_to(boxes_emb[None],
                                      (bs, n_p, self.code_size))
            feats0 = jnp.broadcast_to(
                feats_emb[None], (bs, n_p, self.feat_channels_lidar))

        # centers via sigmoid -> [0, 1] (reference srfdet_head.py:425-426);
        # box buffers are fp32 always (see apply_deltas)
        boxes = jnp.concatenate(
            [jax.nn.sigmoid(boxes0[..., :3]), boxes0[..., 3:]], axis=-1)
        boxes = shard_proposal_axis(boxes.astype(jnp.float32))
        prop_feats = shard_proposal_axis(feats0.astype(self.dtype))

        # The refinement iterations share structure with per-iteration
        # weights, so they compile as ONE scanned program (5x smaller HLO
        # than unrolling; the remote TPU compiler is the bottleneck).
        single_kwargs = dict(
            num_classes=self.num_classes,
            feat_channels=self.feat_channels_lidar,
            dim_feedforward=self.dim_feedforward,
            num_cls_convs=self.num_cls_convs,
            num_reg_convs=self.num_reg_convs,
            num_attn_heads=self.num_attn_heads,
            dropout=self.dropout,
            code_size=self.code_size,
            dynamic_dim=self.dynamic_dim,
            pc_range=tuple(self.pc_range),
            voxel_size=tuple(self.voxel_size),
            use_pts=point_feats is not None,
            use_img=self.use_img and img_feats is not None,
            lidar_strides=tuple(self.lidar_strides),
            img_strides=tuple(self.img_strides),
            img_roi_cap=self.img_roi_cap,
            roi_patch=self.roi_patch,
            roi_patch_fallback=self.roi_patch_fallback,
            img_roi_patch=self.img_roi_patch,
            img_roi_patch_fallback=self.img_roi_patch_fallback,
            img_roi_xpatch=self.img_roi_xpatch,
            img_roi_xpatch_fallback=self.img_roi_xpatch_fallback,
            prior_prob=self.prior_prob,
            dtype=self.dtype)

        class _ScanBody(nn.Module):
            train: bool = False

            @nn.compact
            def __call__(self, carry, _):
                boxes, prop_feats = carry
                logits, pred, prop_feats = SingleSRFDetHead(
                    **single_kwargs, name="single_head")(
                    point_feats, img_feats, boxes, prop_feats, lidar2img,
                    train=self.train)
                # keep the carry proposal-sharded across iterations so the
                # scan body stays partitioned (no-op without a model mesh)
                pred = shard_proposal_axis(pred)
                prop_feats = shard_proposal_axis(prop_feats)
                # boxes detached between iterations (reference :441,458)
                return (jax.lax.stop_gradient(pred), prop_feats), \
                    (logits, pred)

        body = nn.remat(_ScanBody, prevent_cse=False) if self.remat \
            else _ScanBody
        scan = nn.scan(
            body,
            variable_axes={"params": 0},
            split_rngs={"params": True, "dropout": True},
            length=self.num_heads,
            in_axes=0, out_axes=0,
            unroll=self.num_heads
            if (self.unroll_train if train else self.unroll_predict)
            else 1)
        (_, _), (logits_all, boxes_all) = scan(
            train=train, name="head_series")(
            (boxes, prop_feats), jnp.zeros((self.num_heads,)))

        if self.deep_supervision:
            pred_logits = logits_all
            pred_boxes = boxes_all
        else:
            pred_logits = logits_all[-1:]
            pred_boxes = boxes_all[-1:]
        pred_boxes = denormalize_centers(pred_boxes, self.pc_range)
        return pred_logits, pred_boxes


def decode_boxes(pred_logits: jnp.ndarray,
                 pred_boxes: jnp.ndarray,
                 use_nms: bool = True,
                 nms_thr: float = 0.4,
                 score_thr: float = 0.1,
                 max_per_img: int = 300,
                 post_center_range: Sequence[float] = (
                     -61.2, -61.2, -10.0, 61.2, 61.2, 10.0)):
    """Decode last-layer predictions into final detections (static shape).

    Mirrors SRFDetHead.get_bboxes (reference srfdet_head.py:1228-1334):
    sigmoid scores -> denormalize (exp sizes, atan2 yaw) -> gravity->bottom
    center -> rotated multiclass NMS (or plain top-k) -> post-center filter.

    Args:
      pred_logits: (B, n_p, #cls) LAST decoder layer.
      pred_boxes: (B, n_p, code) absolute centers.

    Returns: dict with boxes (B, max_per_img, 7|9) bottom-center z,
      scores (B, max_per_img), labels (B, max_per_img), valid mask.
    """
    scores = jax.nn.sigmoid(pred_logits.astype(jnp.float32))
    raw = denormalize_bbox(pred_boxes.astype(jnp.float32))  # (B, n_p, 7|9)
    raw = raw.at[..., 2].add(-0.5 * raw[..., 5])            # bottom center

    if use_nms:
        bev = jnp.concatenate(
            [raw[..., 0:2], raw[..., 3:5], raw[..., 6:7]], axis=-1)
        out_b, out_s, out_l, out_v = jax.vmap(
            lambda b, bv, s: multiclass_nms_3d(
                b, bv, s, score_thr, max_per_img, nms_thr))(raw, bev, scores)
    else:
        b, n_p, c = scores.shape
        flat = scores.reshape(b, n_p * c)
        k_eff = min(max_per_img, n_p * c)   # static output stays max_per_img
        out_s, idx = jax.lax.top_k(flat, k_eff)
        if k_eff < max_per_img:
            pad = max_per_img - k_eff
            out_s = jnp.pad(out_s, ((0, 0), (0, pad)))
            idx = jnp.pad(idx, ((0, 0), (0, pad)))
        out_l = idx % c
        box_idx = idx // c
        out_b = jnp.take_along_axis(raw, box_idx[..., None], axis=1)
        out_v = jnp.pad(
            jnp.ones((b, k_eff), bool), ((0, 0), (0, max_per_img - k_eff)))

    pcr = jnp.asarray(post_center_range, jnp.float32)
    in_range = jnp.all(out_b[..., :3] >= pcr[:3], axis=-1) & \
        jnp.all(out_b[..., :3] <= pcr[3:], axis=-1)
    return {
        "boxes": out_b,
        "scores": out_s,
        "labels": out_l,
        "valid": out_v & in_range,
    }
