"""Set-prediction losses for the SRFDet head (OTA + Hungarian paths).

Mirrors reference srfdet_head.py loss_ota (:1041), loss_classification
(:1098), loss_boxes (:1145), loss_hung/loss_single (:760/:823), with padded
GTs replacing python list-of-variable-length handling.

Cross-replica normalization: the reference divides the per-device loss sum by
`reduce_mean(count)` and lets DDP average gradients, which nets out to
global_sum / global_count.  Under GSPMD data parallelism all reductions here
are already global, so plain `jnp.sum` reproduces that exactly
(sync_cls_avg_factor=True semantics, cfg srfdet_voxel_nusc_L.py:152).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from ..assign.ota import OTAConfig, ota_assign_batch
from ..assign.hungarian import hungarian_assign
from ..geometry.boxes import normalize_bbox
from ..ops.focal_loss import sigmoid_focal_loss
from ..parallel.mesh import psum_if_sync


@dataclasses.dataclass(frozen=True)
class LossConfig:
    """cfg loss_cls / loss_bbox (srfdet_voxel_nusc_L.py:153-162)."""
    cls_weight: float = 2.0
    cls_alpha: float = 0.25
    cls_gamma: float = 2.0
    bbox_weight: float = 0.25
    code_weights: Tuple[float, ...] = (
        1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 0.2, 0.2)
    num_classes: int = 10
    assigner: str = "ota"


def _layer_losses(pred_logits: jnp.ndarray,
                  pred_boxes: jnp.ndarray,
                  matched_gt: jnp.ndarray,
                  gt_boxes: jnp.ndarray,
                  gt_labels: jnp.ndarray,
                  cfg: LossConfig) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """One decoder layer. matched_gt (B, n_p) int32, -1 = unmatched.

    pred_boxes: (B, n_p, code), ABSOLUTE centers (normalize_bbox passes
    centers through untouched, so these compare directly against
    normalize_bbox(gt)).
    """
    b, n_p, _ = pred_logits.shape
    code = len(cfg.code_weights)
    matched = matched_gt >= 0
    safe_idx = jnp.maximum(matched_gt, 0)

    tgt_labels = jnp.take_along_axis(gt_labels, safe_idx, axis=1)
    tgt_labels = jnp.where(matched, tgt_labels, cfg.num_classes)   # (B, n_p)

    # global positives count + global loss sums: under plain jit the batch
    # reductions already span the data mesh (sync_cls_avg_factor
    # semantics); on the shard_map train path the psums make normalizer
    # AND numerator global explicitly (reference reduce_mean,
    # srfdet_head.py:873-884)
    num_inst = jnp.maximum(
        psum_if_sync(jnp.sum(matched.astype(jnp.float32))), 1.0)
    cls = sigmoid_focal_loss(pred_logits.astype(jnp.float32), tgt_labels,
                             alpha=cfg.cls_alpha, gamma=cfg.cls_gamma)
    loss_cls = cfg.cls_weight * psum_if_sync(jnp.sum(cls)) / num_inst

    tgt_boxes = jnp.take_along_axis(
        gt_boxes, safe_idx[..., None], axis=1)            # (B, n_p, 7|9)
    tgt_norm = normalize_bbox(tgt_boxes.astype(jnp.float32))   # (B, n_p, 8|10)
    cw = jnp.asarray(cfg.code_weights, jnp.float32)
    l1 = jnp.abs(pred_boxes[..., :code].astype(jnp.float32) -
                 tgt_norm[..., :code]) * cw
    # reference drops WHOLE rows whose normalized target has any
    # non-finite element (isnotnan, srfdet_head.py:1190), e.g. log(0)
    # sizes from degenerate GTs; keep the elementwise guard for preds
    row_ok = jnp.all(jnp.isfinite(tgt_norm[..., :code]), axis=-1,
                     keepdims=True)
    l1 = jnp.where(jnp.isfinite(l1) & row_ok, l1, 0.0)
    l1 = jnp.where(matched[..., None], l1, 0.0)
    loss_bbox = cfg.bbox_weight * psum_if_sync(jnp.sum(l1)) / num_inst

    return jnp.nan_to_num(loss_cls), jnp.nan_to_num(loss_bbox)


def srfdet_losses(pred_logits: jnp.ndarray,
                  pred_boxes: jnp.ndarray,
                  gt_boxes: jnp.ndarray,
                  gt_labels: jnp.ndarray,
                  gt_mask: jnp.ndarray,
                  loss_cfg: LossConfig,
                  ota_cfg: OTAConfig,
                  decoder_num_heads: int = 0) -> Dict[str, jnp.ndarray]:
    """All-layer losses (reference loss_ota, srfdet_head.py:1041-1097).

    Args:
      pred_logits: (L, B, n_p, #cls).
      pred_boxes: (L, B, n_p, code) ABSOLUTE centers, log sizes.
      gt_boxes: (B, G, 7|9) raw sizes, gravity-center z.
      gt_labels: (B, G) int32.
      gt_mask: (B, G) bool.

    Returns dict: loss_cls / loss_bbox for the last layer, s.{i}.loss_* for
    aux layers (reference key naming, srfdet_head.py:1092).
    """
    num_layers = pred_logits.shape[0]
    losses: Dict[str, jnp.ndarray] = {}
    # unit-increasing k: aux layer i uses head_idx i+1; the last layer
    # uses the HEAD's layer count (reference srfdet_head.py:1067 passes
    # self.num_heads — the DECODER's 5, not the assigner's own
    # num_heads=6, so the top layer keeps a -0.5 offset).  Callers
    # pass decoder_num_heads so deep_supervision=False (a single
    # output layer) keeps the FINAL layer's k/radius schedule instead
    # of the first iteration's (num_layers would be 1 there).
    top_idx = decoder_num_heads or num_layers
    head_idxs = [top_idx if layer == num_layers - 1 else layer + 1
                 for layer in range(num_layers)]
    if loss_cfg.assigner == "ota":
        # ALL layers' assignments under one vmap: the guarantee
        # while_loop's trip count is data-dependent (~1 iteration per GT
        # when proposals cluster, e.g. at init), and vmapped lanes share
        # iterations — six sequential loops cost the SUM of their trip
        # counts, one batched loop costs the MAX (measured 121.6 -> ~25 ms
        # at flagship scale on adversarial inputs, bench_loss_parts.py).
        matched_all = jax.vmap(
            lambda pb, pl_, hi: ota_assign_batch(
                pb, pl_, gt_boxes, gt_labels, gt_mask, hi, ota_cfg)
        )(pred_boxes, pred_logits,
          jnp.asarray(head_idxs, jnp.float32))
    for layer in range(num_layers):
        head_idx = head_idxs[layer]
        if loss_cfg.assigner == "ota":
            matched = matched_all[layer]
        else:
            # 'hungarian' = exact scipy host callback (like the reference);
            # 'auction' = fully on-device Bertsekas auction
            on_device = loss_cfg.assigner == "auction"
            matched = jax.vmap(
                lambda pb, pl_, gb, gl, gm: hungarian_assign(
                    pb, pl_, gb, gl, gm,
                    cls_weight=loss_cfg.cls_weight,
                    reg_weight=loss_cfg.bbox_weight,
                    on_device=on_device))(
                pred_boxes[layer], pred_logits[layer], gt_boxes, gt_labels,
                gt_mask)
        loss_cls, loss_bbox = _layer_losses(
            pred_logits[layer], pred_boxes[layer], matched, gt_boxes,
            gt_labels, loss_cfg)
        if layer == num_layers - 1:
            losses["loss_cls"] = loss_cls
            losses["loss_bbox"] = loss_bbox
        else:
            losses[f"s.{layer}.loss_cls"] = loss_cls
            losses[f"s.{layer}.loss_bbox"] = loss_bbox
    return losses
