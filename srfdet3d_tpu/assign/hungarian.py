"""Hungarian (one-to-one) assignment — secondary assigner.

The reference's HungarianAssignerSRFDet (hungarian_assigner_srfdet.py:15-127)
computes cost = FocalLossCost + BBox3DL1Cost and solves it with scipy
`linear_sum_assignment` **on the host CPU** (109-118) — an explicit
device->host boundary in the reference too.  None of the 11 shipped configs
use it (OTA is the default everywhere), so we keep the same host-side solve
via `jax.pure_callback` with static result shapes, padded with -1.

A fully on-device LAP solver is a possible later optimization; it is not on
any shipped config's hot path.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..geometry.boxes import normalize_bbox
from ..ops.focal_loss import focal_loss_cost


def _lsa_host(cost: np.ndarray, n_valid: np.ndarray) -> np.ndarray:
    """Host callback: solve LAP on the first n_valid columns.

    Returns (n_p,) int32: matched gt index per pred, -1 if unmatched.
    """
    from scipy.optimize import linear_sum_assignment

    n_p, g = cost.shape
    out = np.full((n_p,), -1, np.int32)
    nv = int(n_valid)
    if nv > 0:
        rows, cols = linear_sum_assignment(np.asarray(cost[:, :nv]))
        out[rows] = cols.astype(np.int32)
    return out


def auction_assign(cost: jnp.ndarray, gt_mask: jnp.ndarray,
                   eps: float = 1e-3,
                   max_rounds: int = 5000) -> jnp.ndarray:
    """Jittable one-to-one assignment via the auction algorithm (Bertsekas)
    — an on-device alternative to the scipy callback.

    cost (n_p, G) fp32; gt_mask (G,) validity.  Returns matched gt per pred
    (n_p,), -1 unmatched.  Total cost is within G*eps of the Hungarian
    optimum (verified vs scipy in tests).  Jacobi bidding: all unassigned
    GTs bid each round; convergence is bounded by cost_span/eps rounds —
    which can exceed `max_rounds` on near-tied costs, so a greedy
    completion pass after the loop guarantees every valid GT an owner
    (possibly non-eps-optimal on budget exhaustion, never silently
    unassigned — the scipy path always assigns every valid GT too).
    """
    n_p, g = cost.shape
    benefit = -cost.astype(jnp.float32).T            # (G, n_p) maximize
    big_neg = -1e9
    benefit = jnp.where(gt_mask[:, None], benefit, big_neg)
    # top_k(_, 2) needs >= 2 columns; a padded big_neg pred column keeps
    # the n_p == 1 case working (never wins a bid)
    benefit2 = benefit if n_p >= 2 else jnp.pad(
        benefit, ((0, 0), (0, 2 - n_p)), constant_values=big_neg)

    def cond(s):
        _, owner_, it = s
        assigned = jnp.zeros((g,), bool).at[
            jnp.maximum(owner_, 0)].max(owner_ >= 0, mode="drop")
        return jnp.any(gt_mask & ~assigned) & (it < max_rounds)

    def body(s):
        prices_, owner_, it = s
        assigned = jnp.zeros((g,), bool).at[
            jnp.maximum(owner_, 0)].max(owner_ >= 0, mode="drop")
        bidder = gt_mask & ~assigned                 # (G,)
        values = benefit2 - jnp.pad(
            prices_, (0, benefit2.shape[1] - n_p))[None, :]
        top2, idx2 = jax.lax.top_k(values, 2)
        best_pred = idx2[:, 0]
        bid = prices_[best_pred] + (top2[:, 0] - top2[:, 1]) + eps
        bid = jnp.where(bidder, bid, big_neg)
        # per-pred max bid wins; ties resolved to the lowest gt id
        best_bid = jnp.full((n_p,), big_neg).at[best_pred].max(
            bid, mode="drop")
        wins = bidder & (bid >= best_bid[best_pred] - 1e-12)
        winner = jnp.full((n_p,), g, jnp.int32).at[
            jnp.where(wins, best_pred, n_p)].min(
            jnp.arange(g, dtype=jnp.int32), mode="drop")
        new_owner = jnp.where(winner < g, winner, owner_)
        new_prices = jnp.where(winner < g,
                               jnp.maximum(prices_, best_bid), prices_)
        return new_prices, new_owner, it + 1

    _, owner, _ = jax.lax.while_loop(
        cond, body, (jnp.zeros((n_p,), jnp.float32),
                     jnp.full((n_p,), -1, jnp.int32), jnp.int32(0)))

    # greedy completion: any valid GT still unassigned (max_rounds hit)
    # takes its best-benefit FREE pred, in GT-index order
    def complete(gi, owner_):
        assigned = jnp.zeros((g,), bool).at[
            jnp.maximum(owner_, 0)].max(owner_ >= 0, mode="drop")
        free = owner_ < 0
        vals = jnp.where(free, benefit[gi], big_neg)
        p = jnp.argmax(vals)
        take = gt_mask[gi] & ~assigned[gi] & free[p]
        return jnp.where(take, owner_.at[p].set(gi), owner_)

    return jax.lax.fori_loop(0, g, complete, owner)


def matching_cost(pred_boxes: jnp.ndarray,
                  pred_logits: jnp.ndarray,
                  gt_boxes: jnp.ndarray,
                  gt_labels: jnp.ndarray,
                  cls_weight: float = 2.0,
                  reg_weight: float = 0.25) -> jnp.ndarray:
    """FocalLossCost + BBox3DL1Cost (reference
    hungarian_assigner_srfdet.py:85-105): (n_p, G)."""
    pred_boxes = jax.lax.stop_gradient(pred_boxes.astype(jnp.float32))
    pred_logits = jax.lax.stop_gradient(pred_logits.astype(jnp.float32))
    cls_cost = focal_loss_cost(pred_logits, gt_labels, weight=cls_weight,
                               eps=1e-12)
    gt_norm = normalize_bbox(gt_boxes[:, :7])
    reg_cost = reg_weight * jnp.sum(
        jnp.abs(pred_boxes[:, None, :8] - gt_norm[None]), axis=-1)
    return cls_cost + reg_cost


def hungarian_assign(pred_boxes: jnp.ndarray,
                     pred_logits: jnp.ndarray,
                     gt_boxes: jnp.ndarray,
                     gt_labels: jnp.ndarray,
                     gt_mask: jnp.ndarray,
                     cls_weight: float = 2.0,
                     reg_weight: float = 0.25,
                     on_device: bool = False) -> jnp.ndarray:
    """One sample. Valid GTs must be packed first (standard padding layout)
    for the scipy path; the on-device auction handles any layout.

    pred_boxes (n_p, >=8) normalized code, gt_boxes (G, 7|9) raw ->
    matched_gt (n_p,) int32, -1 = unmatched.
    """
    cost = matching_cost(pred_boxes, pred_logits, gt_boxes, gt_labels,
                         cls_weight, reg_weight)
    if on_device:
        return auction_assign(cost, gt_mask)
    n_valid = jnp.sum(gt_mask.astype(jnp.int32))
    result_shape = jax.ShapeDtypeStruct((pred_boxes.shape[0],), jnp.int32)
    return jax.pure_callback(_lsa_host, result_shape, cost, n_valid,
                             vmap_method="sequential")
