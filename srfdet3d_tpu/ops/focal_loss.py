"""Sigmoid focal loss (pure jnp).

Replaces mmcv's CUDA `sigmoid_focal_loss` consumed via mmdet `FocalLoss`
(cfg srfdet_voxel_nusc_LC.py:181-187).  Semantics follow mmdet: targets are
integer class labels in [0, num_classes]; label == num_classes means
background (all-zero one-hot).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def sigmoid_focal_loss(logits: jnp.ndarray,
                       labels: jnp.ndarray,
                       alpha: float = 0.25,
                       gamma: float = 2.0,
                       weight: jnp.ndarray | None = None) -> jnp.ndarray:
    """Elementwise focal loss summed over classes.

    Args:
      logits: (..., C) raw logits.
      labels: (...,) int labels; C means background.
      weight: optional (...,) per-sample weight.

    Returns: (...,) per-sample loss (sum over classes).
    """
    num_classes = logits.shape[-1]
    targets = jax.nn.one_hot(labels, num_classes, dtype=logits.dtype)
    p = jax.nn.sigmoid(logits)
    ce = -(targets * jax.nn.log_sigmoid(logits) +
           (1 - targets) * jax.nn.log_sigmoid(-logits))
    p_t = p * targets + (1 - p) * (1 - targets)
    alpha_t = alpha * targets + (1 - alpha) * (1 - targets)
    loss = alpha_t * ((1 - p_t) ** gamma) * ce
    loss = jnp.sum(loss, axis=-1)
    if weight is not None:
        loss = loss * weight
    return loss


def focal_loss_cost(logits: jnp.ndarray,
                    gt_labels: jnp.ndarray,
                    alpha: float = 0.25,
                    gamma: float = 2.0,
                    eps: float = 1e-8,
                    weight: float = 1.0) -> jnp.ndarray:
    """mmdet `FocalLossCost` (used by both assigners).

    logits (n_p, C), gt_labels (n_gt,) -> cost (n_p, n_gt).
    """
    p = jax.nn.sigmoid(logits)
    pos_cost = -alpha * ((1 - p) ** gamma) * jnp.log(p + eps)
    neg_cost = -(1 - alpha) * (p ** gamma) * jnp.log(1 - p + eps)
    cost = pos_cost[:, gt_labels] - neg_cost[:, gt_labels]
    return cost * weight
