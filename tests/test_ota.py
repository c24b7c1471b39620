"""OTA assigner tests: fixed-shape masked implementation vs a direct numpy
transcription of the reference algorithm (ota_srfdet.py:105-327)."""
import jax
import numpy as np
import jax.numpy as jnp
import pytest

from srfdet3d_tpu.assign import OTAConfig, ota_assign
from srfdet3d_tpu.geometry.boxes import normalize_bbox, denormalize_bbox, \
    boxes3d_to_corners3d
from srfdet3d_tpu.geometry.iou import iou_3d
from srfdet3d_tpu.ops.focal_loss import focal_loss_cost

CFG = OTAConfig(pc_range=(-10.0, -10.0, -5.0, 10.0, 10.0, 3.0))


def _numpy_reference_assign(cost, ious, num_gt, head_idx, cfg):
    """Direct numpy port of dynamic_k_matching (ota_srfdet.py:252-327),
    with the stale-mask bug fixed (mask recomputed inside the loop)."""
    cost = cost.copy()
    n_p = cost.shape[0]
    matching = np.zeros_like(cost)
    k_top = min(cfg.candidate_topk, n_p)
    topk_ious = -np.sort(-ious, axis=0)[:k_top]
    dynamic_ks = topk_ious.sum(0) - 0.5 * (cfg.num_heads - head_idx)
    dynamic_ks = np.maximum(dynamic_ks.astype(np.int32), 1)
    for g in range(num_gt):
        pos = np.argsort(cost[:, g])[:dynamic_ks[g]]
        matching[pos, g] = 1.0

    def dedup(m, c):
        conflicted = m.sum(1) > 1
        if conflicted.sum() > 0:
            argmin = np.argmin(c[conflicted], axis=1)
            m[conflicted] = 0.0
            m[conflicted, argmin] = 1.0
        return m

    matching = dedup(matching, cost)
    it = 0
    while (matching[:, :num_gt].sum(0) == 0).any() and it < num_gt:
        matched_q = matching.sum(1) > 0
        cost[matched_q] += 1e5
        for g in np.nonzero(matching[:, :num_gt].sum(0) == 0)[0]:
            matching[np.argmin(cost[:, g]), g] = 1.0
        matching = dedup(matching, cost)
        it += 1
    matched = matching.sum(1) > 0
    out = np.where(matched, matching.argmax(1), -1)
    return out.astype(np.int32)


def _costs(pred_boxes, pred_logits, gt_boxes, gt_labels, num_gt, cfg):
    """Cost matrix exactly as ota_assign builds it (for the numpy oracle)."""
    corners = np.asarray(boxes3d_to_corners3d(
        jnp.asarray(gt_boxes[:, :7]), bottom_center=False, log_size=True))
    mn, mx = corners.min(1), corners.max(1)
    ctr = pred_boxes[:, :3]
    in_box = ((ctr[:, None] > mn[None]) & (ctr[:, None] < mx[None])).all(-1)
    lo = gt_boxes[:, :3] - cfg.center_radius * gt_boxes[:, 3:6]
    hi = gt_boxes[:, :3] + cfg.center_radius * gt_boxes[:, 3:6]
    in_ctr = ((ctr[:, None] > lo[None]) & (ctr[:, None] < hi[None])).all(-1)
    gm = np.arange(gt_boxes.shape[0]) < num_gt
    in_box &= gm[None]
    in_ctr &= gm[None]
    valid = in_box.any(1) | in_ctr.any(1)
    in_both = in_box & in_ctr

    cls_cost = np.asarray(focal_loss_cost(
        jnp.asarray(pred_logits), jnp.asarray(gt_labels),
        alpha=cfg.cls_alpha, gamma=cfg.cls_gamma, eps=cfg.cls_eps,
        weight=cfg.cls_weight))
    gt_norm = np.asarray(normalize_bbox(jnp.asarray(gt_boxes[:, :7])))
    reg = cfg.reg_weight * np.abs(
        pred_boxes[:, None, :8] - gt_norm[None]).sum(-1)
    pred_raw = np.array(denormalize_bbox(jnp.asarray(pred_boxes)))
    pred_raw[:, 2] += 0.5 * pred_raw[:, 5]     # reference z-slot quirk
    gt_shift = gt_boxes[:, :7].copy()
    gt_shift[:, 2] += 0.5 * gt_shift[:, 5]
    ious = np.asarray(iou_3d(jnp.asarray(pred_raw[:, :7]),
                             jnp.asarray(gt_shift)))
    ious = np.where(gm[None], ious, 0.0)
    cost = cls_cost + reg - cfg.iou_weight * ious + 100.0 * (~in_both)
    cost = cost + 1e4 * (~valid)[:, None]
    cost = np.where(gm[None], cost, 1e8)
    return cost, ious


def _random_case(rng, n_p=64, g_cap=12, num_gt=None):
    num_gt = num_gt if num_gt is not None else rng.integers(1, g_cap + 1)
    pred = np.zeros((n_p, 10), np.float32)
    pred[:, 0:2] = rng.uniform(-9, 9, (n_p, 2))
    pred[:, 2] = rng.uniform(-3, 1, n_p)
    pred[:, 3:6] = np.log(rng.uniform(0.5, 3.0, (n_p, 3)))
    yaw = rng.uniform(-np.pi, np.pi, n_p)
    pred[:, 6], pred[:, 7] = np.sin(yaw), np.cos(yaw)
    logits = rng.normal(-2, 1, (n_p, 4)).astype(np.float32)
    gt = np.zeros((g_cap, 9), np.float32)
    gt[:, 0:2] = rng.uniform(-8, 8, (g_cap, 2))
    gt[:, 2] = rng.uniform(-2, 0, g_cap)
    gt[:, 3:6] = rng.uniform(0.5, 3.0, (g_cap, 3))
    gt[:, 6] = rng.uniform(-np.pi, np.pi, g_cap)
    labels = rng.integers(0, 4, g_cap).astype(np.int32)
    mask = np.arange(g_cap) < num_gt
    return pred, logits, gt, labels, mask, num_gt


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
@pytest.mark.parametrize("head_idx", [1, 3, 6])
def test_ota_matches_reference_algorithm(seed, head_idx):
    rng = np.random.default_rng(seed)
    pred, logits, gt, labels, mask, num_gt = _random_case(rng)
    got = np.asarray(ota_assign(
        jnp.asarray(pred), jnp.asarray(logits), jnp.asarray(gt),
        jnp.asarray(labels), jnp.asarray(mask), head_idx, CFG))
    cost, ious = _costs(pred, logits, gt, labels, num_gt, CFG)
    want = _numpy_reference_assign(cost, ious, num_gt, head_idx, CFG)
    np.testing.assert_array_equal(got, want)
    # every valid gt matched at least once; each pred at most one gt
    for g in range(num_gt):
        assert (got == g).sum() >= 1
    assert not (got >= num_gt).any()


def test_ota_empty_gt():
    rng = np.random.default_rng(7)
    pred, logits, gt, labels, mask, _ = _random_case(rng, num_gt=1)
    mask[:] = False
    got = np.asarray(ota_assign(
        jnp.asarray(pred), jnp.asarray(logits), jnp.asarray(gt),
        jnp.asarray(labels), jnp.asarray(mask), 6, CFG))
    assert (got == -1).all()


@pytest.mark.slow
def test_layer_vmapped_assignment_matches_sequential():
    """srfdet_losses assigns all layers under one vmap (the guarantee
    while_loop shares iterations across lanes); must equal per-layer
    sequential ota_assign_batch calls bit-for-bit, including the
    traced-float head_idx."""
    from srfdet3d_tpu.assign.ota import ota_assign_batch

    rng = np.random.default_rng(11)
    L, B = 4, 2
    preds, logitss = [], []
    for _ in range(L * B):
        p, lo, _, _, _, _ = _random_case(rng)
        preds.append(p)
        logitss.append(lo)
    pred = jnp.asarray(np.stack(preds).reshape(L, B, *preds[0].shape))
    logits = jnp.asarray(np.stack(logitss).reshape(L, B, *logitss[0].shape))
    _, _, gt0, labels0, mask0, _ = _random_case(rng)
    gt = jnp.asarray(np.stack([gt0] * B))
    labels = jnp.asarray(np.stack([labels0] * B))
    mask = jnp.asarray(np.stack([mask0] * B))

    head_idxs = [1, 2, 3, 6]
    seq = [np.asarray(ota_assign_batch(pred[i], logits[i], gt, labels,
                                       mask, head_idxs[i], CFG))
           for i in range(L)]
    vm = np.asarray(jax.vmap(
        lambda pb, pl_, hi: ota_assign_batch(pb, pl_, gt, labels, mask,
                                             hi, CFG)
    )(pred, logits, jnp.asarray(head_idxs, jnp.float32)))
    np.testing.assert_array_equal(vm, np.stack(seq))
