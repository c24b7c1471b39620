"""Rotated BEV IoU, 3D IoU, and rotated NMS — static shapes, pure XLA.

TPU-native replacements for the CUDA kernels the reference consumes:
  - mmdet3d `BboxOverlaps3D(coordinate='lidar')` (used by the OTA assigner,
    ota_srfdet.py:40-41,148-150)  -> :func:`iou_3d`
  - mmcv rotated-NMS inside `box3d_multiclass_nms` (srfdet_head.py:1288-1293)
    -> :func:`multiclass_nms_3d`

Intersection of two rotated rectangles is computed with the classic
"candidate points -> angular sort -> shoelace" construction: the vertices of
the (convex) intersection polygon are exactly (a) the pairwise edge
intersections and (b) the corners of each box contained in the other.  All 24
candidates are kept in a fixed-size masked buffer so the whole thing is a
single fused elementwise/sort program over the (N, M) pair grid — no
data-dependent shapes, no host sync.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .boxes import bev_corners

_EPS = 1e-8


def _point_in_rect(points: jnp.ndarray, boxes_bev: jnp.ndarray) -> jnp.ndarray:
    """points (..., 2), boxes_bev (..., 5) -> bool (...)."""
    d = points - boxes_bev[..., 0:2]
    yaw = boxes_bev[..., 4]
    cos_r, sin_r = jnp.cos(yaw), jnp.sin(yaw)
    # project into box frame (axes of bev_corners' rotation)
    u = d[..., 0] * cos_r + d[..., 1] * sin_r
    v = -d[..., 0] * sin_r + d[..., 1] * cos_r
    return (jnp.abs(u) <= boxes_bev[..., 2] / 2.0 + 1e-6) & (
        jnp.abs(v) <= boxes_bev[..., 3] / 2.0 + 1e-6)


def _segment_intersections(ca: jnp.ndarray, cb: jnp.ndarray):
    """All 16 edge-pair intersection candidates between two quads.

    ca, cb: (..., 4, 2) corners. Returns points (..., 16, 2), valid (..., 16).
    """
    pa = ca                                     # (..., 4, 2) edge starts A
    ra = jnp.roll(ca, -1, axis=-2) - ca         # edge vectors A
    pb = cb
    rb = jnp.roll(cb, -1, axis=-2) - cb

    p = pa[..., :, None, :]                     # (..., 4, 1, 2)
    r = ra[..., :, None, :]
    q = pb[..., None, :, :]                     # (..., 1, 4, 2)
    s = rb[..., None, :, :]

    def cross(u, v):
        return u[..., 0] * v[..., 1] - u[..., 1] * v[..., 0]

    denom = cross(r, s)                          # (..., 4, 4)
    qp = q - p
    t = cross(qp, s) / jnp.where(jnp.abs(denom) < _EPS, 1.0, denom)
    u = cross(qp, r) / jnp.where(jnp.abs(denom) < _EPS, 1.0, denom)
    valid = (jnp.abs(denom) >= _EPS) & (t >= 0.0) & (t <= 1.0) & \
        (u >= 0.0) & (u <= 1.0)
    pts = p + t[..., None] * r                   # (..., 4, 4, 2)
    flat = pts.reshape(pts.shape[:-3] + (16, 2))
    return flat, valid.reshape(valid.shape[:-2] + (16,))


def _convex_area_from_candidates(pts: jnp.ndarray, valid: jnp.ndarray):
    """Area of convex hull of masked candidate points (known convex set).

    pts (..., K, 2), valid (..., K) -> area (...).
    """
    nvalid = jnp.sum(valid, axis=-1)
    center = jnp.sum(jnp.where(valid[..., None], pts, 0.0), axis=-2) / \
        jnp.maximum(nvalid, 1)[..., None]
    d = pts - center[..., None, :]
    ang = jnp.arctan2(d[..., 1], d[..., 0])
    ang = jnp.where(valid, ang, jnp.inf)        # invalid sorted last
    order = jnp.argsort(ang, axis=-1)
    pts_sorted = jnp.take_along_axis(pts, order[..., None], axis=-2)
    valid_sorted = jnp.take_along_axis(valid, order, axis=-1)
    # replace invalid slots with the first (valid) point so the polygon
    # v1..vk, v1, v1, ... has zero extra shoelace contribution
    first = pts_sorted[..., 0:1, :]
    poly = jnp.where(valid_sorted[..., None], pts_sorted, first)
    nxt = jnp.roll(poly, -1, axis=-2)
    cross = poly[..., 0] * nxt[..., 1] - nxt[..., 0] * poly[..., 1]
    area = 0.5 * jnp.abs(jnp.sum(cross, axis=-1))
    return jnp.where(nvalid >= 3, area, 0.0)


def _clipped_edge_circulation(hw_a, hl_a, hw_b, hl_b, tx, ty, cos_t, sin_t,
                              gx, gy, cos_a, sin_a, shrink):
    """Green's-theorem circulation of box A's edges clipped to box B.

    All args are broadcast elementwise arrays.  Clipping runs in B's frame:
    (tx, ty) is A's center and (cos_t, sin_t) A's relative yaw there.  The
    line integral ∮(x dy - y dx) is evaluated in a COMMON frame shared by
    both passes — (gx, gy) is A's center and (cos_a, sin_a) A's yaw in that
    frame — because open arcs are only translation-invariant as a closed
    sum.  Returns the sum over A's 4 edges of cross(p(t0), p(t1)) with
    [t0, t1] the Liang-Barsky clip of the edge to |u| <= hw_b - shrink,
    |v| <= hl_b - shrink; `shrink` breaks the tie when boundaries coincide
    (each shared boundary segment must be counted exactly once).
    """
    # A's CCW corners, in B's frame (clip) and in the common frame (area)
    lx = (hw_a, -hw_a, -hw_a, hw_a)
    ly = (hl_a, hl_a, -hl_a, -hl_a)
    px = [tx + lx[i] * cos_t - ly[i] * sin_t for i in range(4)]
    py = [ty + lx[i] * sin_t + ly[i] * cos_t for i in range(4)]
    wx = [gx + lx[i] * cos_a - ly[i] * sin_a for i in range(4)]
    wy = [gy + lx[i] * sin_a + ly[i] * cos_a for i in range(4)]
    bu = hw_b - shrink
    bv = hl_b - shrink

    total = 0.0
    for i in range(4):
        x0, y0 = px[i], py[i]
        dx, dy = px[(i + 1) % 4] - x0, py[(i + 1) % 4] - y0
        # Liang-Barsky: constraints n.p <= h as (den, num) pairs with
        # p(t) feasible iff den * t <= num
        t_lo = jnp.zeros_like(x0)
        t_hi = jnp.ones_like(x0)
        feasible = jnp.ones_like(x0, dtype=bool)
        for den, num in ((dx, bu - x0), (-dx, bu + x0),
                         (dy, bv - y0), (-dy, bv + y0)):
            par = jnp.abs(den) < _EPS
            r = num / jnp.where(par, 1.0, den)
            t_lo = jnp.where(~par & (den < 0), jnp.maximum(t_lo, r), t_lo)
            t_hi = jnp.where(~par & (den > 0), jnp.minimum(t_hi, r), t_hi)
            feasible &= (par & (num >= 0)) | ~par
        valid = feasible & (t_hi > t_lo)
        cx0, cy0 = wx[i], wy[i]
        cdx = wx[(i + 1) % 4] - cx0
        cdy = wy[(i + 1) % 4] - cy0
        ax0 = cx0 + t_lo * cdx
        ay0 = cy0 + t_lo * cdy
        ax1 = cx0 + t_hi * cdx
        ay1 = cy0 + t_hi * cdy
        total = total + jnp.where(valid, ax0 * ay1 - ax1 * ay0, 0.0)
    return total


def rotated_intersection_pairs(b1: jnp.ndarray,
                               b2: jnp.ndarray,
                               shrink: float = 1e-4) -> jnp.ndarray:
    """Elementwise intersection area of rotated BEV rects.

    b1, b2: broadcast-compatible (..., 5) [cx, cy, w, l, yaw].
    Green's theorem over the boundary of the intersection: the boundary is
    (A's edges inside B) + (B's edges inside A); each edge segment is
    clipped in closed form (Liang-Barsky), so there is no candidate-vertex
    buffer, no angular sort, and no gather — a fully fused elementwise
    program.  Shared-boundary segments are assigned to exactly one box by
    shrinking B for A's pass and growing A for B's pass by `shrink`.
    Matches the CUDA polygon-clipping kernel the reference consumes
    (mmcv rotated NMS / BboxOverlaps3D) to within `shrink`-scale error —
    amplified by 1/sin(angle) where two edges cross near-parallel (the
    clipped endpoints slide along the shallow edge).  Measured worst case
    on random heavily-overlapping pairs: ~50x shrink = 5e-3 absolute area
    (tests_tpu/test_device_parity.py), i.e. IoU error ~1e-4 — far below
    NMS-threshold / OTA-cost sensitivity.  Degenerate (non-positive size)
    boxes clip to an empty region and return 0.
    """
    cx1, cy1 = b1[..., 0], b1[..., 1]
    hw1, hl1 = b1[..., 2] * 0.5, b1[..., 3] * 0.5
    yaw1 = b1[..., 4]
    cx2, cy2 = b2[..., 0], b2[..., 1]
    hw2, hl2 = b2[..., 2] * 0.5, b2[..., 3] * 0.5
    yaw2 = b2[..., 4]

    c1, s1 = jnp.cos(yaw1), jnp.sin(yaw1)
    c2, s2 = jnp.cos(yaw2), jnp.sin(yaw2)
    dxw, dyw = cx1 - cx2, cy1 - cy2
    # A in B's frame
    tx_ab = dxw * c2 + dyw * s2
    ty_ab = -dxw * s2 + dyw * c2
    cos_ab = c1 * c2 + s1 * s2          # cos(yaw1 - yaw2)
    sin_ab = s1 * c2 - c1 * s2          # sin(yaw1 - yaw2)
    # B in A's frame
    tx_ba = -(dxw * c1 + dyw * s1)
    ty_ba = dxw * s1 - dyw * c1
    # common frame for the line integral: world orientation, origin at the
    # centers' midpoint (keeps f32 magnitudes small)
    gx1, gy1 = 0.5 * dxw, 0.5 * dyw
    gx2, gy2 = -gx1, -gy1

    circ = _clipped_edge_circulation(
        hw1, hl1, hw2, hl2, tx_ab, ty_ab, cos_ab, sin_ab,
        gx1, gy1, c1, s1, shrink)
    circ = circ + _clipped_edge_circulation(
        hw2, hl2, hw1, hl1, tx_ba, ty_ba, cos_ab, -sin_ab,
        gx2, gy2, c2, s2, -shrink)
    inter = jnp.maximum(0.5 * circ, 0.0)
    # SAT gate (ADVICE r1): when two boxes are within ~shrink of merely
    # touching, the A-pass drops the shared-boundary edge while the B-pass
    # keeps it, leaving an open arc whose circulation is a spurious
    # min-box-scale area.  Rectangles admit an exact 4-axis separating-
    # axis test; zero the result when the minimum penetration depth is
    # <= shrink (true intersection there is O(shrink), the documented
    # error scale).
    abs_c, abs_s = jnp.abs(cos_ab), jnp.abs(sin_ab)
    pen_bx = hw2 + hw1 * abs_c + hl1 * abs_s - jnp.abs(tx_ab)
    pen_by = hl2 + hw1 * abs_s + hl1 * abs_c - jnp.abs(ty_ab)
    pen_ax = hw1 + hw2 * abs_c + hl2 * abs_s - jnp.abs(tx_ba)
    pen_ay = hl1 + hw2 * abs_s + hl2 * abs_c - jnp.abs(ty_ba)
    min_pen = jnp.minimum(jnp.minimum(pen_bx, pen_by),
                          jnp.minimum(pen_ax, pen_ay))
    return jnp.where(min_pen > shrink, inter, 0.0)


def rotated_intersection_bev(boxes1: jnp.ndarray,
                             boxes2: jnp.ndarray) -> jnp.ndarray:
    """Pairwise intersection area of rotated BEV rects.

    boxes1 (N, 5), boxes2 (M, 5) [cx, cy, w, l, yaw] -> (N, M).
    """
    return rotated_intersection_pairs(boxes1[:, None, :],
                                      boxes2[None, :, :])


def _rotated_intersection_bev_sort(boxes1: jnp.ndarray,
                                   boxes2: jnp.ndarray) -> jnp.ndarray:
    """Candidate-vertex reference implementation (kept for tests).

    boxes1 (N, 5), boxes2 (M, 5) -> (N, M).
    """
    n, m = boxes1.shape[0], boxes2.shape[0]
    b1 = jnp.broadcast_to(boxes1[:, None, :], (n, m, 5))
    b2 = jnp.broadcast_to(boxes2[None, :, :], (n, m, 5))
    c1 = bev_corners(b1)                         # (N, M, 4, 2)
    c2 = bev_corners(b2)
    inter_pts, inter_valid = _segment_intersections(c1, c2)
    in2 = _point_in_rect(c1, b2[..., None, :])   # corners of 1 inside 2
    in1 = _point_in_rect(c2, b1[..., None, :])
    pts = jnp.concatenate([inter_pts, c1, c2], axis=-2)   # (N, M, 24, 2)
    valid = jnp.concatenate([inter_valid, in2, in1], axis=-1)
    return _convex_area_from_candidates(pts, valid)


def rotated_iou_bev(boxes1: jnp.ndarray, boxes2: jnp.ndarray) -> jnp.ndarray:
    """Pairwise rotated IoU of BEV rects (N, 5) x (M, 5) -> (N, M)."""
    inter = rotated_intersection_bev(boxes1, boxes2)
    a1 = (boxes1[:, 2] * boxes1[:, 3])[:, None]
    a2 = (boxes2[:, 2] * boxes2[:, 3])[None, :]
    return inter / jnp.maximum(a1 + a2 - inter, _EPS)


def iou_3d(boxes1: jnp.ndarray, boxes2: jnp.ndarray) -> jnp.ndarray:
    """Pairwise 3D IoU for LiDAR boxes with *gravity-center* cz.

    boxes (N, 7+) [cx, cy, cz, w, l, h, yaw, ...] raw sizes -> (N, M).
    Both inputs must use the same z convention (the reference feeds
    gravity-center boxes for both preds and GTs).
    """
    bev1 = jnp.concatenate([boxes1[:, 0:2], boxes1[:, 3:5], boxes1[:, 6:7]], -1)
    bev2 = jnp.concatenate([boxes2[:, 0:2], boxes2[:, 3:5], boxes2[:, 6:7]], -1)
    inter_bev = rotated_intersection_bev(bev1, bev2)
    zmin1, zmax1 = boxes1[:, 2] - boxes1[:, 5] / 2, boxes1[:, 2] + boxes1[:, 5] / 2
    zmin2, zmax2 = boxes2[:, 2] - boxes2[:, 5] / 2, boxes2[:, 2] + boxes2[:, 5] / 2
    overlap_z = jnp.maximum(
        jnp.minimum(zmax1[:, None], zmax2[None, :]) -
        jnp.maximum(zmin1[:, None], zmin2[None, :]), 0.0)
    inter = inter_bev * overlap_z
    vol1 = (boxes1[:, 3] * boxes1[:, 4] * boxes1[:, 5])[:, None]
    vol2 = (boxes2[:, 3] * boxes2[:, 4] * boxes2[:, 5])[None, :]
    return inter / jnp.maximum(vol1 + vol2 - inter, _EPS)


def rotated_nms_bev(boxes_bev: jnp.ndarray,
                    scores: jnp.ndarray,
                    iou_thr: float,
                    valid: jnp.ndarray | None = None) -> jnp.ndarray:
    """Greedy rotated NMS. boxes_bev (N, 5), scores (N,) -> keep mask (N,).

    Scores may carry leading batch/class dims: boxes (..., N, 5),
    scores (..., N); suppression is vectorized over those dims.

    Suppression runs as a fixed-point "self-suppression" iteration
    (keep[i] <- valid[i] & no higher-scored kept j overlaps i) instead of a
    sequential greedy scan: the fixed point is exactly the greedy solution
    (induction over score rank), and is reached in at most the longest
    suppression-chain length — typically a handful of vectorized sweeps vs
    N sequential steps.
    """
    if valid is None:
        valid = scores > -jnp.inf
    order = jnp.argsort(-jnp.where(valid, scores, -jnp.inf), axis=-1)
    sboxes = jnp.take_along_axis(boxes_bev, order[..., None], axis=-2)
    svalid = jnp.take_along_axis(valid, order, axis=-1)

    n = boxes_bev.shape[-2]
    inter = rotated_intersection_pairs(sboxes[..., :, None, :],
                                       sboxes[..., None, :, :])
    area = sboxes[..., 2] * sboxes[..., 3]
    union = area[..., :, None] + area[..., None, :] - inter
    ious = inter / jnp.maximum(union, _EPS)
    row = jax.lax.broadcasted_iota(jnp.int32, ious.shape, ious.ndim - 2)
    col = jax.lax.broadcasted_iota(jnp.int32, ious.shape, ious.ndim - 1)
    # sup[i, j]: kept j would suppress i
    sup_mat = (ious > iou_thr) & (col < row) & svalid[..., None, :]

    def cond(state):
        _, changed, it = state
        return changed & (it < n)

    def body(state):
        keep, _, it = state
        suppressed = jnp.any(sup_mat & keep[..., None, :], axis=-1)
        new_keep = svalid & ~suppressed
        changed = jnp.any(new_keep != keep)
        return new_keep, changed, it + 1

    keep_sorted, _, _ = jax.lax.while_loop(
        cond, body, (svalid, jnp.asarray(True), jnp.zeros((), jnp.int32)))
    # scatter keep mask back to original order
    inv = jnp.argsort(order, axis=-1)
    return jnp.take_along_axis(keep_sorted, inv, axis=-1)


def multiclass_nms_3d(boxes: jnp.ndarray,
                      boxes_bev: jnp.ndarray,
                      scores: jnp.ndarray,
                      score_thr: float,
                      max_num: int,
                      iou_thr: float,
                      pre_nms_k: int | None = None):
    """Static-shape analogue of mmdet3d `box3d_multiclass_nms`.

    Args:
      boxes: (N, D) decoded boxes (bottom-center z), D=7 or 9.
      boxes_bev: (N, 5) [cx, cy, w, l, yaw] for suppression.
      scores: (N, C) per-class sigmoid scores (no background column).
      score_thr / max_num / iou_thr: test_cfg values.
      pre_nms_k: optional per-class top-k before suppression.  None (the
        default, exact parity with the reference: every box above
        score_thr enters NMS) suppresses over all N boxes — the clipped
        IoU + fixed-point suppression make the full (C, N, N) pass ~1 ms
        at flagship scale, so the truncation is only useful for very
        large N.

    Returns: (out_boxes (max_num, D), out_scores (max_num,),
              out_labels (max_num,), out_valid (max_num,))
    """
    n, c = scores.shape
    k = n if pre_nms_k is None else min(pre_nms_k, n)
    cls_scores_full = scores.T                         # (C, N)
    top_s, top_i = jax.lax.top_k(cls_scores_full, k)   # (C, k)
    cls_valid = top_s > score_thr
    bev_sel = boxes_bev[top_i]                         # (C, k, 5)
    keep = rotated_nms_bev(bev_sel, top_s, iou_thr, cls_valid)  # (C, k)

    flat_scores = jnp.where(keep, top_s, -jnp.inf).reshape(-1)  # (C*k,)
    # max_num can exceed C*k on small configs; keep the static (max_num,)
    # output contract by padding the short top-k back out
    k_eff = min(max_num, flat_scores.shape[0])
    top_scores, flat_idx = jax.lax.top_k(flat_scores, k_eff)
    if k_eff < max_num:
        pad = max_num - k_eff
        top_scores = jnp.concatenate(
            [top_scores, jnp.full((pad,), -jnp.inf, top_scores.dtype)])
        flat_idx = jnp.concatenate(
            [flat_idx, jnp.zeros((pad,), flat_idx.dtype)])
    out_labels = flat_idx // k
    box_idx = top_i.reshape(-1)[flat_idx]
    out_boxes = boxes[box_idx]
    out_valid = top_scores > -jnp.inf
    out_scores = jnp.where(out_valid, top_scores, 0.0)
    return out_boxes, out_scores, out_labels, out_valid
