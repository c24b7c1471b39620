import jax
import jax.numpy as jnp
import numpy as np
import pytest

from srfdet3d_tpu.geometry import (
    normalize_bbox, denormalize_bbox, boxes3d_to_corners3d,
    rotated_iou_bev, iou_3d, rotated_nms_bev, multiclass_nms_3d,
)


def test_normalize_roundtrip():
    rng = np.random.RandomState(0)
    boxes = np.concatenate([
        rng.uniform(-50, 50, (32, 3)),
        rng.uniform(0.5, 8.0, (32, 3)),
        rng.uniform(-np.pi, np.pi, (32, 1)),
        rng.uniform(-3, 3, (32, 2)),
    ], axis=-1).astype(np.float32)
    norm = normalize_bbox(jnp.array(boxes))
    assert norm.shape == (32, 10)
    denorm = denormalize_bbox(norm)
    np.testing.assert_allclose(np.asarray(denorm), boxes, rtol=1e-4, atol=1e-4)


def test_normalize_7d():
    boxes = jnp.array([[1.0, 2.0, 3.0, 2.0, 4.0, 1.5, 0.3]])
    norm = normalize_bbox(boxes)
    assert norm.shape == (1, 8)
    np.testing.assert_allclose(np.asarray(denormalize_bbox(norm)),
                               np.asarray(boxes), rtol=1e-5, atol=1e-6)


def test_corners_axis_aligned():
    # yaw=0, raw sizes (log_size=False), gravity center
    boxes = jnp.array([[[0.0, 0.0, 0.0, 2.0, 4.0, 1.0, 0.0]]])
    c = boxes3d_to_corners3d(boxes, bottom_center=False, yaw_as_sincos=False,
                             log_size=False)
    c = np.asarray(c)[0, 0]
    assert c.shape == (8, 3)
    np.testing.assert_allclose(sorted(np.unique(np.round(c[:, 0], 5))), [-1, 1])
    np.testing.assert_allclose(sorted(np.unique(np.round(c[:, 1], 5))), [-2, 2])
    np.testing.assert_allclose(sorted(np.unique(np.round(c[:, 2], 5))),
                               [-0.5, 0.5])


def test_corners_log_size():
    raw = jnp.array([[[0.0, 0.0, 0.0, 2.0, 4.0, 1.0, 0.5]]])
    logged = raw.at[..., 3:6].set(jnp.log(raw[..., 3:6]))
    c1 = boxes3d_to_corners3d(raw, bottom_center=False, log_size=False)
    c2 = boxes3d_to_corners3d(logged, bottom_center=False, log_size=True)
    np.testing.assert_allclose(np.asarray(c1), np.asarray(c2), atol=1e-5)


def test_corners_bottom_center():
    boxes = jnp.array([[[0.0, 0.0, 10.0, 2.0, 2.0, 3.0, 0.0]]])
    c = boxes3d_to_corners3d(boxes, bottom_center=True, log_size=False)
    z = np.asarray(c)[0, 0, :, 2]
    np.testing.assert_allclose(sorted(np.unique(np.round(z, 5))), [10.0, 13.0])


def _mc_rect_iou(b1, b2, n=400_000, seed=0):
    """Monte-Carlo oracle for rotated rect IoU."""
    rng = np.random.RandomState(seed)
    all_x = []
    for b in (b1, b2):
        cx, cy, w, l, yaw = b
        r = np.hypot(w, l) / 2
        all_x.append([cx - r, cx + r, cy - r, cy + r])
    x0 = min(a[0] for a in all_x); x1 = max(a[1] for a in all_x)
    y0 = min(a[2] for a in all_x); y1 = max(a[3] for a in all_x)
    pts = rng.uniform([x0, y0], [x1, y1], size=(n, 2))

    def inside(b):
        cx, cy, w, l, yaw = b
        d = pts - [cx, cy]
        u = d[:, 0] * np.cos(yaw) + d[:, 1] * np.sin(yaw)
        v = -d[:, 0] * np.sin(yaw) + d[:, 1] * np.cos(yaw)
        return (np.abs(u) <= w / 2) & (np.abs(v) <= l / 2)

    i1, i2 = inside(b1), inside(b2)
    area = (x1 - x0) * (y1 - y0)
    inter = (i1 & i2).mean() * area
    union = (i1 | i2).mean() * area
    return inter / union if union > 0 else 0.0


def test_rotated_iou_axis_aligned():
    b1 = jnp.array([[0.0, 0.0, 2.0, 2.0, 0.0]])
    b2 = jnp.array([[1.0, 0.0, 2.0, 2.0, 0.0]])
    iou = np.asarray(rotated_iou_bev(b1, b2))[0, 0]
    # inter = 1x2 = 2, union = 4+4-2 = 6; atol covers the boundary
    # tie-break `shrink` (geometry/iou.py rotated_intersection_pairs)
    np.testing.assert_allclose(iou, 2.0 / 6.0, atol=1e-4)


def test_rotated_iou_identical():
    b = jnp.array([[3.0, -2.0, 2.5, 5.0, 0.7]])
    iou = np.asarray(rotated_iou_bev(b, b))[0, 0]
    np.testing.assert_allclose(iou, 1.0, atol=1e-4)


def test_rotated_iou_disjoint():
    b1 = jnp.array([[0.0, 0.0, 1.0, 1.0, 0.3]])
    b2 = jnp.array([[10.0, 10.0, 1.0, 1.0, -0.5]])
    assert np.asarray(rotated_iou_bev(b1, b2))[0, 0] == 0.0


def test_rotated_iou_45deg():
    # unit square vs itself rotated 45deg: octagon inter = 2*(sqrt(2)-1)
    b1 = jnp.array([[0.0, 0.0, 1.0, 1.0, 0.0]])
    b2 = jnp.array([[0.0, 0.0, 1.0, 1.0, np.pi / 4]])
    inter_expect = 2 * (np.sqrt(2) - 1)
    iou_expect = inter_expect / (2 - inter_expect)
    iou = np.asarray(rotated_iou_bev(b1, b2))[0, 0]
    np.testing.assert_allclose(iou, iou_expect, atol=1e-4)


def test_rotated_iou_vs_monte_carlo():
    rng = np.random.RandomState(42)
    boxes1 = np.stack([
        rng.uniform(-2, 2, 8), rng.uniform(-2, 2, 8),
        rng.uniform(1, 4, 8), rng.uniform(1, 4, 8),
        rng.uniform(-np.pi, np.pi, 8)], axis=-1).astype(np.float32)
    boxes2 = np.stack([
        rng.uniform(-2, 2, 8), rng.uniform(-2, 2, 8),
        rng.uniform(1, 4, 8), rng.uniform(1, 4, 8),
        rng.uniform(-np.pi, np.pi, 8)], axis=-1).astype(np.float32)
    iou = np.asarray(rotated_iou_bev(jnp.array(boxes1), jnp.array(boxes2)))
    for i in range(8):
        for j in range(0, 8, 3):
            oracle = _mc_rect_iou(boxes1[i], boxes2[j], seed=i * 8 + j)
            assert abs(iou[i, j] - oracle) < 0.02, (i, j, iou[i, j], oracle)


def test_iou3d_identical_and_z():
    b = jnp.array([[0.0, 0.0, 1.0, 2.0, 4.0, 2.0, 0.4]])
    np.testing.assert_allclose(np.asarray(iou_3d(b, b))[0, 0], 1.0, atol=1e-4)
    # same footprint shifted in z by half height -> z overlap 1/2 -> iou 1/3
    b2 = b.at[0, 2].add(1.0)
    np.testing.assert_allclose(np.asarray(iou_3d(b, b2))[0, 0], 1.0 / 3.0,
                               atol=1e-4)


def test_rotated_nms():
    boxes = jnp.array([
        [0.0, 0.0, 2.0, 2.0, 0.0],    # score .9 keep
        [0.1, 0.0, 2.0, 2.0, 0.0],    # overlaps box0 heavily -> suppressed
        [10.0, 0.0, 2.0, 2.0, 0.0],   # far away -> keep
        [10.05, 0.0, 2.0, 2.0, 0.0],  # overlaps box2 -> suppressed
    ])
    scores = jnp.array([0.9, 0.8, 0.7, 0.6])
    keep = np.asarray(rotated_nms_bev(boxes, scores, iou_thr=0.4))
    np.testing.assert_array_equal(keep, [True, False, True, False])


def test_rotated_nms_respects_score_order():
    boxes = jnp.array([
        [0.0, 0.0, 2.0, 2.0, 0.0],
        [0.1, 0.0, 2.0, 2.0, 0.0],
    ])
    scores = jnp.array([0.5, 0.9])  # second box wins
    keep = np.asarray(rotated_nms_bev(boxes, scores, iou_thr=0.4))
    np.testing.assert_array_equal(keep, [False, True])


def test_multiclass_nms_static_shapes():
    n, c, max_num = 16, 3, 8
    rng = np.random.RandomState(1)
    boxes = np.concatenate([
        rng.uniform(-20, 20, (n, 2)), rng.uniform(-2, 0, (n, 1)),
        rng.uniform(1, 3, (n, 3)), rng.uniform(-np.pi, np.pi, (n, 1)),
        rng.uniform(-1, 1, (n, 2))], axis=-1).astype(np.float32)
    bev = np.concatenate([boxes[:, 0:2], boxes[:, 3:5], boxes[:, 6:7]], -1)
    scores = rng.uniform(0, 1, (n, c)).astype(np.float32)
    out_boxes, out_scores, out_labels, out_valid = multiclass_nms_3d(
        jnp.array(boxes), jnp.array(bev), jnp.array(scores),
        score_thr=0.3, max_num=max_num, iou_thr=0.4)
    assert out_boxes.shape == (max_num, 9)
    assert out_scores.shape == (max_num,)
    assert out_labels.shape == (max_num,)
    v = np.asarray(out_valid)
    s = np.asarray(out_scores)
    assert (s[v] > 0.3).all()
    # scores sorted descending among valid
    assert (np.diff(s[v]) <= 1e-6).all()


def test_multiclass_nms_jit():
    n, c = 8, 2
    boxes = jnp.zeros((n, 7))
    bev = jnp.zeros((n, 5))
    scores = jnp.ones((n, c)) * 0.5
    f = jax.jit(lambda b, bv, s: multiclass_nms_3d(b, bv, s, 0.1, 4, 0.4))
    out = f(boxes, bev, scores)
    assert out[0].shape == (4, 7)


def test_green_clipping_matches_candidate_sort():
    """The Liang-Barsky/Green's-theorem intersection must agree with the
    candidate-vertex + angular-sort reference construction."""
    from srfdet3d_tpu.geometry.iou import (
        rotated_intersection_bev, _rotated_intersection_bev_sort)
    rng = np.random.RandomState(7)
    n = 64
    b1 = np.stack([rng.uniform(-30, 30, n), rng.uniform(-30, 30, n),
                   rng.uniform(0.3, 8, n), rng.uniform(0.3, 8, n),
                   rng.uniform(-2 * np.pi, 2 * np.pi, n)], -1)
    b2 = np.stack([rng.uniform(-30, 30, n), rng.uniform(-30, 30, n),
                   rng.uniform(0.3, 8, n), rng.uniform(0.3, 8, n),
                   rng.uniform(-2 * np.pi, 2 * np.pi, n)], -1)
    # heavy-overlap subset (the regime NMS actually exercises)
    b2[:32] = b1[:32] + rng.normal(0, 0.4, (32, 5))
    b1 = b1.astype(np.float32)
    b2 = b2.astype(np.float32)
    new = np.asarray(rotated_intersection_bev(jnp.array(b1), jnp.array(b2)))
    ref = np.asarray(
        _rotated_intersection_bev_sort(jnp.array(b1), jnp.array(b2)))
    np.testing.assert_allclose(new, ref, atol=5e-3)


def _greedy_nms_oracle(ious, scores, valid, thr):
    order = np.argsort(-np.where(valid, scores, -np.inf))
    keep = np.zeros_like(valid)
    for i in order:
        if not valid[i]:
            continue
        ok = True
        for j in np.flatnonzero(keep):
            if scores[j] > scores[i] or (scores[j] == scores[i] and j != i
                                         and np.where(order == j)[0][0] <
                                         np.where(order == i)[0][0]):
                if ious[i, j] > thr:
                    ok = False
                    break
        keep[i] = ok
    return keep


def test_nms_fixed_point_matches_sequential_greedy():
    """The self-suppression fixed point must equal sequential greedy NMS."""
    from srfdet3d_tpu.geometry.iou import rotated_iou_bev
    rng = np.random.RandomState(3)
    n = 80
    boxes = np.stack([rng.uniform(-10, 10, n), rng.uniform(-10, 10, n),
                      rng.uniform(1, 5, n), rng.uniform(1, 5, n),
                      rng.uniform(-np.pi, np.pi, n)], -1).astype(np.float32)
    # clusters of near-duplicates to force long suppression chains
    for c in range(0, 60, 6):
        boxes[c:c + 6] = boxes[c] + rng.normal(0, 0.35,
                                               (6, 5)).astype(np.float32)
    scores = rng.uniform(0, 1, n).astype(np.float32)
    valid = rng.uniform(0, 1, n) > 0.1
    keep = np.asarray(rotated_nms_bev(
        jnp.array(boxes), jnp.array(scores), 0.3, jnp.array(valid)))
    ious = np.asarray(rotated_iou_bev(jnp.array(boxes), jnp.array(boxes)))
    oracle = _greedy_nms_oracle(ious, scores, valid, 0.3)
    np.testing.assert_array_equal(keep, oracle.astype(bool))


def test_touching_boxes_zero_intersection():
    """ADVICE r1: boxes exactly touching (or within ~shrink of touching)
    must report zero intersection, not a spurious open-arc area."""
    from srfdet3d_tpu.geometry.iou import rotated_intersection_pairs
    # axis-aligned 2x2 box touching a 6x2 box along x
    a = jnp.array([0.0, 0.0, 2.0, 2.0, 0.0])
    b = jnp.array([4.0, 0.0, 6.0, 2.0, 0.0])
    inter = float(rotated_intersection_pairs(a, b))
    assert inter == 0.0, inter
    # near-touching (gap 1e-5 < shrink)
    b2 = b.at[0].set(4.0 - 1e-5)
    assert float(rotated_intersection_pairs(a, b2)) == 0.0
    # rotated touching pair: 45-degree square whose corner touches a box
    c = jnp.array([0.0, 0.0, 2.0, 2.0, float(np.pi / 4)])
    d = jnp.array([float(np.sqrt(2)) + 1.0, 0.0, 2.0, 2.0, 0.0])
    assert float(rotated_intersection_pairs(c, d)) == 0.0
    # sanity: genuinely overlapping boxes still report the true area
    e = jnp.array([1.0, 0.0, 2.0, 2.0, 0.0])
    got = float(rotated_intersection_pairs(a, e))
    np.testing.assert_allclose(got, 2.0, rtol=1e-3)
