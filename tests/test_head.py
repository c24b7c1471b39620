"""Decoder head tests: shapes, gradient flow, decode, and loss wiring."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from srfdet3d_tpu.assign import OTAConfig
from srfdet3d_tpu.models.head import (SRFDetHead, SingleSRFDetHead,
                                      DynamicConv, decode_boxes,
                                      lidar_rois_from_boxes)
from srfdet3d_tpu.models.losses import LossConfig, srfdet_losses

PC = (-10.0, -10.0, -5.0, 10.0, 10.0, 3.0)
VS = (0.125, 0.125, 0.2)   # 160x160 BEV grid
B, NP, NCLS, C = 2, 16, 4, 32


def _point_feats(rng):
    sizes = [(20, 20), (10, 10), (5, 5), (3, 3)]  # strides 8,16,32,64
    return [jnp.asarray(rng.normal(size=(B, h, w, C)).astype(np.float32))
            for h, w in sizes]


def _head(use_img=False):
    return SRFDetHead(
        num_classes=NCLS, feat_channels_lidar=C, feat_channels_img=C * 2,
        hidden_dim=C, num_proposals=NP, num_heads=2, num_dpg_exp=2,
        dim_feedforward=64, num_attn_heads=4, dynamic_dim=8,
        pc_range=PC, voxel_size=VS, use_img=use_img, dropout=0.0)


def test_srfdet_head_shapes_and_grad():
    rng = np.random.default_rng(0)
    head = _head()
    feats = _point_feats(rng)
    params = jax.jit(lambda r, f: head.init(r, f, train=False))(
        jax.random.PRNGKey(0), feats)
    logits, boxes = jax.jit(
        lambda p, f: head.apply(p, f, train=False))(params, feats)
    assert logits.shape == (2, B, NP, NCLS)
    assert boxes.shape == (2, B, NP, 10)
    # centers are absolute within pc_range
    assert np.all(np.asarray(boxes[..., 0]) >= PC[0] - 1e-4)
    assert np.all(np.asarray(boxes[..., 0]) <= PC[3] + 1e-4)

    def loss_fn(p):
        (lg, bx), _ = head.apply(p, feats, train=True,
                                 rngs={"dropout": jax.random.PRNGKey(1)},
                                 mutable=["batch_stats"])
        return jnp.sum(lg ** 2) + jnp.sum(bx[..., 3:6] ** 2)

    grads = jax.jit(jax.grad(loss_fn))(params)
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.all(np.isfinite(np.asarray(g))) for g in leaves)
    # DPG embeddings receive gradient
    gb = grads["params"]["init_proposal_boxes"]
    assert np.abs(np.asarray(gb)).max() > 0


def test_unroll_train_matches_rolled_scan():
    """unroll_train inlines the scan bodies for TRAIN traces only; params,
    forward values, and grads must be identical to the rolled scan."""
    rng = np.random.default_rng(3)
    feats = _point_feats(rng)
    rolled = _head()
    unrolled = rolled.clone(unroll_train=True)
    params = jax.jit(lambda r, f: rolled.init(r, f, train=False))(
        jax.random.PRNGKey(0), feats)
    assert jax.tree_util.tree_structure(params) == \
        jax.tree_util.tree_structure(
            jax.eval_shape(lambda f: unrolled.init(
                jax.random.PRNGKey(0), f, train=False), feats))

    def loss(head, p):
        (lg, bx), _ = head.apply(p, feats, train=True,
                                 rngs={"dropout": jax.random.PRNGKey(1)},
                                 mutable=["batch_stats"])
        return jnp.sum(lg ** 2) + jnp.sum(bx ** 2), (lg, bx)

    (l0, (lg0, bx0)), g0 = jax.jit(jax.value_and_grad(
        lambda p: loss(rolled, p), has_aux=True))(params)
    (l1, (lg1, bx1)), g1 = jax.jit(jax.value_and_grad(
        lambda p: loss(unrolled, p), has_aux=True))(params)
    # not bit-identical: inlining the bodies lets XLA re-fuse/reassociate.
    # The random-init decoder is numerically CHAOTIC (LN + softmax chains
    # over 2 iterations): a measured 1.2e-7 input perturbation moves some
    # grad leaves by >100% of their scale on the SAME program, so grads
    # are compared at 1e-2-of-leaf-scale — far above fusion noise (~1e-3
    # of scale measured), far below any semantic difference (O(1)).
    np.testing.assert_allclose(np.asarray(lg0), np.asarray(lg1),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(bx0), np.asarray(bx1),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(float(l0), float(l1), rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(g0),
                    jax.tree_util.tree_leaves(g1)):
        a, b = np.asarray(a), np.asarray(b)
        scale = max(np.abs(a).max(), 1.0)
        assert np.abs(a - b).max() <= 1e-2 * scale


def test_unroll_predict_matches_rolled_scan():
    """unroll_predict inlines the scan bodies for PREDICT traces (LC
    configs default it on, configs/__init__.py); outputs must match the
    rolled scan to fusion-reassociation noise."""
    rng = np.random.default_rng(5)
    feats = _point_feats(rng)
    rolled = _head()
    unrolled = rolled.clone(unroll_predict=True)
    params = jax.jit(lambda r, f: rolled.init(r, f, train=False))(
        jax.random.PRNGKey(0), feats)
    o0 = jax.jit(lambda p, f: rolled.apply(p, f, train=False))(
        params, feats)
    o1 = jax.jit(lambda p, f: unrolled.apply(p, f, train=False))(
        params, feats)
    for a, b in zip(jax.tree_util.tree_leaves(o0),
                    jax.tree_util.tree_leaves(o1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-4)


def test_fusion_head_shapes():
    rng = np.random.default_rng(1)
    head = _head(use_img=True)
    pts = _point_feats(rng)
    n_cam = 2
    img_sizes = [(16, 24), (8, 12), (4, 6), (2, 3)]
    imgs = [jnp.asarray(
        rng.normal(size=(B, n_cam, h, w, C * 2)).astype(np.float32))
        for h, w in img_sizes]
    l2i = jnp.broadcast_to(jnp.eye(4), (B, n_cam, 4, 4)).astype(jnp.float32)
    params = jax.jit(lambda r: head.init(r, pts, imgs, l2i, train=False))(
        jax.random.PRNGKey(0))
    logits, boxes = jax.jit(
        lambda p: head.apply(p, pts, imgs, l2i, train=False))(params)
    assert logits.shape == (2, B, NP, NCLS)
    assert boxes.shape == (2, B, NP, 10)


def test_losses_finite_and_positive():
    rng = np.random.default_rng(2)
    head = _head()
    feats = _point_feats(rng)
    params = jax.jit(lambda r, f: head.init(r, f, train=False))(
        jax.random.PRNGKey(0), feats)
    logits, boxes = jax.jit(
        lambda p, f: head.apply(p, f, train=False))(params, feats)

    g_cap = 6
    gt = np.zeros((B, g_cap, 9), np.float32)
    gt[..., 0:2] = rng.uniform(-8, 8, (B, g_cap, 2))
    gt[..., 2] = rng.uniform(-2, 0, (B, g_cap))
    gt[..., 3:6] = rng.uniform(0.5, 3.0, (B, g_cap, 3))
    labels = rng.integers(0, NCLS, (B, g_cap)).astype(np.int32)
    mask = np.zeros((B, g_cap), bool)
    mask[:, :3] = True

    losses = jax.jit(lambda lg, bx, g, lb, m: srfdet_losses(
        lg, bx, g, lb, m,
        LossConfig(num_classes=NCLS), OTAConfig(pc_range=PC)))(
        logits, boxes, jnp.asarray(gt), jnp.asarray(labels),
        jnp.asarray(mask))
    assert set(losses) == {"loss_cls", "loss_bbox",
                           "s.0.loss_cls", "s.0.loss_bbox"}
    for k, v in losses.items():
        assert np.isfinite(float(v)), k
        assert float(v) >= 0, k


def test_decode_boxes_static_shapes():
    rng = np.random.default_rng(3)
    logits = jnp.asarray(rng.normal(-2, 1, (B, NP, NCLS)).astype(np.float32))
    boxes = np.zeros((B, NP, 10), np.float32)
    boxes[..., 0:2] = rng.uniform(-8, 8, (B, NP, 2))
    boxes[..., 2] = rng.uniform(-2, 0, (B, NP))
    boxes[..., 3:6] = np.log(rng.uniform(0.5, 3.0, (B, NP, 3)))
    yaw = rng.uniform(-np.pi, np.pi, (B, NP))
    boxes[..., 6], boxes[..., 7] = np.sin(yaw), np.cos(yaw)
    out = decode_boxes(logits, jnp.asarray(boxes), max_per_img=8,
                       score_thr=0.01)
    assert out["boxes"].shape == (B, 8, 9)
    assert out["scores"].shape == (B, 8)
    assert out["labels"].shape == (B, 8)
    # valid entries have bottom-center z and in-range centers
    v = np.asarray(out["valid"])
    assert v.dtype == bool


def test_lidar_rois_cover_box():
    # axis-aligned box -> roi equals its BEV extent in grid units
    box = jnp.asarray([[[0.0, 0.0, -1.0, np.log(2.0), np.log(4.0),
                         np.log(1.0), 0.0, 1.0, 0.0, 0.0]]])
    roi = np.asarray(lidar_rois_from_boxes(box, PC, VS))[0, 0]
    # center (0,0) -> grid (80,80); w=2 -> ±8 in x; l=4 -> ±16 in y
    np.testing.assert_allclose(roi, [80 - 8, 80 - 16, 80 + 8, 80 + 16],
                               atol=1e-4)


def test_visible_pair_counts_bounds_compaction_exactness():
    """visible_pair_counts sizes img_roi_cap: with cap >= max count the
    compacted pooling equals the all-pairs path; behind-camera projections
    (huge straddling RoIs) are counted as visible."""
    from srfdet3d_tpu.models.head import (pooled_img_roi,
                                          visible_pair_counts,
                                          img_rois_from_boxes)
    rng = np.random.default_rng(9)
    b, n_cam, n_p, c = 1, 2, 10, 4
    strides = (4, 8)
    feats = [jnp.asarray(rng.normal(size=(b, n_cam, 16, 24, c))
                         .astype(np.float32)),
             jnp.asarray(rng.normal(size=(b, n_cam, 8, 12, c))
                         .astype(np.float32))]
    x1 = rng.uniform(-300, 90, (b, n_cam, n_p)).astype(np.float32)
    y1 = rng.uniform(-200, 60, (b, n_cam, n_p)).astype(np.float32)
    rois = np.stack([x1, y1, x1 + 40, y1 + 30], -1).astype(np.float32)
    rois_j = jnp.asarray(rois)
    counts = np.asarray(visible_pair_counts(rois_j, (64, 96), strides))
    assert counts.shape == (b, n_cam)
    cap = int(counts.max())
    ref = pooled_img_roi(feats, rois_j, strides, res=5, cap=0)
    got = pooled_img_roi(feats, rois_j, strides, res=5, cap=max(cap, 1))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)

    # a box BEHIND the camera projects to a straddling huge RoI -> counted
    boxes = jnp.asarray(np.array(
        [[[0.0, 0.0, -1.0, np.log(2.0), np.log(2.0), np.log(1.5),
           0.0, 1.0, 0.0, 0.0]]], np.float32))
    l2i = np.eye(4, dtype=np.float32)
    l2i[2, 3] = -5.0          # camera 5 m ahead: box is behind it
    cam_rois = img_rois_from_boxes(boxes, jnp.asarray(l2i)[None, None])
    n_vis = int(visible_pair_counts(cam_rois, (64, 96), strides)[0, 0])
    assert n_vis == 1


def test_losses_head_idx_wiring(monkeypatch):
    """Reference srfdet_head.py:1067/1084: aux layer i is assigned with
    head_idx=i+1 and the LAST layer with the decoder's num_heads (NOT the
    assigner's own num_heads=6) — pin the wiring with a capturing stub."""
    import srfdet3d_tpu.models.losses as L

    # the assignments now run under ONE layer-vmap, so head_idx arrives as
    # a batched tracer — observe the wiring through the returned values
    # (each layer's assignment carries its head_idx) instead of capturing
    # python ints per call
    def fake_assign(pb, pl, gb, gl, gm, head_idx, cfg):
        return jnp.full(pb.shape[:2],
                        jnp.asarray(head_idx).astype(jnp.int32))

    seen = []
    real_layer_losses = L._layer_losses

    def spy_layer_losses(pl, pb, matched, gb, gl, cfg):
        seen.append(int(matched[0, 0]))
        return real_layer_losses(pl, pb, jnp.full_like(matched, -1),
                                 gb, gl, cfg)

    monkeypatch.setattr(L, "ota_assign_batch", fake_assign)
    monkeypatch.setattr(L, "_layer_losses", spy_layer_losses)
    rng = np.random.default_rng(0)
    nl, b, n_p, ncls = 3, 1, 6, 4
    logits = jnp.asarray(rng.normal(size=(nl, b, n_p, ncls))
                         .astype(np.float32))
    boxes = jnp.asarray(rng.normal(size=(nl, b, n_p, 10))
                        .astype(np.float32))
    gt = jnp.zeros((b, 2, 9), jnp.float32)
    labels = jnp.zeros((b, 2), jnp.int32)
    mask = jnp.ones((b, 2), bool)
    out = L.srfdet_losses(logits, boxes, gt, labels, mask,
                          LossConfig(num_classes=ncls), OTAConfig(pc_range=PC))
    assert seen == [1, 2, nl], seen
    for v in out.values():
        assert np.isfinite(float(v))
