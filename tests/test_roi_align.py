import jax
import jax.numpy as jnp
import numpy as np

from srfdet3d_tpu.ops.roi_align import multilevel_roi_align
from srfdet3d_tpu.ops.focal_loss import sigmoid_focal_loss, focal_loss_cost


def _np_roi_align_single(feat, roi, stride, out_size=7, sr=2):
    """Numpy oracle: aligned RoIAlign on one level, one roi."""
    h, w, c = feat.shape
    scale = 1.0 / stride
    x1, y1, x2, y2 = roi
    rx1, ry1 = x1 * scale - 0.5, y1 * scale - 0.5
    bin_w = (x2 - x1) * scale / out_size
    bin_h = (y2 - y1) * scale / out_size
    out = np.zeros((out_size, out_size, c), np.float64)
    for ph in range(out_size):
        for pw in range(out_size):
            acc = np.zeros(c)
            for iy in range(sr):
                for ix in range(sr):
                    y = ry1 + (ph + (iy + 0.5) / sr) * bin_h * out_size / out_size
                    y = ry1 + bin_h * (ph + (iy + 0.5) / sr)
                    x = rx1 + bin_w * (pw + (ix + 0.5) / sr)
                    if y < -1.0 or y > h or x < -1.0 or x > w:
                        continue
                    y_ = min(max(y, 0.0), h - 1.0)
                    x_ = min(max(x, 0.0), w - 1.0)
                    y0, x0 = int(np.floor(y_)), int(np.floor(x_))
                    y1c, x1c = min(y0 + 1, h - 1), min(x0 + 1, w - 1)
                    ly, lx = y_ - y0, x_ - x0
                    acc += (feat[y0, x0] * (1 - ly) * (1 - lx) +
                            feat[y0, x1c] * (1 - ly) * lx +
                            feat[y1c, x0] * ly * (1 - lx) +
                            feat[y1c, x1c] * ly * lx)
            out[ph, pw] = acc / (sr * sr)
    return out


def test_roi_align_matches_numpy_oracle():
    rng = np.random.RandomState(0)
    feats = [rng.randn(32, 32, 8).astype(np.float32),
             rng.randn(16, 16, 8).astype(np.float32)]
    strides = [8, 16]
    # roi small enough for level 0 (scale < 112), one large for level 1
    rois = np.array([
        [10.0, 20.0, 90.0, 100.0],    # sqrt(80*80)=80 -> lvl0
        [0.0, 0.0, 200.0, 180.0],     # sqrt(200*180)=189 -> lvl1
        [50.0, 50.0, 58.0, 58.0],     # tiny -> lvl0
    ], np.float32)
    out = np.asarray(multilevel_roi_align(
        [jnp.array(f) for f in feats], jnp.array(rois), strides))
    assert out.shape == (3, 7, 7, 8)
    for i, lvl in [(0, 0), (1, 1), (2, 0)]:
        oracle = _np_roi_align_single(feats[lvl], rois[i], strides[lvl])
        np.testing.assert_allclose(out[i], oracle, rtol=1e-4, atol=1e-4)


def test_roi_align_out_of_bounds_zero():
    feats = [jnp.ones((8, 8, 4))]
    rois = jnp.array([[-500.0, -500.0, -400.0, -400.0]])
    out = np.asarray(multilevel_roi_align(feats, rois, [8]))
    assert np.abs(out).max() == 0.0


def test_roi_align_vmap_batch():
    rng = np.random.RandomState(1)
    feats = [jnp.array(rng.randn(2, 16, 16, 4), jnp.float32),
             jnp.array(rng.randn(2, 8, 8, 4), jnp.float32)]
    rois = jnp.array(rng.uniform(0, 100, (2, 5, 4)), jnp.float32)
    rois = rois.at[..., 2:].add(60.0)
    f = jax.vmap(lambda f0, f1, r: multilevel_roi_align([f0, f1], r, [8, 16]))
    out = f(feats[0], feats[1], rois)
    assert out.shape == (2, 5, 7, 7, 4)
    assert np.isfinite(np.asarray(out)).all()


def test_focal_loss_matches_manual():
    rng = np.random.RandomState(2)
    logits = jnp.array(rng.randn(16, 4), jnp.float32)
    labels = jnp.array(rng.randint(0, 5, 16))  # 4 == background
    loss = np.asarray(sigmoid_focal_loss(logits, labels))
    p = 1 / (1 + np.exp(-np.asarray(logits)))
    t = np.eye(5)[np.asarray(labels)][:, :4]
    ce = -(t * np.log(p) + (1 - t) * np.log(1 - p))
    pt = p * t + (1 - p) * (1 - t)
    at = 0.25 * t + 0.75 * (1 - t)
    manual = (at * (1 - pt) ** 2 * ce).sum(-1)
    np.testing.assert_allclose(loss, manual, rtol=1e-4, atol=1e-5)


def test_focal_cost_shape_and_sign():
    rng = np.random.RandomState(3)
    logits = jnp.array(rng.randn(10, 4), jnp.float32)
    gt_labels = jnp.array([0, 2, 3])
    cost = np.asarray(focal_loss_cost(logits, gt_labels, weight=2.0))
    assert cost.shape == (10, 3)
    # higher logit on the gt class => lower cost
    hi = focal_loss_cost(jnp.array([[5.0, -5, -5, -5]]), jnp.array([0]))
    lo = focal_loss_cost(jnp.array([[-5.0, -5, -5, -5]]), jnp.array([0]))
    assert float(hi[0, 0]) < float(lo[0, 0])


def test_pooled_img_roi_compaction_exact():
    """cap-compacted camera-sum RoI pooling == the all-pairs reference
    path whenever intersecting pairs fit the capacity (off-image pairs
    contribute exactly zero)."""
    from srfdet3d_tpu.models.head import pooled_img_roi
    rng = np.random.default_rng(0)
    b, n_cam, n_p, c = 2, 3, 16, 8
    strides = (4, 8)
    h0, w0 = 16, 24                       # level-0 map; image 64 x 96
    feats = [jnp.asarray(rng.normal(
        size=(b, n_cam, h0 // (s // 4), w0 // (s // 4), c)
    ).astype(np.float32)) for s in strides]
    # mix of on-image, partially-visible, and far off-image RoIs
    rois = np.zeros((b, n_cam, n_p, 4), np.float32)
    x1 = rng.uniform(-200, 120, (b, n_cam, n_p))
    y1 = rng.uniform(-150, 80, (b, n_cam, n_p))
    rois[..., 0] = x1
    rois[..., 1] = y1
    rois[..., 2] = x1 + rng.uniform(5, 60, (b, n_cam, n_p))
    rois[..., 3] = y1 + rng.uniform(5, 40, (b, n_cam, n_p))
    rois_j = jnp.asarray(rois)
    ref = pooled_img_roi(feats, rois_j, strides, res=5, cap=0)
    got = pooled_img_roi(feats, rois_j, strides, res=5, cap=n_p)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_pair_gather_rows_grad_matches_autodiff():
    """The custom-VJP backward (flat row scatter-add) must equal the
    autodiff transpose of the slice gather it replaces."""
    from srfdet3d_tpu.ops.roi_align import _pair_gather_rows
    rng = np.random.default_rng(3)
    s, c, n = 37, 6, 50
    table = jnp.asarray(rng.normal(size=(s, c)).astype(np.float32))
    starts = jnp.asarray(rng.integers(0, s - 1, size=(n,), dtype=np.int32))
    w = jnp.asarray(rng.normal(size=(n, 2, c)).astype(np.float32))

    def plain(t):
        g = jax.vmap(lambda i: jax.lax.dynamic_slice(t, (i, 0), (2, c)))(
            starts)
        return jnp.sum(g * w)

    def custom(t):
        return jnp.sum(_pair_gather_rows(t, starts) * w)

    np.testing.assert_allclose(float(custom(table)), float(plain(table)),
                               rtol=1e-6)
    g_plain = jax.grad(plain)(table)
    g_custom = jax.grad(custom)(table)
    np.testing.assert_allclose(np.asarray(g_custom), np.asarray(g_plain),
                               rtol=1e-5, atol=1e-6)


def test_pair_gather_rows_grad_under_vmap():
    """vmapped (per-sample) use — the shape RoIAlign actually runs in."""
    from srfdet3d_tpu.ops.roi_align import _pair_gather_rows
    rng = np.random.default_rng(4)
    b, s, c, n = 3, 21, 4, 17
    tables = jnp.asarray(rng.normal(size=(b, s, c)).astype(np.float32))
    starts = jnp.asarray(rng.integers(0, s - 1, size=(b, n),
                                      dtype=np.int32))
    w = jnp.asarray(rng.normal(size=(b, n, 2, c)).astype(np.float32))

    def plain(ts):
        g = jax.vmap(lambda t, st: jax.vmap(
            lambda i: jax.lax.dynamic_slice(t, (i, 0), (2, c)))(st))(
            ts, starts)
        return jnp.sum(g * w)

    def custom(ts):
        g = jax.vmap(_pair_gather_rows)(ts, starts)
        return jnp.sum(g * w)

    np.testing.assert_allclose(float(custom(tables)), float(plain(tables)),
                               rtol=1e-6)
    g_plain = jax.grad(plain)(tables)
    g_custom = jax.grad(custom)(tables)
    np.testing.assert_allclose(np.asarray(g_custom), np.asarray(g_plain),
                               rtol=1e-5, atol=1e-6)


def test_patch_path_matches_pairs_path():
    """patch=32 separable-matmul gather == the corner-pair path on a mix
    of small / typical / edge-straddling / fully-offscreen RoIs."""
    rng = np.random.RandomState(5)
    feats = [jnp.array(rng.randn(32, 48, 8), jnp.float32),
             jnp.array(rng.randn(16, 24, 8), jnp.float32)]
    strides = [8, 16]
    n = 24
    x1 = rng.uniform(-80, 300, n)
    y1 = rng.uniform(-60, 200, n)
    rois = np.stack([x1, y1,
                     x1 + rng.uniform(4, 220, n),
                     y1 + rng.uniform(4, 200, n)], -1).astype(np.float32)
    rois[0] = [-500, -500, -400, -400]          # fully offscreen
    rois[1] = [50, 50, 58, 58]                  # tiny
    rois[2] = [-30, -20, 380, 250]              # spans the whole image
    r = jnp.asarray(rois)
    ref = multilevel_roi_align(feats, r, strides)
    got = multilevel_roi_align(feats, r, strides, patch=32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)


def test_patch_path_oversized_uses_fallback():
    """A top-level-clamped RoI wider than the patch window must come out
    of the compacted pairs fallback, exactly; with patch_fallback=0 it
    must come out zero."""
    rng = np.random.RandomState(6)
    feats = [jnp.array(rng.randn(16, 64, 4), jnp.float32)]
    strides = [8]
    # one normal RoI + one enormous one (cells >> 32 at the single level)
    rois = jnp.asarray(np.array([
        [10.0, 10.0, 60.0, 60.0],
        [-3000.0, -20.0, 3500.0, 120.0],
    ], np.float32))
    ref = multilevel_roi_align(feats, rois, strides)
    got = multilevel_roi_align(feats, rois, strides, patch=32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)
    dropped = multilevel_roi_align(feats, rois, strides, patch=32,
                                   patch_fallback=0)
    np.testing.assert_allclose(np.asarray(dropped[0]), np.asarray(ref[0]),
                               rtol=1e-4, atol=1e-5)
    assert np.abs(np.asarray(dropped[1])).max() == 0.0


def test_patch_path_grad_matches_pairs():
    """d(table-features) through the patch path == through the pairs path
    (the slice-gather custom VJP and the separable matmuls transpose to
    the same scatter-add)."""
    rng = np.random.RandomState(7)
    f0 = jnp.array(rng.randn(16, 24, 4), jnp.float32)
    f1 = jnp.array(rng.randn(8, 12, 4), jnp.float32)
    strides = [8, 16]
    n = 6
    x1 = rng.uniform(-20, 120, n)
    y1 = rng.uniform(-20, 80, n)
    rois = jnp.asarray(np.stack(
        [x1, y1, x1 + rng.uniform(5, 150, n),
         y1 + rng.uniform(5, 100, n)], -1).astype(np.float32))
    w = jnp.asarray(rng.randn(n, 7, 7, 4).astype(np.float32))

    def loss(fa, fb, patch):
        out = multilevel_roi_align([fa, fb], rois, strides, patch=patch)
        return jnp.sum(out * w)

    g_ref = jax.grad(lambda a, b: loss(a, b, 0), argnums=(0, 1))(f0, f1)
    g_new = jax.grad(lambda a, b: loss(a, b, 32), argnums=(0, 1))(f0, f1)
    for a, b in zip(g_ref, g_new):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-4, atol=1e-5)


def test_patch_path_under_vmap_batch():
    rng = np.random.RandomState(8)
    feats = [jnp.array(rng.randn(2, 16, 16, 4), jnp.float32),
             jnp.array(rng.randn(2, 8, 8, 4), jnp.float32)]
    rois = jnp.array(rng.uniform(0, 100, (2, 5, 4)), jnp.float32)
    rois = rois.at[..., 2:].add(60.0)
    ref = jax.vmap(lambda f0, f1, r: multilevel_roi_align(
        [f0, f1], r, [8, 16]))(feats[0], feats[1], rois)
    got = jax.vmap(lambda f0, f1, r: multilevel_roi_align(
        [f0, f1], r, [8, 16], patch=32))(feats[0], feats[1], rois)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)


def test_patch_path_edge_straddling_needs_no_fallback():
    """An RoI straddling the image edge with a long offscreen tail must
    stay on the patch path (anchor/fit consider only weighted cells):
    exact vs pairs even with the fallback disabled."""
    rng = np.random.RandomState(9)
    feats = [jnp.array(rng.randn(16, 32, 4), jnp.float32)]
    strides = [8]
    rois = jnp.asarray(np.array([
        [-700.0, 20.0, 60.0, 90.0],     # long tail off the left edge
        [180.0, -500.0, 250.0, 50.0],   # long tail off the top edge
    ], np.float32))
    ref = multilevel_roi_align(feats, rois, strides)
    got = multilevel_roi_align(feats, rois, strides, patch=32,
                               patch_fallback=0)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)


def test_patch_path_bf16_features():
    """bf16 feature maps (compute_dtype=bfloat16 LC): both strategies pool
    in f32 over the bf16 values and agree to bf16-scale tolerance."""
    rng = np.random.RandomState(11)
    feats = [jnp.asarray(rng.randn(16, 24, 8).astype(np.float32)
                         ).astype(jnp.bfloat16),
             jnp.asarray(rng.randn(8, 12, 8).astype(np.float32)
                         ).astype(jnp.bfloat16)]
    strides = [8, 16]
    n = 10
    x1 = rng.uniform(-30, 120, n)
    y1 = rng.uniform(-20, 80, n)
    rois = jnp.asarray(np.stack(
        [x1, y1, x1 + rng.uniform(5, 120, n),
         y1 + rng.uniform(5, 90, n)], -1).astype(np.float32))
    ref = multilevel_roi_align(feats, rois, strides)
    got = multilevel_roi_align(feats, rois, strides, patch=32)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(ref, np.float32),
                               rtol=1e-2, atol=1e-2)
    assert np.isfinite(np.asarray(got, np.float32)).all()


def test_patch_path_zero_rois():
    """R=0 must trace on both strategies (the patch path's chunking once
    divided by zero here)."""
    feats = tuple(jnp.ones((8 // s, 8 // s, 4)) for s in (1, 2))
    rois = jnp.zeros((0, 4))
    for patch in (0, 8):
        out = multilevel_roi_align(feats, rois, (1, 2), out_size=3,
                                   patch=patch)
        assert out.shape == (0, 3, 3, 4)


def test_xpatch_path_matches_pairs_path():
    """xpatch=32 (pairs in y, row-slice matmul in x) == the corner-pair
    path on small / typical / edge-straddling / offscreen RoIs."""
    rng = np.random.RandomState(7)
    feats = [jnp.array(rng.randn(32, 48, 8), jnp.float32),
             jnp.array(rng.randn(16, 24, 8), jnp.float32)]
    strides = [8, 16]
    n = 24
    x1 = rng.uniform(-80, 300, n)
    y1 = rng.uniform(-60, 200, n)
    rois = np.stack([x1, y1,
                     x1 + rng.uniform(4, 220, n),
                     y1 + rng.uniform(4, 200, n)], -1).astype(np.float32)
    rois[0] = [-500, -500, -400, -400]          # fully offscreen
    rois[1] = [50, 50, 58, 58]                  # tiny
    rois[2] = [-30, -20, 380, 250]              # spans the whole image
    r = jnp.asarray(rois)
    ref = multilevel_roi_align(feats, r, strides)
    got = multilevel_roi_align(feats, r, strides, xpatch=32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)


def test_xpatch_x_misfit_uses_fallback():
    """An RoI whose X extent exceeds the window comes out of the pairs
    fallback exactly; with xpatch_fallback=0 it comes out zero, while a
    y-elongated RoI (the case that sank full-patch on cameras) stays on
    the fast path."""
    rng = np.random.RandomState(8)
    feats = [jnp.array(rng.randn(64, 64, 4), jnp.float32)]
    strides = [8]
    rois = jnp.asarray(np.array([
        [10.0, 10.0, 60.0, 60.0],        # normal
        [-3000.0, -20.0, 3500.0, 120.0],  # x-enormous (misfit)
        [100.0, -800.0, 180.0, 900.0],    # y-enormous, x thin (fits!)
    ], np.float32))
    ref = multilevel_roi_align(feats, rois, strides)
    got = multilevel_roi_align(feats, rois, strides, xpatch=32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)
    dropped = multilevel_roi_align(feats, rois, strides, xpatch=32,
                                   xpatch_fallback=0)
    np.testing.assert_allclose(np.asarray(dropped[0]), np.asarray(ref[0]),
                               rtol=1e-4, atol=1e-5)
    assert np.abs(np.asarray(dropped[1])).max() == 0.0
    # y-elongated stays on the fast path (not zeroed by fb=0)
    np.testing.assert_allclose(np.asarray(dropped[2]), np.asarray(ref[2]),
                               rtol=1e-4, atol=1e-5)


def test_xpatch_grad_matches_pairs():
    rng = np.random.RandomState(9)
    feats = [jnp.array(rng.randn(32, 48, 8), jnp.float32),
             jnp.array(rng.randn(16, 24, 8), jnp.float32)]
    strides = [8, 16]
    rois = jnp.asarray(np.array([
        [20.0, 30.0, 120.0, 90.0],
        [0.0, 0.0, 350.0, 240.0],
        [-40.0, 10.0, 60.0, 200.0],
    ], np.float32))

    def loss(fs, **kw):
        out = multilevel_roi_align(fs, rois, strides, **kw)
        return jnp.sum(out * out)

    g_ref = jax.grad(loss)(feats)
    g_xp = jax.grad(lambda fs: loss(fs, xpatch=32))(feats)
    for a, b in zip(g_xp, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)


def test_xpatch_under_vmap_batch():
    rng = np.random.RandomState(10)
    feats = [jnp.array(rng.randn(2, 32, 48, 8), jnp.float32),
             jnp.array(rng.randn(2, 16, 24, 8), jnp.float32)]
    strides = [8, 16]
    rois = jnp.asarray(rng.uniform(0, 150, (2, 5, 4)).astype(np.float32))
    rois = rois.at[..., 2:].add(rois[..., :2])

    ref = jax.vmap(lambda f, r: multilevel_roi_align(f, r, strides))(
        feats, rois)
    got = jax.vmap(lambda f, r: multilevel_roi_align(
        f, r, strides, xpatch=32))(feats, rois)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)
