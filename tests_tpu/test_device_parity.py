"""Kernel-vs-XLA parity ON DEVICE (real Mosaic lowering, MXU numerics).

Tolerances: on TPU, f32 matmuls at DEFAULT precision run a single bf16
pass (products truncate operands to bf16; accumulation stays f32), in the
kernels AND in the XLA reference alike — but rounding orders differ, so
value comparisons sit at the bf16-product scale (~2^-8 relative), not at
f32 ulps.  Value-MOVING stages (one-hot gathers / scatter-add addends) are
bf16x3-split in the kernels and exact in the XLA reference, so the error
budget is dominated by the product stages only.
"""

import numpy as np
import pytest

from conftest import tpu_available

if not tpu_available():
    pytest.skip("TPU backend not reachable (tunnel relay down?)",
                allow_module_level=True)

import jax
import jax.numpy as jnp

if jax.default_backend() in ("cpu",):
    pytest.skip("no TPU device", allow_module_level=True)


def _near_monotone_idx(rng, m, k, n, jitter=64, miss_rate=0.05):
    """Rulebook-like indices: per-offset near-monotone with misses."""
    base = np.sort(rng.integers(0, n, size=(m,)))
    idx = np.zeros((m, k), np.int32)
    for j in range(k):
        col = base + rng.integers(-jitter, jitter, size=(m,))
        idx[:, j] = np.clip(col, 0, n - 1)
    miss = rng.random((m, k)) < miss_rate
    idx[miss] = n
    return jnp.asarray(idx)


def _xla_ref(feats, idx, w):
    n, cin = feats.shape
    k = idx.shape[1]
    cout = w.shape[2]
    f0 = jnp.concatenate([feats, jnp.zeros((1, cin), feats.dtype)], axis=0)
    g = f0[idx]                                           # (M, K, Cin)
    return jnp.dot(g.reshape(-1, k * cin), w.reshape(k * cin, cout),
                   preferred_element_type=jnp.float32).astype(feats.dtype)


def test_onehot_fwd_on_device():
    from srfdet3d_tpu.ops.pallas_onehot import gather_matmul_onehot
    rng = np.random.default_rng(0)
    n, m, k, cin, cout = 4096, 2048, 27, 16, 16
    feats = jnp.asarray(rng.normal(size=(n, cin)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(k, cin, cout)).astype(np.float32))
    idx = _near_monotone_idx(rng, m, k, n)
    out = jax.jit(lambda f, i, ww: gather_matmul_onehot(
        f, i, ww, tm=256, wp=256))(feats, idx, w)
    ref = jax.jit(_xla_ref)(feats, idx, w)
    out, ref = np.asarray(out), np.asarray(ref)
    # bf16-product scale, k*cin=432-term sums
    scale = np.abs(ref).max()
    np.testing.assert_allclose(out, ref, rtol=2e-2, atol=2e-2 * scale)


def test_onehot_bwd_on_device():
    from srfdet3d_tpu.ops.pallas_onehot_bwd import gather_matmul_onehot_bwd
    rng = np.random.default_rng(1)
    n, m, k, cin, cout = 4096, 2048, 27, 16, 16
    feats = jnp.asarray(rng.normal(size=(n, cin)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(k, cin, cout)).astype(np.float32))
    idx = _near_monotone_idx(rng, m, k, n)
    g = jnp.asarray(rng.normal(size=(m, cout)).astype(np.float32))

    def ref_loss(f, ww):
        return jnp.sum(_xla_ref(f, idx, ww) * g)

    dfe_ref, dw_ref = jax.jit(jax.grad(ref_loss, argnums=(0, 1)))(feats, w)
    dfe, dw = jax.jit(lambda f, i, ww, gg: gather_matmul_onehot_bwd(
        f, i, ww, gg, tm=256, wp=256))(feats, idx, w, g)
    for a, b in ((dfe, dfe_ref), (dw, dw_ref)):
        a, b = np.asarray(a), np.asarray(b)
        np.testing.assert_allclose(a, b, rtol=2e-2,
                                   atol=2e-2 * np.abs(b).max())


def test_roi_patch_vs_pairs_on_device():
    from srfdet3d_tpu.ops.roi_align import multilevel_roi_align
    rng = np.random.default_rng(2)
    c, n_p = 64, 128
    feats = tuple(jnp.asarray(rng.normal(
        size=(64 // (1 << i), 64 // (1 << i), c)).astype(np.float32))
        for i in range(4))
    strides = (8, 16, 32, 64)
    ctr = rng.uniform(50, 450, (n_p, 2))
    wh = rng.uniform(8, 120, (n_p, 2))
    rois = jnp.asarray(np.concatenate(
        [ctr - wh / 2, ctr + wh / 2], -1).astype(np.float32))
    pairs = jax.jit(lambda f, r: multilevel_roi_align(
        f, r, strides, patch=0))(feats, rois)
    patch = jax.jit(lambda f, r: multilevel_roi_align(
        f, r, strides, patch=32, patch_fallback=64))(feats, rois)
    # identical bilinear samples, different gather strategy: near-exact
    np.testing.assert_allclose(np.asarray(patch), np.asarray(pairs),
                               rtol=1e-5, atol=1e-5)


def test_rotated_intersection_on_device():
    """Green's-theorem edge clipping vs the independent candidate-sort
    construction, both ON DEVICE (f32 vector math, no MXU truncation)."""
    from srfdet3d_tpu.geometry.iou import (rotated_intersection_bev,
                                           _rotated_intersection_bev_sort)
    rng = np.random.RandomState(3)
    n = 64
    b1 = np.stack([rng.uniform(-30, 30, n), rng.uniform(-30, 30, n),
                   rng.uniform(0.3, 8, n), rng.uniform(0.3, 8, n),
                   rng.uniform(-2 * np.pi, 2 * np.pi, n)], -1)
    b2 = b1 + rng.normal(0, 0.4, (n, 5))
    # sizes must stay positive: the perturbation can push a small width
    # negative, and a degenerate box is where the two constructions
    # legitimately disagree (Green's clips to an empty region -> 0; the
    # candidate sort builds a spurious polygon from the reflected rect).
    # The pipeline never produces negative sizes (exp of raw codes).
    b2[:, 2:4] = np.maximum(b2[:, 2:4], 0.1)
    b1, b2 = jnp.asarray(b1, jnp.float32), jnp.asarray(b2, jnp.float32)
    new = np.asarray(jax.jit(rotated_intersection_bev)(b1, b2))
    ref = np.asarray(jax.jit(_rotated_intersection_bev_sort)(b1, b2))
    # Green's documented error is shrink-linear with a 1/sin(edge angle)
    # amplification at near-parallel crossing edges (measured exactly
    # linear: err = 50 * shrink on this set's worst pair, a sliver
    # intersection at relative yaw ~pi/2 - 0.02).  shrink=1e-4 bounds the
    # absolute intersection error at ~5e-3 here -> IoU error ~1e-4, far
    # below NMS/OTA sensitivity; 2e-2 still catches real clipping bugs
    # (wrong-edge/ownership errors are O(0.1-1)).
    np.testing.assert_allclose(new, ref, atol=2e-2)


def test_symbwd_on_device():
    """Symmetric subm backward kernel vs XLA autodiff on device (real
    Mosaic numerics).  Uses a REAL subm rulebook (the identity it exploits
    only holds for symmetric rulebooks)."""
    from srfdet3d_tpu.ops.pallas_onehot_bwd import gather_matmul_onehot_symbwd
    from srfdet3d_tpu.ops.sparse_conv import subm_gather_indices_batched
    rng = np.random.default_rng(3)
    shape, n_active, v = (8, 40, 40), 3000, 4096
    cin, cout, k = 16, 16, 27
    d, h, w_ = shape
    lin = np.sort(rng.choice(d * h * w_, size=n_active, replace=False))
    coords = np.stack([lin // (h * w_), (lin // w_) % h, lin % w_], -1)
    coords = np.concatenate(
        [coords, np.zeros((v - n_active, 3), np.int64)], 0)
    mask = np.arange(v) < n_active
    idx = subm_gather_indices_batched(
        jnp.asarray(coords, jnp.int32)[None], jnp.asarray(mask)[None],
        shape, 3).reshape(v, k)

    feats = jnp.asarray(rng.normal(size=(v, cin)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(k, cin, cout)).astype(np.float32))
    g = jnp.asarray(rng.normal(size=(v, cout)).astype(np.float32))

    def ref_loss(f, ww):
        return jnp.sum(_xla_ref(f, idx, ww) * g)

    dfe_ref, dw_ref = jax.jit(jax.grad(ref_loss, argnums=(0, 1)))(feats, w)
    dfe, dw = jax.jit(lambda f, i, ww, gg: gather_matmul_onehot_symbwd(
        f, i, ww, gg, tm=256, wp=256))(feats, idx, w, g)
    for a, b in ((dfe, dfe_ref), (dw, dw_ref)):
        a, b = np.asarray(a), np.asarray(b)
        np.testing.assert_allclose(a, b, rtol=2e-2,
                                   atol=2e-2 * np.abs(b).max())


def test_eqmatch_rulebook_on_device():
    """Eq-match rulebook kernel vs the gather-chain bitmap path, REAL
    Mosaic lowering (interpret mode can't catch DMA alignment or the
    bf16 one-hot x payload exactness): bit-identical subm + strided
    rulebooks on a plan-major random scene."""
    from srfdet3d_tpu.ops import bitmap_rulebook as br
    rng = np.random.default_rng(5)
    shape = (12, 48, 48)
    d, h, w_ = shape
    v = 2048
    n = 1600
    cells = rng.choice(d * h * w_, size=n, replace=False)
    z, yx = cells % d, cells // d
    y, x = yx // w_, yx % w_
    order = np.argsort((y * w_ + x) * d + z)
    coords = np.zeros((1, v, 3), np.int32)
    coords[0, :n] = np.stack([z[order], y[order], x[order]], -1)
    mask = np.zeros((1, v), bool)
    mask[0, :n] = True
    coords, mask = jnp.asarray(coords), jnp.asarray(mask)

    cs, vcol, vz = br.build_columns(coords, mask, shape)
    ref = np.asarray(jax.jit(br.subm_rulebook_bitmap)(cs, vcol, vz, mask))
    got = np.asarray(jax.jit(
        lambda cs, c, vc, vz, m: br.subm_rulebook_eqmatch(
            cs, c, vc, vz, m, wc=512, tm=256))(
        cs, coords, vcol, vz, mask))
    np.testing.assert_array_equal(got, ref)

    ref_d = jax.jit(lambda cs: br.strided_downsample_bitmap(
        cs, (1, 1, 1), 1024, eqmatch=False))(cs)
    got_d = jax.jit(lambda cs: br.strided_downsample_bitmap(
        cs, (1, 1, 1), 1024, eqmatch=True))(cs)
    np.testing.assert_array_equal(np.asarray(got_d[4]),
                                  np.asarray(ref_d[4]))


def test_patch_scatter_on_device():
    """roi_window_scatter_add REAL Mosaic lowering (dynamic-offset 2D
    window DMAs + 8-way static-slice adds — interpret mode can't catch
    an unaligned DMA that fails to lower) vs the XLA flat single-row
    scatter on flagship patch geometry (900 RoIs, 32x32, C=128)."""
    from srfdet3d_tpu.ops.pallas_patch_scatter import roi_window_scatter_add
    rng = np.random.default_rng(7)
    shapes = ((184, 184), (92, 92), (46, 46), (23, 23))
    p_, c, n = 32, 128, 900
    lvl = rng.integers(0, 4, n).astype(np.int32)
    ay = np.zeros(n, np.int32)
    ax = np.zeros(n, np.int32)
    dpv = rng.normal(size=(n, p_, p_, c)).astype(np.float32)
    for i in range(n):
        h, w = shapes[lvl[i]]
        ay[i] = rng.integers(0, max(h - p_, 0) + 1)
        ax[i] = rng.integers(0, max(w - p_, 0) + 1)
        if h < p_:
            dpv[i, h - ay[i]:] = 0.0
        if w < p_:
            dpv[i, :, w - ax[i]:] = 0.0
    offs = np.cumsum([0] + [h * w for h, w in shapes])
    s_rows = int(offs[-1])
    ws = np.array([w for _h, w in shapes], np.int32)
    starts = (offs[lvl].astype(np.int32)[:, None] +
              (ay[:, None] + np.arange(p_, dtype=np.int32)) *
              ws[lvl][:, None] + ax[:, None])        # (N, P)
    jd, jl = jnp.asarray(dpv), jnp.asarray(lvl)
    jy, jx, js = jnp.asarray(ay), jnp.asarray(ax), jnp.asarray(starts)

    def xla_ref(st, pa):
        idx = (st.reshape(-1)[:, None] +
               jnp.arange(p_, dtype=jnp.int32)).reshape(-1)
        return jnp.zeros((s_rows + p_, c), jnp.float32).at[idx].add(
            pa.reshape(-1, c), mode="drop")[:s_rows]

    ref = np.asarray(jax.jit(xla_ref)(js, jd))
    got = np.asarray(jax.jit(lambda d, l, y, x: roi_window_scatter_add(
        d, l, y, x, shapes, p_))(jd, jl, jy, jx))
    np.testing.assert_allclose(got, ref, atol=1e-3, rtol=1e-5)
