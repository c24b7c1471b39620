"""Backward one-hot kernel vs autodiff of the XLA gather reference."""

import jax
import jax.numpy as jnp
import numpy as np

from srfdet3d_tpu.ops.pallas_onehot_bwd import gather_matmul_onehot_bwd
from tests.test_pallas_onehot import _xla_ref, _near_monotone_idx, _pack


def _ref_grads(feats, idx, w, g):
    def f(fe, we):
        return jnp.sum(_xla_ref(fe, idx, we) * g)

    return jax.grad(f, argnums=(0, 1))(feats, w)


def test_bwd_matches_autodiff():
    rng = np.random.default_rng(0)
    n, m, k, cin, cout = 2048, 1024, 27, 16, 16
    feats = jnp.asarray(rng.normal(size=(n, cin)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(k, cin, cout)).astype(np.float32))
    idx = _near_monotone_idx(rng, m, k, n)
    g = jnp.asarray(rng.normal(size=(m, cout)).astype(np.float32))
    dfe_ref, dw_ref = _ref_grads(feats, idx, w, g)
    wp = max(16, 1024 // _pack(cin))
    dfe, dw = gather_matmul_onehot_bwd(feats, idx, w, g, tm=256, wp=wp,
                                       interpret=True)
    np.testing.assert_allclose(np.asarray(dfe), np.asarray(dfe_ref),
                               rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(dw), np.asarray(dw_ref),
                               rtol=1e-3, atol=1e-3)


def test_bwd_random_all_corrected():
    rng = np.random.default_rng(1)
    n, m, k, cin, cout = 512, 512, 9, 32, 16
    feats = jnp.asarray(rng.normal(size=(n, cin)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(k, cin, cout)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, n + 1, size=(m, k)).astype(np.int32))
    g = jnp.asarray(rng.normal(size=(m, cout)).astype(np.float32))
    dfe_ref, dw_ref = _ref_grads(feats, idx, w, g)
    dfe, dw = gather_matmul_onehot_bwd(feats, idx, w, g, tm=128, wp=16,
                                       correction_tiles=4096,
                                       interpret=True)
    np.testing.assert_allclose(np.asarray(dfe), np.asarray(dfe_ref),
                               rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(dw), np.asarray(dw_ref),
                               rtol=1e-3, atol=1e-3)


def test_bwd_overflow_falls_back_to_full_correction():
    """More OOW tiles than `correction_tiles` (ADVICE r1 medium): must
    lax.cond into the exact full-range gradient correction."""
    rng = np.random.default_rng(7)
    n, m, k, cin, cout = 512, 512, 9, 32, 16
    feats = jnp.asarray(rng.normal(size=(n, cin)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(k, cin, cout)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, n + 1, size=(m, k)).astype(np.int32))
    g = jnp.asarray(rng.normal(size=(m, cout)).astype(np.float32))
    dfe_ref, dw_ref = _ref_grads(feats, idx, w, g)
    dfe, dw = gather_matmul_onehot_bwd(feats, idx, w, g, tm=128, wp=16,
                                       correction_tiles=1,
                                       interpret=True)
    np.testing.assert_allclose(np.asarray(dfe), np.asarray(dfe_ref),
                               rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(dw), np.asarray(dw_ref),
                               rtol=1e-3, atol=1e-3)


def test_bwd_matches_autodiff_bf16():
    """bf16 table: dtype-dependent snap-16 window layout + bf16 one-hot /
    ystack casts must still match the XLA autodiff backward (bf16-scale
    tolerances)."""
    rng = np.random.default_rng(11)
    n, cin, cout, m, k = 400, 16, 32, 512, 27
    feats = jnp.asarray(
        rng.normal(size=(n, cin)).astype(np.float32)).astype(jnp.bfloat16)
    idx = _near_monotone_idx(rng, m, k, n)
    w = jnp.asarray(rng.normal(size=(k, cin, cout)).astype(np.float32) * 0.1
                    ).astype(jnp.bfloat16)
    g = jnp.asarray(rng.normal(size=(m, cout)).astype(np.float32)
                    ).astype(jnp.bfloat16)

    # reference in f32 over the bf16 VALUES: autodiff of a bf16-typed
    # reference would bf16-round every scatter-add contribution (an
    # accumulation the kernel does in f32 — strictly more accurate)
    def ref_loss(f, wts):
        f0 = jnp.concatenate([f, jnp.zeros((1, cin))], axis=0)
        out = jnp.einsum("mkc,kcd->md", f0[idx], wts)
        return jnp.sum(out * g.astype(jnp.float32))

    df_ref, dw_ref = jax.grad(ref_loss, argnums=(0, 1))(
        feats.astype(jnp.float32), w.astype(jnp.float32))
    df, dw = gather_matmul_onehot_bwd(feats, idx, w, g, tm=128, wp=64,
                                      interpret=True)
    # kernel keeps bf16 intermediates (ystack/windows); errors stay at the
    # per-contribution bf16 scale, not the accumulated-sum scale
    np.testing.assert_allclose(np.asarray(df), np.asarray(df_ref),
                               rtol=2e-2, atol=1e-1)
    np.testing.assert_allclose(np.asarray(dw), np.asarray(dw_ref),
                               rtol=2e-2, atol=1e-1)


def _subm_idx(rng, shape, n_active, v_cap):
    """A real (symmetric) subm rulebook on random sites, capacity-padded."""
    from srfdet3d_tpu.ops.sparse_conv import subm_gather_indices_batched
    d, h, w = shape
    lin = np.sort(rng.choice(d * h * w, size=n_active, replace=False))
    coords = np.stack([lin // (h * w), (lin // w) % h, lin % w], -1)
    coords = np.concatenate(
        [coords, np.zeros((v_cap - n_active, 3), np.int64)], 0)
    mask = np.arange(v_cap) < n_active
    return subm_gather_indices_batched(
        jnp.asarray(coords, jnp.int32)[None], jnp.asarray(mask)[None],
        shape, 3).reshape(v_cap, 27)


def test_symbwd_matches_autodiff_small_windows():
    """Symmetric subm backward kernel vs autodiff of the XLA gather
    forward, with windows deliberately too small (wp=16) so a large
    fraction of entries goes through the tile-granular OOW correction."""
    from srfdet3d_tpu.ops.pallas_onehot_bwd import gather_matmul_onehot_symbwd
    rng = np.random.default_rng(11)
    shape, n_active, v = (6, 12, 12), 400, 512
    idx = _subm_idx(rng, shape, n_active, v)
    cin, cout = 5, 7
    feats = jnp.asarray(rng.normal(size=(v, cin)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(27, cin, cout)).astype(np.float32))
    g = jnp.asarray(rng.normal(size=(v, cout)).astype(np.float32))
    dfe_ref, dw_ref = _ref_grads(feats, idx, w, g)
    dfe, dw = gather_matmul_onehot_symbwd(
        feats, idx, w, g, tm=128, wp=16, correction_tiles=4,
        interpret=True)
    np.testing.assert_allclose(np.asarray(dfe), np.asarray(dfe_ref),
                               rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(dw), np.asarray(dw_ref),
                               rtol=1e-3, atol=1e-3)


def test_symbwd_overflow_falls_back_to_full_correction():
    """More OOW tiles than correction_tiles: the lax.cond must take the
    exact full-range correction (correction_tiles=1 guarantees overflow
    at wp=16 on a 4-tile rulebook)."""
    from srfdet3d_tpu.ops.pallas_onehot_bwd import gather_matmul_onehot_symbwd
    rng = np.random.default_rng(13)
    shape, n_active, v = (6, 12, 12), 400, 512
    idx = _subm_idx(rng, shape, n_active, v)
    cin, cout = 4, 6
    feats = jnp.asarray(rng.normal(size=(v, cin)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(27, cin, cout)).astype(np.float32))
    g = jnp.asarray(rng.normal(size=(v, cout)).astype(np.float32))
    dfe_ref, dw_ref = _ref_grads(feats, idx, w, g)
    dfe, dw = gather_matmul_onehot_symbwd(
        feats, idx, w, g, tm=128, wp=16, correction_tiles=1,
        interpret=True)
    np.testing.assert_allclose(np.asarray(dfe), np.asarray(dfe_ref),
                               rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(dw), np.asarray(dw_ref),
                               rtol=1e-3, atol=1e-3)


def test_revsym_strided_bwd_matches_autodiff():
    """Reverse-rulebook backward (sparse_conv ONEHOT_BWD=revsym) on a REAL
    strided rulebook: transposing the rulebook (one int32 scatter) and
    running the symbwd kernel with flip=False must reproduce autodiff of
    the XLA gather forward — misses, capacity padding, never-referenced
    inputs and OOW corrections (wp=16) included."""
    import srfdet3d_tpu.ops.sparse_conv as sc
    from srfdet3d_tpu.ops.pallas_onehot_bwd import gather_matmul_onehot_symbwd
    from srfdet3d_tpu.ops.sparse_conv import (
        SparseTensor, generate_output_sites, strided_gather_indices_batched)

    rng = np.random.default_rng(17)
    shape, n_active, v_in, v_out = (6, 12, 12), 300, 384, 256
    cin, cout, k = 5, 7, 27
    d, h, w_ = shape
    lin = np.sort(rng.choice(d * h * w_, size=n_active, replace=False))
    coords = np.stack([lin // (h * w_), (lin // w_) % h, lin % w_], -1)
    coords = np.concatenate(
        [coords, np.zeros((v_in - n_active, 3), np.int64)], 0)
    mask = np.arange(v_in) < n_active
    st = SparseTensor(jnp.zeros((v_in, 1)), jnp.asarray(coords, jnp.int32),
                      jnp.asarray(mask), shape)
    kernel, stride, pad = (3, 3, 3), (2, 2, 2), (1, 1, 1)
    oc, om = generate_output_sites(st, kernel, stride, pad, v_out)
    idx = strided_gather_indices_batched(
        st.coords[None], st.mask[None], shape, oc[None], om[None],
        kernel, stride, pad).reshape(v_out, k)

    feats = jnp.asarray(rng.normal(size=(v_in, cin)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(k, cin, cout)).astype(np.float32))
    g = jnp.asarray(rng.normal(size=(v_out, cout)).astype(np.float32))

    def ref_loss(f, ww):
        f0 = jnp.concatenate([f, jnp.zeros((1, cin))], axis=0)
        return jnp.sum(jnp.einsum("mkc,kcd->md", f0[idx], ww) * g)

    dfe_ref, dw_ref = jax.grad(ref_loss, argnums=(0, 1))(feats, w)

    # build rev like sparse_conv._onehot_conv_bwd does
    mm = jnp.arange(v_out, dtype=jnp.int32)[:, None]
    dest = idx * k + jnp.arange(k, dtype=jnp.int32)[None, :]
    rev = jnp.full((v_in * k,), v_out, jnp.int32).at[
        dest.reshape(-1)].set(
        jnp.broadcast_to(mm, (v_out, k)).reshape(-1),
        mode="drop").reshape(v_in, k)

    for wp, ct in ((16, 4),):            # forced-OOW layout (covers both
                                         # kernel and correction paths)
        dfe, dw = gather_matmul_onehot_symbwd(
            feats, rev, w, g, tm=128, wp=wp, correction_tiles=ct,
            interpret=True, flip=False)
        np.testing.assert_allclose(np.asarray(dfe), np.asarray(dfe_ref),
                                   rtol=1e-3, atol=1e-3)
        np.testing.assert_allclose(np.asarray(dw), np.asarray(dw_ref),
                                   rtol=1e-3, atol=1e-3)

    # and through the custom_vjp route (interpret kernels)
    prev_b, prev_i = sc.ONEHOT_BWD, sc.ONEHOT_INTERPRET
    sc.ONEHOT_BWD, sc.ONEHOT_INTERPRET = "revsym", True
    try:
        dfe, dw = jax.grad(
            lambda fe, we: jnp.sum(sc._onehot_conv(fe, idx, we) * g),
            argnums=(0, 1))(feats, w)
    finally:
        sc.ONEHOT_BWD, sc.ONEHOT_INTERPRET = prev_b, prev_i
    np.testing.assert_allclose(np.asarray(dfe), np.asarray(dfe_ref),
                               rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(dw), np.asarray(dw_ref),
                               rtol=1e-3, atol=1e-3)
