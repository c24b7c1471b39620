"""Packed one-hot windowed gather kernel vs the XLA gather reference."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from srfdet3d_tpu.ops.pallas_onehot import (
    gather_matmul_onehot, onehot_miss_count)


def _xla_ref(features, gather_idx, weights):
    n, cin = features.shape
    m, k = gather_idx.shape
    cout = weights.shape[2]
    feats0 = jnp.concatenate(
        [features, jnp.zeros((1, cin), features.dtype)], axis=0)
    g = feats0[gather_idx]                                # (M, K, Cin)
    out = jnp.dot(g.reshape(m, k * cin),
                  weights.astype(features.dtype).reshape(k * cin, cout),
                  preferred_element_type=jnp.float32)
    return out.astype(features.dtype)


def _near_monotone_idx(rng, m, k, n, spread=64, miss_frac=0.15):
    """Indices that mimic sparse-conv rulebooks: per offset monotone with a
    local spread, plus rulebook misses (== n)."""
    base = np.sort(rng.integers(0, n, size=(m,)))
    idx = np.zeros((m, k), np.int32)
    for j in range(k):
        jitter = rng.integers(-spread, spread + 1, size=(m,))
        idx[:, j] = np.clip(base + jitter, 0, n - 1)
    miss = rng.random((m, k)) < miss_frac
    idx[miss] = n
    return jnp.asarray(idx)


def _pack(cin):
    cin_pad = 1
    while cin_pad < cin or 128 % cin_pad:
        cin_pad *= 2
    return 128 // min(cin_pad, 128)


@pytest.mark.parametrize("cin,cout,k", [(5, 16, 27), (16, 16, 27),
                                        (64, 128, 3), (128, 128, 27)])
def test_matches_xla(cin, cout, k):
    rng = np.random.default_rng(0)
    n, m = 2048, 1024
    feats = jnp.asarray(rng.normal(size=(n, cin)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(k, cin, cout)).astype(np.float32))
    idx = _near_monotone_idx(rng, m, k, n)
    ref = _xla_ref(feats, idx, w)
    # wp is in PACKED rows; cover ~1024 table rows regardless of pack
    wp = max(16, 1024 // _pack(cin))
    out = gather_matmul_onehot(feats, idx, w, tm=256, wp=wp,
                               interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-4)


def test_random_indices_exact_via_correction():
    """Fully random (non-monotone) indices: everything lands in the
    correction pass; result must still be exact."""
    rng = np.random.default_rng(1)
    n, m, k, cin, cout = 1024, 512, 9, 16, 32
    feats = jnp.asarray(rng.normal(size=(n, cin)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(k, cin, cout)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, n + 1, size=(m, k)).astype(np.int32))
    ref = _xla_ref(feats, idx, w)
    out = gather_matmul_onehot(feats, idx, w, tm=256, wp=16,
                               correction_tiles=4096, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-4)


def test_bf16():
    rng = np.random.default_rng(2)
    n, m, k, cin, cout = 2048, 512, 27, 32, 64
    feats = jnp.asarray(rng.normal(size=(n, cin))).astype(jnp.bfloat16)
    w = jnp.asarray(rng.normal(size=(k, cin, cout)).astype(np.float32))
    idx = _near_monotone_idx(rng, m, k, n)
    ref = _xla_ref(feats, idx, w)
    out = gather_matmul_onehot(feats, idx, w, tm=256,
                               wp=1024 // _pack(cin), interpret=True)
    # bf16 accumulation-order noise: contraction is 864 bf16 products, so
    # absolute deviations ~0.5 on outputs of magnitude ~30 are expected
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32),
        rtol=2e-2, atol=1.0)


def test_all_miss():
    rng = np.random.default_rng(3)
    n, m, k, cin, cout = 256, 256, 27, 16, 16
    feats = jnp.asarray(rng.normal(size=(n, cin)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(k, cin, cout)).astype(np.float32))
    idx = jnp.full((m, k), n, jnp.int32)
    out = gather_matmul_onehot(feats, idx, w, tm=256, wp=16,
                               interpret=True)
    np.testing.assert_array_equal(np.asarray(out), 0.0)


def test_miss_count_diagnostic():
    rng = np.random.default_rng(4)
    n, m, k = 2048, 1024, 27
    idx = _near_monotone_idx(rng, m, k, n, spread=32)
    cnt = onehot_miss_count(idx, n, pack=8, tm=256, wp=64)
    assert int(cnt) >= 0
    # wide window -> few misses
    cnt_wide = onehot_miss_count(idx, n, pack=8, tm=256, wp=2048 // 8 + 64)
    assert int(cnt_wide) <= int(cnt)


def test_onehot_vjp_backward_matches_xla_autodiff():
    """The custom-VJP backward (pure XLA) must equal autodiff of the
    reference gather+matmul for both dfeatures and dweights."""
    from srfdet3d_tpu.ops.sparse_conv import _onehot_conv_bwd
    rng = np.random.default_rng(5)
    n, m, k, cin, cout = 256, 128, 27, 16, 32
    feats = jnp.asarray(rng.normal(size=(n, cin)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(k, cin, cout)).astype(np.float32))
    idx = _near_monotone_idx(rng, m, k, n)
    g = jnp.asarray(rng.normal(size=(m, cout)).astype(np.float32))

    def ref(fe, we):
        return jnp.sum(_xla_ref(fe, idx, we) * g)

    dfe_ref, dw_ref = jax.grad(ref, argnums=(0, 1))(feats, w)
    dfe, _, dw = _onehot_conv_bwd((feats, idx, w), g)
    np.testing.assert_allclose(np.asarray(dfe), np.asarray(dfe_ref),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(dw), np.asarray(dw_ref),
                               rtol=1e-4, atol=1e-4)


def test_overflow_falls_back_to_full_correction():
    """More OOW tiles than `correction_tiles`: the top-k tile repair
    cannot cover them all, so the kernel must lax.cond into the exact
    full-range correction (ADVICE r1 medium finding)."""
    rng = np.random.default_rng(3)
    n, m, k, cin, cout = 1024, 1024, 9, 16, 32
    feats = jnp.asarray(rng.normal(size=(n, cin)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(k, cin, cout)).astype(np.float32))
    # fully random indices with a tiny window => every tile carries OOW
    # entries; cap the repair at ONE tile (4 tiles at tm=256)
    idx = jnp.asarray(rng.integers(0, n + 1, size=(m, k)).astype(np.int32))
    ref = _xla_ref(feats, idx, w)
    out = gather_matmul_onehot(feats, idx, w, tm=256, wp=16,
                               correction_tiles=1, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-4)
