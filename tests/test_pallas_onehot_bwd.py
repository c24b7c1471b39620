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
