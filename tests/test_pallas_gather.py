"""Pallas gather+matmul kernel vs the XLA reference (interpret mode)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from srfdet3d_tpu.ops.pallas_gather import (fits_vmem,
                                            gathered_conv_apply_pallas)
from srfdet3d_tpu.ops.sparse_conv import gathered_conv_apply_batched


@pytest.mark.parametrize("b,v,m,k,cin,cout", [
    (1, 500, 500, 27, 16, 16),
    (2, 300, 200, 27, 32, 32),
    (1, 100, 128, 3, 128, 128),
])
def test_pallas_matches_xla(b, v, m, k, cin, cout):
    rng = np.random.default_rng(0)
    feats = jnp.asarray(rng.normal(size=(b, v, cin)).astype(np.float32))
    gidx = jnp.asarray(rng.integers(0, b * v + 1,
                                    (b, m, k)).astype(np.int32))
    w = jnp.asarray(rng.normal(size=(k, cin, cout)).astype(np.float32))

    want = gathered_conv_apply_batched(feats, gidx, w)
    got = gathered_conv_apply_pallas(feats, gidx, w, interpret=True)
    assert got is not None
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


def test_vmem_budget_fallback():
    # a table too big for VMEM returns None (caller uses XLA path)
    assert fits_vmem(120001, 16, 16, 27)
    assert not fits_vmem(2_000_000, 64, 64, 27)
    rng = np.random.default_rng(1)
    feats = jnp.asarray(rng.normal(size=(1, 2_000_000, 4)))
    # don't actually run; just the budget check via wrapper shape logic
    from srfdet3d_tpu.ops import pallas_gather as pg
    assert not pg.fits_vmem(2_000_001, 64, 64, 27)
