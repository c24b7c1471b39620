"""Windowed-DMA gather kernel vs XLA reference (interpret mode)."""
import numpy as np
import jax.numpy as jnp
import pytest

from srfdet3d_tpu.ops.pallas_window_gather import gather_matmul_windowed


def _near_sorted_idx(rng, m, k, v1, jitter=8, oow_every=0):
    """Monotone-ish indices like real subm rulebooks; optional sparse
    out-of-window outliers."""
    base = (np.arange(m)[:, None] * (v1 - 1) // max(m - 1, 1))
    idx = base + rng.integers(-jitter, jitter + 1, (m, k))
    idx = np.clip(idx, 0, v1 - 1)
    if oow_every:
        rows = np.arange(0, m, oow_every)
        idx[rows, 0] = rng.integers(0, v1, len(rows))   # wild entries
    return idx.astype(np.int32)


@pytest.mark.parametrize("oow_every", [0, 37])
def test_windowed_matches_xla(oow_every):
    rng = np.random.default_rng(0)
    m, k, cin, cout, v1 = 640, 9, 16, 16, 2048
    feats = rng.normal(size=(v1, cin)).astype(np.float32)
    feats[-1] = 0.0                                      # pad row
    idx = _near_sorted_idx(rng, m, k, v1, oow_every=oow_every)
    w = rng.normal(size=(k, cin, cout)).astype(np.float32)

    want = np.zeros((m, cout), np.float32)
    for j in range(k):
        want += feats[idx[:, j]] @ w[j]

    # window must cover a tile's index span (~v1/m * tm + jitter here)
    got = gather_matmul_windowed(
        jnp.asarray(feats), jnp.asarray(idx), jnp.asarray(w),
        tm=128, window=512, interpret=True)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4,
                               atol=1e-3)
