"""Windowed in-kernel key-search rulebook vs searchsorted oracle."""

import jax.numpy as jnp
import numpy as np
import pytest

from srfdet3d_tpu.ops.pallas_rulebook import rulebook_lookup


def _oracle(keys, queries, sentinel):
    n = keys.shape[0]
    idx = np.minimum(np.searchsorted(keys, queries), n - 1)
    found = (keys[idx] == queries) & (queries < sentinel)
    return np.where(found, idx, n).astype(np.int32)


def _make_keys(rng, n_valid, cells, n_total):
    vals = np.sort(rng.choice(cells, size=n_valid, replace=False))
    keys = np.full(n_total, cells, np.int64)
    keys[:n_valid] = vals
    return keys.astype(np.int32)


@pytest.mark.parametrize(
    "k,group",
    [pytest.param(27, True, marks=pytest.mark.slow), (3, False)])
def test_matches_searchsorted(k, group):
    rng = np.random.default_rng(0)
    cells = 100_000
    keys = _make_keys(rng, 3000, cells, 3100)
    m = 768    # 6 tiles at tm=128 — small enough for interpret mode on CPU
    base = keys[np.sort(rng.integers(0, 3000, m))].astype(np.int64)
    deltas = rng.integers(-40, 40, size=(1, k))
    queries = base[:, None] + deltas            # near keys, many misses
    # sprinkle invalid queries (>= sentinel)
    inv = rng.random((m, k)) < 0.1
    queries[inv] = cells + 7
    queries = np.clip(queries, 0, cells + 7).astype(np.int32)
    ref = _oracle(keys, queries, cells)
    got = np.asarray(rulebook_lookup(
        jnp.asarray(keys), jnp.asarray(queries), cells,
        tm=128, group_by_z=group, correction_tiles=8,
        interpret=True))
    np.testing.assert_array_equal(got, ref)


def test_scattered_queries_corrected():
    """Random far-away queries: everything out-of-window; the tile
    correction pass must still produce the exact searchsorted answer."""
    rng = np.random.default_rng(1)
    cells = 50_000
    keys = _make_keys(rng, 2000, cells, 2048)
    m, k = 512, 9
    queries = rng.integers(0, cells, size=(m, k)).astype(np.int32)
    # make half of them actual hits
    hit_rows = rng.integers(0, 2000, size=(m, k))
    hit_mask = rng.random((m, k)) < 0.5
    queries[hit_mask] = keys[hit_rows[hit_mask]]
    ref = _oracle(keys, queries, cells)
    got = np.asarray(rulebook_lookup(
        jnp.asarray(keys), jnp.asarray(queries), cells,
        tm=128, correction_tiles=64, interpret=True))
    np.testing.assert_array_equal(got, ref)


def test_all_invalid():
    keys = jnp.asarray(np.arange(256, dtype=np.int32))
    queries = jnp.full((128, 3), 500, jnp.int32)
    got = np.asarray(rulebook_lookup(keys, queries, 500, tm=128,
                                     interpret=True))
    np.testing.assert_array_equal(got, 256)


def test_overflow_falls_back_to_full_searchsorted():
    """More OOW tiles than `correction_tiles` (ADVICE r1 medium): the
    lookup must lax.cond into a full searchsorted, not leave false
    misses in unrepaired tiles."""
    rng = np.random.default_rng(9)
    cells = 50_000
    keys = _make_keys(rng, 2000, cells, 2048)
    m, k = 1024, 9
    queries = rng.integers(0, cells, size=(m, k)).astype(np.int32)
    hit_rows = rng.integers(0, 2000, size=(m, k))
    hit_mask = rng.random((m, k)) < 0.5
    queries[hit_mask] = keys[hit_rows[hit_mask]]
    ref = _oracle(keys, queries, cells)
    got = np.asarray(rulebook_lookup(
        jnp.asarray(keys), jnp.asarray(queries), cells,
        tm=128, correction_tiles=1, interpret=True))
    np.testing.assert_array_equal(got, ref)
