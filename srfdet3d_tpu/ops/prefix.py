"""Prefix sums that lower well on TPU.

XLA's cumsum at millions of elements is slow on TPU (~15 ms for 3.24M
bools, ~5 ms at 1M — measured, PERF.md); an (L/512, 512) x (512, 512)
lower-triangular matmul computes exact within-row prefixes on the MXU
(0/1 counts <= 512 are exact even in bf16 passes) in ~1 ms, plus a tiny
cross-row base scan.
"""

from __future__ import annotations

import jax.numpy as jnp

_CHUNK = 512


def prefix_count(flags: jnp.ndarray) -> jnp.ndarray:
    """(L,) bool -> (L,) int32: (inclusive count of True up to i) - 1."""
    return prefix_sum(flags.astype(jnp.int32)) - 1


def prefix_sum(vals: jnp.ndarray) -> jnp.ndarray:
    """(L,) int32 -> (L,) int32 inclusive prefix sum on the MXU.

    Exact while the total stays below 2^24 (f32 integer range); callers
    here sum per-column voxel counts, bounded by the voxel capacity
    (<= a few hundred thousand)."""
    l = vals.shape[0]
    pad = (-l) % _CHUNK
    f = jnp.pad(vals.astype(jnp.float32), (0, pad)).reshape(-1, _CHUNK)
    tri = jnp.triu(jnp.ones((_CHUNK, _CHUNK), jnp.float32))
    within = jnp.dot(f, tri, preferred_element_type=jnp.float32)
    row_tot = within[:, -1]
    base = jnp.cumsum(row_tot) - row_tot
    return (within + base[:, None]).reshape(-1)[:l].astype(jnp.int32)
