"""Windowed in-kernel key search: Pallas rulebook builder for sparse conv.

Replaces the dense cell-table rulebook (ops/sparse_conv.py LOOKUP_METHOD
"dense"): the table costs a full-grid write per stage (355 MB / ~64 ms at
nuScenes stage 0) plus a 3.24M-row int32 gather per lookup, and caps the
grid size at ~96M cells.  This kernel exploits the same monotonicity as the
one-hot gather kernel (ops/pallas_onehot.py): per kernel offset, query keys
are sorted keys plus a constant delta, so the matches of a tile of
consecutive outputs live in a contiguous window of the sorted key array.

The key array is laid out (R, 8, 256) — super-rows of 2048 int32 keys —
and each (tile, offset-group) window is TWO CONSECUTIVE SUPER-ROWS fetched
by the Pallas pipeline itself via scalar-prefetched index maps (manual
window DMAs hit Mosaic's slice-alignment proofs; pipelined blocks have
super-row granularity, satisfy the (8, 128)-divisibility rule, and
double-buffer for free).  Positions come from lane-wide equality compares
(sum of eq * lane index).

A query with no in-window match is a TRUE miss when its value lies within
the window's [first, last] key range (keys sorted); otherwise it is
flagged out-of-window and repaired by a tile-granular XLA searchsorted pass
(exact while <= correction_tiles tiles carry flags).

The reference's spconv builds this rulebook on the host in C++
(sparse_encoder_custom.py consumes it); here it is a compile-once on-device
program.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_SUB = 8           # sublanes per super-row
_LN = 256          # lanes per super-row
KW = _SUB * _LN    # keys per super-row (2048)


def _kernel(starts_ref, q_ref, *rest, groups, n_valid):
    """starts (T, G) window starts in super-rows (SMEM); q (TM, K) int32
    queries (< 0 = invalid); rest = 2*G key blocks (1, 8, 256) +
    idx/oow outputs (TM, K)."""
    t = pl.program_id(0)
    tm, k = q_ref.shape
    g_n = len(groups)
    wins = rest[:2 * g_n]
    idx_ref, oow_ref = rest[2 * g_n], rest[2 * g_n + 1]

    lane = jax.lax.broadcasted_iota(jnp.int32, (tm, _LN), 1)

    for g, offs in enumerate(groups):
        w0 = wins[2 * g]
        w1 = wins[2 * g + 1]
        base = starts_ref[t, g] * KW
        w_first = w0[0, 0, 0]
        w_last = w1[0, _SUB - 1, _LN - 1]
        for j in offs:
            q = q_ref[:, j][:, None]                   # (TM, 1)
            valid = q >= 0
            pos = jnp.zeros((tm, 1), jnp.int32)
            hit = jnp.zeros((tm, 1), jnp.bool_)
            for half, w in ((0, w0), (1, w1)):
                for r in range(_SUB):
                    row = w[0, r, :][None, :]          # (1, 256)
                    eq = (q == row) & valid
                    off = half * KW + r * _LN
                    pos = pos + jnp.sum(
                        jnp.where(eq, lane + off, 0),
                        axis=1, keepdims=True)
                    hit = hit | jnp.any(eq, axis=1, keepdims=True)
            idx_ref[:, j] = jnp.where(
                hit, base + pos, n_valid)[:, 0]
            oow = valid & ~hit & ((q < w_first) | (q > w_last))
            oow_ref[:, j] = oow[:, 0].astype(jnp.int32)


@functools.partial(
    jax.jit, static_argnames=("tm", "interpret", "correction_tiles",
                              "group_by_z"))
def rulebook_lookup(keys: jnp.ndarray,
                    queries: jnp.ndarray,
                    sentinel: int,
                    tm: int = 512,
                    interpret: bool = False,
                    correction_tiles: int = 16,
                    group_by_z: bool = True) -> jnp.ndarray:
    """Find each query key's row in a sorted key array.

    Args:
      keys: (N,) int32 ascending (invalid rows hold >= sentinel).
      queries: (M, K) int32; entries >= sentinel are invalid (miss).
      sentinel: first invalid key value (num_cells, or the flat-batched
        bound).
    Returns: (M, K) int32 rows into keys, with N as the miss row.
    """
    n = keys.shape[0]
    m, k = queries.shape

    if k % 3 == 0 and group_by_z:
        per = k // 3
        groups = tuple(tuple(range(g * per, (g + 1) * per))
                       for g in range(3))
    else:
        groups = tuple((j,) for j in range(k))
    g_n = len(groups)

    pad_m = (-m) % tm
    q = jnp.where(queries < sentinel, queries, -1).astype(jnp.int32)
    q = jnp.pad(q, ((0, pad_m), (0, 0)), constant_values=-1)
    mp = q.shape[0]
    n_tiles = mp // tm

    imax = jnp.iinfo(jnp.int32).max
    rows = -(-n // KW) + 2                   # window overrun slack
    keys_pad = jnp.pad(keys.astype(jnp.int32), (0, rows * KW - n),
                       constant_values=imax)
    keys3d = keys_pad.reshape(rows, _SUB, _LN)

    # coarse window starts: searchsorted of each (tile, group)'s min query
    tiles = q.reshape(n_tiles, tm, k)
    starts = []
    for offs in groups:
        sel = tiles[:, :, list(offs)]
        qmin = jnp.min(jnp.where(sel >= 0, sel, imax), axis=(1, 2))
        p = jnp.searchsorted(keys_pad[:n], qmin, method="sort")
        p = jnp.minimum(p // KW, max(rows - 2, 0))
        starts.append(p.astype(jnp.int32))
    starts = jnp.stack(starts, axis=1)       # (T, G) in super-rows

    win_specs = []
    for g in range(g_n):
        win_specs.append(pl.BlockSpec(
            (1, _SUB, _LN), functools.partial(
                lambda i, s, _g: (s[i, _g], 0, 0), _g=g),
            memory_space=pltpu.VMEM))
        win_specs.append(pl.BlockSpec(
            (1, _SUB, _LN), functools.partial(
                lambda i, s, _g: (s[i, _g] + 1, 0, 0), _g=g),
            memory_space=pltpu.VMEM))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((tm, k), lambda i, s: (i, 0),
                         memory_space=pltpu.VMEM),
        ] + win_specs,
        out_specs=(
            pl.BlockSpec((tm, k), lambda i, s: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tm, k), lambda i, s: (i, 0),
                         memory_space=pltpu.VMEM),
        ),
    )
    kernel = functools.partial(_kernel, groups=groups, n_valid=n)
    idx, oow = pl.pallas_call(
        kernel,
        out_shape=(jax.ShapeDtypeStruct((mp, k), jnp.int32),
                   jax.ShapeDtypeStruct((mp, k), jnp.int32)),
        grid_spec=grid_spec,
        interpret=interpret,
    )(starts, q, *([keys3d] * (2 * g_n)))

    # tile-granular correction: redo flagged tiles with a real searchsorted.
    # If more than `correction_tiles` tiles carry OOW queries, the top-k
    # repair would leave false misses — lax.cond into a full searchsorted
    # over every query on overflow (executed only then).
    cap_t = min(correction_tiles, n_tiles)
    counts = jnp.sum(oow.reshape(n_tiles, tm, k), axis=(1, 2))
    topv, sel = jax.lax.top_k(counts, cap_t)
    covered = jnp.sum(topv)
    total_oow = jnp.sum(counts)

    def _lookup(queries):
        p = jnp.minimum(jnp.searchsorted(keys_pad[:n],
                                         jnp.where(queries >= 0, queries, 0),
                                         method="sort"), n - 1)
        found = (keys_pad[p] == queries) & (queries >= 0)
        return jnp.where(found, p, n).astype(jnp.int32)

    def _tile_correction(idx):
        fixed = _lookup(tiles[sel].reshape(-1)).reshape(cap_t, tm, k)
        rows_ix = (sel[:, None] * tm +
                   jnp.arange(tm, dtype=jnp.int32)[None, :]).reshape(-1)
        return idx.at[rows_ix].set(fixed.reshape(cap_t * tm, k),
                                   mode="drop")

    def _full_correction(idx):
        return _lookup(q.reshape(-1)).reshape(mp, k)

    idx = jax.lax.cond(covered == total_oow,
                       _tile_correction, _full_correction, idx)
    return idx[:m]
