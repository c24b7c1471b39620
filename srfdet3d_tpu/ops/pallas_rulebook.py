"""Windowed in-kernel key search: Pallas rulebook builder for sparse conv.

Replaces the dense cell-table rulebook (ops/sparse_conv.py LOOKUP_METHOD
"dense"): the table costs a full-grid write per stage (355 MB / ~64 ms at
nuScenes stage 0) plus a 3.24M-row int32 gather per lookup, and caps the
grid size at ~96M cells.  This kernel exploits the same monotonicity as the
one-hot gather kernel (ops/pallas_onehot.py): per kernel offset, query keys
are sorted keys plus a constant delta, so the matches of a tile of
consecutive outputs live in a contiguous window of the sorted key array.

The key array is laid out (R, 2048) — 2048 int32 lanes per row — and each
(tile, offset-group) window is TWO rows (4096 keys: one row of snap
granularity plus one of coverage).  Positions come from lane-wide equality
compares (sum of eq * lane index); v1's (wk, 128) layout issued 16x more,
smaller VPU ops and measured slower than the dense table.

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

KW = 2048          # keys per HBM row (lanes)
WROWS = 2          # rows per window


def _kernel(starts_ref, q_ref, keys_hbm, idx_ref, oow_ref, win, sems,
            *, groups, n_valid):
    """starts (T, G) window starts in KW-key rows (SMEM); q (TM, K) int32
    queries (< 0 = invalid); keys (R, KW) int32; idx out (TM, K)
    (n_valid = miss); oow out (TM, K) int32; win (G, WROWS, KW) scratch."""
    t = pl.program_id(0)
    tm, k = q_ref.shape

    for g in range(len(groups)):
        pltpu.make_async_copy(
            keys_hbm.at[pl.ds(starts_ref[t, g], WROWS), :],
            win.at[g],
            sems.at[g],
        ).start()

    lane = jax.lax.broadcasted_iota(jnp.int32, (tm, KW), 1)

    for g, offs in enumerate(groups):
        pltpu.make_async_copy(
            keys_hbm.at[pl.ds(starts_ref[t, g], WROWS), :],
            win.at[g],
            sems.at[g],
        ).wait()
        base = starts_ref[t, g] * KW
        w_first = win[g, 0, 0]
        w_last = win[g, WROWS - 1, KW - 1]
        for j in offs:
            q = q_ref[:, j][:, None]                   # (TM, 1)
            valid = q >= 0
            pos = jnp.zeros((tm, 1), jnp.int32)
            hit = jnp.zeros((tm, 1), jnp.bool_)
            for r in range(WROWS):
                eq = (q == win[g, r, :][None, :])      # (TM, KW)
                pos = pos + jnp.sum(
                    jnp.where(eq, lane + r * KW, 0),
                    axis=1, keepdims=True)
                hit = hit | jnp.any(eq, axis=1, keepdims=True)
            idx_ref[:, j] = jnp.where(
                hit & valid, base + pos, n_valid)[:, 0]
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

    pad_m = (-m) % tm
    q = jnp.where(queries < sentinel, queries, -1).astype(jnp.int32)
    q = jnp.pad(q, ((0, pad_m), (0, 0)), constant_values=-1)
    mp = q.shape[0]
    n_tiles = mp // tm

    imax = jnp.iinfo(jnp.int32).max
    rows = -(-n // KW) + WROWS               # window overrun slack
    keys_pad = jnp.pad(keys.astype(jnp.int32), (0, rows * KW - n),
                       constant_values=imax)
    keys2d = keys_pad.reshape(rows, KW)

    # coarse window starts: searchsorted of each (tile, group)'s min query
    tiles = q.reshape(n_tiles, tm, k)
    starts = []
    for offs in groups:
        sel = tiles[:, :, list(offs)]
        qmin = jnp.min(jnp.where(sel >= 0, sel, imax), axis=(1, 2))
        p = jnp.searchsorted(keys_pad[:n], qmin, method="sort")
        p = jnp.minimum(p // KW, max(rows - WROWS, 0))
        starts.append(p.astype(jnp.int32))
    starts = jnp.stack(starts, axis=1)       # (T, G) in KW-key rows

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((tm, k), lambda i, s: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=(
            pl.BlockSpec((tm, k), lambda i, s: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tm, k), lambda i, s: (i, 0),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((len(groups), WROWS, KW), jnp.int32),
            pltpu.SemaphoreType.DMA((len(groups),)),
        ],
    )
    kernel = functools.partial(_kernel, groups=groups, n_valid=n)
    idx, oow = pl.pallas_call(
        kernel,
        out_shape=(jax.ShapeDtypeStruct((mp, k), jnp.int32),
                   jax.ShapeDtypeStruct((mp, k), jnp.int32)),
        grid_spec=grid_spec,
        interpret=interpret,
    )(starts, q, keys2d)

    # tile-granular correction: redo flagged tiles with a real searchsorted
    cap_t = min(correction_tiles, n_tiles)
    counts = jnp.sum(oow.reshape(n_tiles, tm, k), axis=(1, 2))
    _, sel = jax.lax.top_k(counts, cap_t)
    sel_q = tiles[sel].reshape(-1)                       # (cap_t*tm*K,)
    p = jnp.minimum(jnp.searchsorted(keys_pad[:n],
                                     jnp.where(sel_q >= 0, sel_q, 0),
                                     method="sort"), n - 1)
    found = (keys_pad[p] == sel_q) & (sel_q >= 0)
    fixed = jnp.where(found, p, n).astype(jnp.int32).reshape(cap_t, tm, k)
    rows_ix = (sel[:, None] * tm +
               jnp.arange(tm, dtype=jnp.int32)[None, :]).reshape(-1)
    idx = idx.at[rows_ix].set(fixed.reshape(cap_t * tm, k), mode="drop")
    return idx[:m]
