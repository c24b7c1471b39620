"""Windowed equality-match rulebook kernel.

Replaces the XLA row-gather chain inside the bitmap rulebooks
(plan_neighbors9 -> packed-column gather -> per-row gather -> bit math;
12.2 ms of the flagship stage-0 subm rulebook, tools/bench_rb_parts.py)
with one Pallas kernel that never gathers:

  1. Rows (voxels / strided output sites) arrive PLAN-MAJOR, so for a
     fixed plan offset (dy, dx) the query keys of a tile of consecutive
     rows are sorted and span a bounded band of the (sorted) column-key
     array — the span tracks the tile's own column extent, independent of
     scene density (the zy-grouping insight from the conv kernel, PERF.md).
     Each (tile, dy) DMAs ONE contiguous window of the column tables.
  2. A neighbor lookup becomes an EQUALITY MATMUL: the (TM, 128) compare
     of query keys against a window chunk is an exact one-hot (column
     keys are unique), so `eq @ payload` on the MXU gathers the matched
     column's payload — no `tpu.dynamic_gather`, the Mosaic limitation
     that killed the generation-1/2 gather kernels (PERF.md).
  3. The payload is the column's z-occupancy BIT-EXPANDED to 64 bf16 0/1
     lanes plus its start row split into three bf16-exact bytes.  The
     per-voxel z rank (popcount of bits below z) is then a masked lane
     reduction on the VPU — no popcount op, no uint shifts in Mosaic.

Exactness: bf16 one-hot x {0/1 bits, bytes < 256} products are exact; the
f32 accumulator sums at most one nonzero product per lane.  Out-of-window
queries (a tile whose neighbor band exceeds the window) are detected on
the host side per tile and repaired by an exact fallback (the caller's
XLA path) under `lax.cond` — zero tiles fire at flagship shapes
(tools/probe_eqmatch.py walks real layouts).

Matches spconv rulebook semantics (reference consumes spconv's CUDA
rulebooks, mmdet3d_plugin sparse_encoder_custom.py:110-140) — offset
order z-major (dz, dy, dx), miss row = B*row_cap, capacity-dropped
neighbors miss.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128
# payload lanes: 64 bit lanes + 3 cstart bytes, padded to the 128-lane
# tile (Mosaic HBM->VMEM slices must be lane-aligned; 72 fails to lower)
_NBITS = 64
_PAYL = 128


def _eqmatch_kernel(starts_ref, rows_ref, kwin_hbm, ctab_hbm, out_ref,
                    kwin, cwin, sems, *, wc, w_in, h_in, row_cap,
                    n_batch, miss_row):
    """One grid step = one tile of TM query rows.

    starts (T, 3) window starts in COLUMN units (multiples of 128);
    rows (TM, 8) int32 lanes [ybase, xbase, zbase, rowbase, kbase, valid,
    0, 0]; kwin_hbm (Np/128, 128) int32 column keys; ctab_hbm (Np, PAYL)
    bf16 payload; out (TM, 27) int32.
    kwin scratch (3, wc/128, 128) int32; cwin (3, wc, PAYL) bf16.
    """
    t = pl.program_id(0)
    tm = rows_ref.shape[0]
    nchunk = wc // LANE

    for g in range(3):
        s = pl.multiple_of(starts_ref[t, g], LANE)
        pltpu.make_async_copy(
            kwin_hbm.at[pl.ds(s // LANE, nchunk), :], kwin.at[g],
            sems.at[g]).start()
        pltpu.make_async_copy(
            ctab_hbm.at[pl.ds(s, wc), :], cwin.at[g],
            sems.at[3 + g]).start()

    ybase = rows_ref[:, 0][:, None]
    xbase = rows_ref[:, 1][:, None]
    zbase = rows_ref[:, 2][:, None]
    rowbase = rows_ref[:, 3][:, None]
    kbase = rows_ref[:, 4][:, None]
    rvalid = rows_ref[:, 5][:, None] > 0

    lanes64 = jax.lax.broadcasted_iota(jnp.int32, (tm, _NBITS), 1)
    cols = []
    for g in range(3):
        s = pl.multiple_of(starts_ref[t, g], LANE)
        pltpu.make_async_copy(
            kwin_hbm.at[pl.ds(s // LANE, nchunk), :], kwin.at[g],
            sems.at[g]).wait()
        pltpu.make_async_copy(
            ctab_hbm.at[pl.ds(s, wc), :], cwin.at[g],
            sems.at[3 + g]).wait()
        yq = ybase + g
        for dx in range(3):
            xq = xbase + dx
            ok = (rvalid & (yq >= 0) & (yq < h_in) &
                  (xq >= 0) & (xq < w_in))
            q = kbase + yq * w_in + xq
            acc = jnp.zeros((tm, _PAYL), jnp.float32)
            for c in range(nchunk):
                eq = (q == kwin[g][c, :][None, :]) & ok    # (TM, 128)
                acc += jnp.dot(eq.astype(jnp.bfloat16),
                               cwin[g][c * LANE:(c + 1) * LANE, :],
                               preferred_element_type=jnp.float32)
            bits = acc[:, :_NBITS]                          # 0/1 exact
            cstart = (acc[:, _NBITS] + 256.0 * acc[:, _NBITS + 1] +
                      65536.0 * acc[:, _NBITS + 2])
            # z taps zbase + d, d in {0, 1, 2}
            zb = zbase  # (TM, 1)
            sel_lt = jnp.where(lanes64 < zb, bits, 0.0)
            rank0 = jnp.sum(sel_lt, axis=1, keepdims=True)
            b0 = jnp.sum(jnp.where(lanes64 == zb, bits, 0.0),
                         axis=1, keepdims=True)
            b1 = jnp.sum(jnp.where(lanes64 == zb + 1, bits, 0.0),
                         axis=1, keepdims=True)
            b2 = jnp.sum(jnp.where(lanes64 == zb + 2, bits, 0.0),
                         axis=1, keepdims=True)
            cs_i = cstart.astype(jnp.int32)[:, None]
            for d, (bd, rk) in enumerate((
                    (b0, rank0), (b1, rank0 + b0), (b2, rank0 + b0 + b1))):
                row = cs_i + rk.astype(jnp.int32)
                local = row - rowbase
                okd = (bd > 0.5) & (local >= 0) & (local < row_cap)
                cols.append((d * 9 + g * 3 + dx,
                             jnp.where(okd, row, miss_row)))
    cols.sort(key=lambda p: p[0])
    out_ref[:] = jnp.concatenate([c for _, c in cols], axis=1)


def build_column_tables(ckey_sorted: jnp.ndarray, cstart: jnp.ndarray,
                        lo: jnp.ndarray, hi: jnp.ndarray, wc: int):
    """Flat sorted column arrays -> (kwin (Np/128, 128) int32,
    ctab (Np, PAYL) bf16, np_rows).

    ckey_sorted (N,) int32 globally ascending (invalid = per-sample
    sentinel, see caller); cstart (N,) GLOBAL feature row of the column's
    first voxel; lo/hi (N,) uint32 z bits.  Payload rows of invalid
    columns must be zero (caller passes zeroed lo/hi/cstart there)."""
    n = ckey_sorted.shape[0]
    np_rows = max(-(-n // LANE) * LANE, wc)
    pad = np_rows - n
    big = jnp.int32(2**31 - 1)
    ckey_p = jnp.pad(ckey_sorted, (0, pad), constant_values=big)
    kwin = ckey_p.reshape(np_rows // LANE, LANE)

    l64 = jnp.arange(_NBITS, dtype=jnp.uint32)
    word = jnp.where(l64[None, :] < 32, lo[:, None],
                     hi[:, None])
    shift = jnp.where(l64 < 32, l64, l64 - 32)[None, :]
    bits = ((jnp.right_shift(word, shift) & jnp.uint32(1))
            .astype(jnp.bfloat16))                        # (N, 64)
    c0 = (cstart & 255).astype(jnp.bfloat16)
    c1 = ((cstart >> 8) & 255).astype(jnp.bfloat16)
    c2 = ((cstart >> 16) & 255).astype(jnp.bfloat16)
    ctab = jnp.concatenate(
        [bits, c0[:, None], c1[:, None], c2[:, None],
         jnp.zeros((n, _PAYL - _NBITS - 3), jnp.bfloat16)], axis=1)
    ctab = jnp.pad(ctab, ((0, pad), (0, 0)))
    return kwin, ctab, np_rows


def window_layout(kwin: jnp.ndarray, ybase: jnp.ndarray,
                  xbase: jnp.ndarray, kbase: jnp.ndarray,
                  rvalid: jnp.ndarray, *, w_in: int, h_in: int,
                  wc: int, tm: int):
    """Per-(tile, dy) window starts + out-of-window tile count.

    starts: searchsorted of each tile's min valid query key (first valid
    row, dx=0 — queries are plan-major sorted), snapped down to the
    128-lane chunk and clamped in-table.  oow counts (tile, dy) pairs
    whose max VALID query key exceeds the window's last key — the kernel
    would silently miss those matches, so the caller must take the exact
    fallback when oow > 0.  Shared by eqmatch_rulebook and the layout
    probe (tools/probe_eqmatch.py) so the diagnostic can never drift
    from the kernel."""
    m = ybase.shape[0]
    np_rows = kwin.shape[0] * LANE
    pad_m = (-m) % tm
    n_tiles = (m + pad_m) // tm

    def padm(a, cval=0):
        return jnp.pad(a, (0, pad_m), constant_values=cval)

    kflat = kwin.reshape(-1)
    qmin = jnp.where(rvalid, kbase + ybase * w_in + xbase,
                     jnp.int32(2**31 - 1))
    qmin = padm(qmin, 2**31 - 1).reshape(n_tiles, tm)
    starts = []
    ends = []
    for g in range(3):
        tq = jnp.min(qmin, axis=1) + g * w_in            # (T,)
        s = jnp.searchsorted(kflat, tq).astype(jnp.int32)
        s = jnp.minimum((s // LANE) * LANE,
                        jnp.int32(np_rows - wc))
        s = jnp.maximum(s, 0)
        starts.append(s)
        # last key covered by the window (padding keys are int32-max)
        ends.append(kflat[jnp.minimum(s + wc - 1, np_rows - 1)])
    starts = jnp.stack(starts, axis=1)                    # (T, 3)
    wend = jnp.stack(ends, axis=1)                        # (T, 3)

    # out-of-window detection: the max VALID query key per (tile, dy)
    # must not exceed the window's last key
    xpart = jnp.minimum(xbase + 2, w_in - 1)
    oow = jnp.zeros((), jnp.int32)
    for g in range(3):
        yg = ybase + g
        qg = jnp.where(rvalid & (yg >= 0) & (yg < h_in) & (xbase < w_in),
                       kbase + yg * w_in + xpart, jnp.int32(-2**31))
        tmax = jnp.max(padm(qg, -2**31).reshape(n_tiles, tm), axis=1)
        oow += jnp.sum((tmax > wend[:, g]).astype(jnp.int32))
    return starts, oow


@functools.partial(jax.jit, static_argnames=(
    "w_in", "h_in", "row_cap", "n_batch", "wc", "tm", "interpret"))
def eqmatch_rulebook(kwin: jnp.ndarray, ctab: jnp.ndarray,
                     ybase: jnp.ndarray, xbase: jnp.ndarray,
                     zbase: jnp.ndarray, rowbase: jnp.ndarray,
                     kbase: jnp.ndarray, rvalid: jnp.ndarray,
                     *, w_in: int, h_in: int, row_cap: int, n_batch: int,
                     wc: int = 1024, tm: int = 256,
                     interpret: bool = False):
    """27-tap rulebook rows by windowed equality matching.

    Query (row r, offset (dz, dy, dx)), dy/dx/dz in {0,1,2}: input cell
    (ybase+dy, xbase+dx, zbase+dz) of the plan grid (h_in, w_in); kbase
    carries the per-sample key offset b*(h_in*w_in + 1).  Returns
    (idx (M, 27) int32 global feature rows, oow_tiles ()) where oow_tiles
    counts tiles whose window failed to cover every valid query — the
    caller must fall back for exactness when nonzero (lax.cond).
    """
    m = ybase.shape[0]
    np_rows = ctab.shape[0]
    miss_row = n_batch * row_cap

    pad_m = (-m) % tm
    def padm(a, cval=0):
        return jnp.pad(a, (0, pad_m), constant_values=cval)
    rows = jnp.stack([
        padm(ybase, -10), padm(xbase, -10), padm(zbase), padm(rowbase),
        padm(kbase), padm(rvalid.astype(jnp.int32)),
        jnp.zeros(m + pad_m, jnp.int32), jnp.zeros(m + pad_m, jnp.int32)],
        axis=1)
    mp = m + pad_m
    n_tiles = mp // tm

    starts, oow = window_layout(kwin, ybase, xbase, kbase, rvalid,
                                w_in=w_in, h_in=h_in, wc=wc, tm=tm)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((tm, 8), lambda i, s: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((tm, 27), lambda i, s: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((3, wc // LANE, LANE), jnp.int32),
            pltpu.VMEM((3, wc, _PAYL), jnp.bfloat16),
            pltpu.SemaphoreType.DMA((6,)),
        ],
    )
    kernel = functools.partial(
        _eqmatch_kernel, wc=wc, w_in=w_in, h_in=h_in, row_cap=row_cap,
        n_batch=n_batch, miss_row=miss_row)
    idx = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((mp, 27), jnp.int32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(starts, rows, kwin, ctab)
    return idx[:m], oow
