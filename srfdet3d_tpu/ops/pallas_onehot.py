"""Packed one-hot windowed gather+matmul Pallas kernel for sparse conv.

Third-generation TPU kernel for the sparse-conv gather wall (PERF.md):
the XLA row-gather runs at ~30 GB/s effective; Mosaic's `tpu.dynamic_gather`
cannot lower VMEM shuffles (the two earlier kernel generations died on
that — see PERF.md "Pallas gather kernel" history).  This kernel removes
dynamic gathers entirely:

  1. **Windows**: for one kernel offset, the input rows matched by a tile of
     consecutive output rows are monotone non-decreasing (query keys are
     sorted keys + a constant delta), so most fall in a contiguous window of
     the feature table.  Each (tile, offset-group) DMAs ONE contiguous
     window — large blocks ride full HBM bandwidth.
  2. **Packing**: the table is viewed as (N/pack, pack*Cin) with
     pack = 128 // Cin, so a VMEM window is lane-dense (a (W, 16) f32 window
     would pad 8x to the 128-lane width).
  3. **One-hot matmul**: gathering row r from the window becomes
     `onehot(r // pack) @ window` on the MXU — a (TM, Wp) x (Wp, 128)
     matmul — followed by a lane-group mask selecting slot `r % pack` and a
     matmul with the pack-times-tiled weights.  One-hot rows of a miss are
     all-zero, so rulebook misses cost nothing.

Rows that fall outside their window are repaired by a compacted XLA
correction pass (cumsum scatter, no sort).

Replaces the gather in spconv-equivalent convs (reference
sparse_encoder_custom.py:74-107 consumes spconv's CUDA gather-GEMM-scatter).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128


def _split3(x):
    """f32 -> three bf16 terms whose sum reconstructs x to ~0.5 ulp."""
    hi = x.astype(jnp.bfloat16)
    r1 = x - hi.astype(jnp.float32)
    mid = r1.astype(jnp.bfloat16)
    lo = (r1 - mid.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, mid, lo


def _dot_onehot_f32(oh_b, x, dims=None):
    """one_hot @ x with f32-faithful products: the one-hot side is exact in
    bf16 and the f32 side splits into three bf16 terms — 3 single-pass
    matmuls.  Beats Precision.HIGHEST (6-pass), which Mosaic expands with
    stack temporaries that can blow the 16 MB scoped-VMEM limit at stage
    scale (measured 21.24M at the down0 backward); Precision.HIGH (3-pass)
    does not lower at all."""
    if dims is None:
        dims = (((1,), (0,)), ((), ()))
    oh = oh_b.astype(jnp.bfloat16)
    x_hi, x_mid, x_lo = _split3(x)
    d = functools.partial(jax.lax.dot_general, dimension_numbers=dims,
                          preferred_element_type=jnp.float32)
    return d(oh, x_hi) + d(oh, x_mid) + d(oh, x_lo)


def _kernel(starts_ref, plidx_ref, sub_ref, feats_hbm, wt_ref, out_ref,
            win_scratch, acc_ref, sems, *, groups, pack, cin_pad, wp):
    """One grid step = one output tile.

    starts (T, G) packed-row window starts (scalar-prefetched, SMEM);
    plidx (TM, K) window-relative PACKED row (-1 = miss/out-of-window);
    sub (TM, K) sub-slot in [0, pack); feats (Np, pack*Cin) HBM packed table;
    wt (G, per*pack*Cin, Cout) group-stacked pack-tiled weights (per =
    offsets per group); out (TM, Cout);
    win_scratch (G, Wp, pack*Cin); acc (TM, Cout) f32; sems (G,) DMA.
    groups: tuple of tuples — offset ids per window group.

    Per group ALL offsets' one-hot rows are stacked into one
    (per*TM, Wp) x (Wp, 128) MXU matmul, and the weight stage is one
    (TM, per*128) x (per*128, Cout) matmul — 27 small matmuls starve the
    MXU (measured 44.7 ms vs 29.3 XLA at stage 1 before this batching).
    """
    t = pl.program_id(0)
    tm, k = plidx_ref.shape
    cout = out_ref.shape[-1]
    lanes = pack * cin_pad
    # starts are host-snapped to the sublane tile; multiple_of lets Mosaic
    # prove slice alignment (bf16 tables otherwise fail to lower)
    snap = 8 if win_scratch.dtype == jnp.float32 else 16

    for g in range(len(groups)):
        pltpu.make_async_copy(
            feats_hbm.at[pl.ds(pl.multiple_of(starts_ref[t, g], snap), wp), :],
            win_scratch.at[g],
            sems.at[g],
        ).start()

    acc_ref[:] = jnp.zeros((tm, cout), jnp.float32)
    lane_group = jax.lax.broadcasted_iota(
        jnp.int32, (tm, lanes), 1) // cin_pad
    row_iota = jax.lax.broadcasted_iota(jnp.int32, (tm, wp), 1)

    for g, offs in enumerate(groups):
        pltpu.make_async_copy(
            feats_hbm.at[pl.ds(pl.multiple_of(starts_ref[t, g], snap), wp), :],
            win_scratch.at[g],
            sems.at[g],
        ).wait()
        window = win_scratch[g]                       # (Wp, pack*Cin)
        oh_b = jnp.concatenate(
            [(plidx_ref[:, j][:, None] == row_iota) for j in offs],
            axis=0)                                   # (per*TM, Wp) bool
        if window.dtype == jnp.float32:
            r = _dot_onehot_f32(oh_b, window)
        else:
            oh = oh_b.astype(window.dtype)
            r = jnp.dot(oh, window,
                        preferred_element_type=jnp.float32)
        parts = []
        for gi, j in enumerate(offs):
            if pack == 1:
                # one slot per packed row: sub == 0 == lane_group
                # everywhere, the select is an identity mask — skip its
                # compare+where VPU passes (the kernel is VPU-pass
                # bound; pack==1 covers every Cin>=128 conv)
                parts.append(r[gi * tm:(gi + 1) * tm]
                             .astype(window.dtype))
            else:
                sel = (sub_ref[:, j][:, None] == lane_group)
                parts.append(jnp.where(sel, r[gi * tm:(gi + 1) * tm], 0.0)
                             .astype(window.dtype))
        rl = jnp.concatenate(parts, axis=1)           # (TM, per*lanes)
        acc_ref[:] += jnp.dot(rl, wt_ref[g],
                              preferred_element_type=jnp.float32)
    out_ref[:] = acc_ref[:].astype(out_ref.dtype)


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _default_groups(k: int, mode: str = "zy"):
    """Window groups over the z-major (dz, dy, dx) offset enumeration.

    mode "zy": group by (dz, dy) — consecutive triples that differ only in
    dx.  A group's gather keys are then (tile keys + const ± 1), so its
    window span is the tile's own table extent plus a 2-row dx slack,
    INDEPENDENT of scene density.  The older "z" grouping (3 groups of 9)
    spanned the dy=±1 neighbor distance ≈ active-sites-per-xy-row, which at
    stage-1+ densities exceeds any affordable window and silently fired the
    full XLA correction on every deep conv (tools/probe_oow_encoder.py).
    mode "z": 3 groups of 9 (fewer, larger MXU matmuls; only exact for
    stage-0 densities).  mode "none": one group per offset."""
    if mode != "none" and k % 3 == 0:
        if mode == "zy":
            per = 3 if k % 9 == 0 else 1
        else:
            per = k // 3
        return tuple(tuple(range(g * per, (g + 1) * per))
                     for g in range(k // per))
    return tuple((j,) for j in range(k))


def _snap_of(dtype) -> int:
    """Sublane tile of the packed table: window starts snap to it so
    Mosaic can prove DMA slice alignment (bf16 otherwise fails to lower)."""
    return 8 if dtype == jnp.float32 else 16


def _padded_rows(n: int, pack: int, snap: int, wp: int) -> int:
    """Table rows after padding: one miss row, sublane-aligned packed
    windows, plus one full window of DMA overrun slack."""
    return _round_up(n + 1, pack * snap) + wp * pack


def _window_layout(idx, n: int, pack: int, snap: int, wp: int,
                   np_rows: int, tm: int, groups):
    """Per-(tile, group) window starts + window-relative packed rows.

    ONE definition shared by the forward kernel, the backward kernel and
    the onehot_miss_count diagnostic — the layouts must agree exactly or
    the diagnostic mis-sizes wp/correction_tiles and the backward
    desynchronizes from the forward.

    idx (Mp, K) int32 in [0, n] (n = miss), Mp a multiple of tm.
    Returns (starts (T, G) int32, plidx (T*tm, ...) view as (Mp, K) via
    caller reshape -> here (T, tm, K) int32 window-relative packed row
    (-1 = miss/out-of-window), sub (Mp, K), miss (T, tm, K),
    in_win (T, tm, K))."""
    mp, k = idx.shape
    n_tiles = mp // tm
    pidx = idx // pack
    sub = (idx % pack).astype(jnp.int32)
    tiles = pidx.reshape(n_tiles, tm, k)
    max_start = max(np_rows // pack - wp, 0)
    starts = []
    rel_parts = []
    for offs in groups:
        sel = tiles[:, :, list(offs)]                    # (T, TM, |g|)
        # pidx <= n // pack by construction (idx <= n), so misses need no
        # masking here: they only ever raise the min to n // pack
        s = jnp.min(sel, axis=(1, 2))
        s = jnp.minimum((s // snap) * snap, max_start)   # (T,)
        starts.append(s)
        rel_parts.append(sel - s[:, None, None])
    starts = jnp.stack(starts, axis=1).astype(jnp.int32)  # (T, G)
    rel = jnp.concatenate(rel_parts, axis=2)             # group-ordered
    # restore original offset order: rel[..., j] must describe offset j
    order = [j for g in groups for j in g]
    perm = jnp.zeros((k,), jnp.int32).at[jnp.array(order)].set(
        jnp.arange(k, dtype=jnp.int32))
    rel = jnp.take(rel, perm, axis=2)
    miss = idx.reshape(n_tiles, tm, k) >= n              # rulebook miss
    in_win = (rel >= 0) & (rel < wp) & ~miss
    plidx = jnp.where(in_win, rel, -1).astype(jnp.int32)
    return starts, plidx, sub, miss, in_win


@functools.partial(
    jax.jit, static_argnames=("tm", "wp", "interpret", "correct",
                              "correction_tiles", "group_mode"))
def gather_matmul_onehot(features: jnp.ndarray,
                         gather_idx: jnp.ndarray,
                         weights: jnp.ndarray,
                         tm: int = 512,
                         wp: int = 256,
                         interpret: bool = False,
                         correct: bool = True,
                         correction_tiles: int = 16,
                         group_mode: str = "zy") -> jnp.ndarray:
    """Windowed one-hot gather + conv matmul.

    Args:
      features: (N, Cin) flat table; index N (== miss) reads zeros.
      gather_idx: (M, K) int32 in [0, N].
      weights: (K, Cin, Cout).
      tm: output tile rows.
      wp: window size in PACKED rows (each packed row = 128 // Cin_pad
        table rows).
      correct: repair out-of-window rows with a TILE-granular XLA pass:
        the `correction_tiles` tiles with the most out-of-window entries
        are re-gathered directly (exact while no more than that many tiles
        contain any out-of-window entry; rulebook indices are per-offset
        monotone, so on real scenes almost no tile does).
    Returns: (M, Cout) in features.dtype.
    """
    n, cin = features.shape
    m, k = gather_idx.shape
    cout = weights.shape[2]
    dtype = features.dtype
    if cin > LANE:
        raise ValueError(
            f"gather_matmul_onehot supports Cin <= {LANE} (one lane tile); "
            f"got Cin={cin}. Callers gate on sparse_conv.ONEHOT_MAX_CIN.")

    # pad Cin to a divisor of 128 and pick the pack factor
    cin_pad = 1
    while cin_pad < cin or LANE % cin_pad:
        cin_pad *= 2
    pack = LANE // cin_pad

    snap = _snap_of(dtype)

    feats = features
    if cin_pad != cin:
        feats = jnp.pad(feats, ((0, 0), (0, cin_pad - cin)))
    np_rows = _padded_rows(n, pack, snap, wp)
    feats = jnp.pad(feats, ((0, np_rows - n), (0, 0)))
    packed = feats.reshape(np_rows // pack, pack * cin_pad)

    groups = _default_groups(k, group_mode)
    per = len(groups[0])

    w_pad = weights.astype(dtype)
    if cin_pad != cin:
        w_pad = jnp.pad(w_pad, ((0, 0), (0, cin_pad - cin), (0, 0)))
    # tile weights over the pack axis and stack each group's offsets along
    # the contraction axis: (G, per*pack*Cin_pad, Cout)
    wt = jnp.tile(w_pad, (1, pack, 1))
    wt = jnp.stack(
        [jnp.concatenate([wt[j] for j in offs], axis=0) for offs in groups])

    pad_m = (-m) % tm
    idx = jnp.pad(gather_idx, ((0, pad_m), (0, 0)), constant_values=n)
    mp = idx.shape[0]
    n_tiles = mp // tm

    starts, plidx, sub, miss, in_win = _window_layout(
        idx, n, pack, snap, wp, np_rows, tm, groups)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((tm, k), lambda i, s: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tm, k), lambda i, s: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),           # packed table, HBM
            pl.BlockSpec((len(groups), per * pack * cin_pad, cout),
                         lambda i, s: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tm, cout), lambda i, s: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((len(groups), wp, pack * cin_pad), dtype),
            pltpu.VMEM((tm, cout), jnp.float32),
            pltpu.SemaphoreType.DMA((len(groups),)),
        ],
    )
    kernel = functools.partial(_kernel, groups=groups, pack=pack,
                               cin_pad=cin_pad, wp=wp)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((mp, cout), dtype),
        grid_spec=grid_spec,
        interpret=interpret,
    )(starts, plidx.reshape(mp, k), sub.reshape(mp, k), packed, wt)

    if not correct:
        return out[:m]

    # ---- tile-granular correction: pick the tiles with the most
    # out-of-window entries and re-gather ONLY their flagged entries
    # directly (plain XLA row gather + one matmul + one contiguous-row
    # scatter-add).  No cumsum, no full-size scatter — the per-entry
    # compaction machinery cost more than the kernel itself.
    # If MORE than `correction_tiles` tiles carry OOW entries (data-
    # dependent: scene density / capacity / window settings), the top-k
    # repair would silently drop contributions — so lax.cond into an
    # exact full-range correction in that case (compiled always, executed
    # only on overflow; real flagship rulebooks have zero OOW tiles).
    oow = ~in_win & ~miss                                    # (T, TM, K)
    cap_t = min(correction_tiles, n_tiles)
    counts = jnp.sum(oow, axis=(1, 2))                       # (T,)
    topv, sel = jax.lax.top_k(counts, cap_t)                 # (cap_t,)
    covered = jnp.sum(topv)
    total_oow = jnp.sum(counts)
    feats0 = jnp.concatenate(
        [features, jnp.zeros((1, cin), dtype)], axis=0)
    w2d = weights.astype(dtype).reshape(k * cin, cout)

    def _tile_correction(out):
        sel_idx = idx.reshape(n_tiles, tm, k)[sel]           # (cap_t, tm, K)
        sel_oow = oow[sel]
        g = feats0[jnp.where(sel_oow, sel_idx, n)]           # (cap_t,tm,K,Ci)
        part = jnp.dot(g.reshape(cap_t * tm, k * cin), w2d,
                       preferred_element_type=jnp.float32).astype(out.dtype)
        rows = (sel[:, None] * tm +
                jnp.arange(tm, dtype=jnp.int32)[None, :]).reshape(-1)
        return out.at[rows].add(part, mode="drop")

    def _full_correction(out):
        g = feats0[jnp.where(oow, idx.reshape(n_tiles, tm, k), n)
                   .reshape(mp, k)]                          # (Mp, K, Cin)
        part = jnp.dot(g.reshape(mp, k * cin), w2d,
                       preferred_element_type=jnp.float32).astype(out.dtype)
        return out + part

    out = jax.lax.cond(covered == total_oow,
                       _tile_correction, _full_correction, out)
    return out[:m]


@functools.partial(jax.jit,
                   static_argnames=("n", "pack", "tm", "wp", "group_mode",
                                    "snap"))
def onehot_miss_count(gather_idx: jnp.ndarray, n: int, pack: int,
                      tm: int = 512, wp: int = 256,
                      group_mode: str = "zy",
                      snap: int = 0,
                      dtype=jnp.float32) -> jnp.ndarray:
    """Count of out-of-window entries for the given layout — use to size
    `wp` / `correction_tiles` on representative data.

    Uses the SAME `_window_layout` as the kernels, so the count matches
    what they will actually repair.  snap derives from `dtype` via
    _snap_of (8 for f32, 16 otherwise) unless overridden — a fixed snap=8
    default silently undercounted for bf16 tables, mis-sizing wp."""
    snap = snap or _snap_of(jnp.dtype(dtype))
    m, k = gather_idx.shape
    pad_m = (-m) % tm
    idx = jnp.pad(gather_idx, ((0, pad_m), (0, 0)), constant_values=n)
    groups = _default_groups(k, group_mode)
    np_rows = _padded_rows(n, pack, snap, wp)
    _, _, _, miss, in_win = _window_layout(
        idx, n, pack, snap, wp, np_rows, tm, groups)
    return jnp.sum((~in_win & ~miss).astype(jnp.int32))
