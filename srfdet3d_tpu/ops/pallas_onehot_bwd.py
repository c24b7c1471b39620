"""Backward pass of the packed one-hot windowed gather (training hot path).

The forward (ops/pallas_onehot.py) is out[m] = sum_j feats[idx[m, j]] @ W_j;
its backward needs
  dfeats[r]  += sum_{m, j: idx[m, j] == r} (g[m] @ W_j^T)      (scatter-add)
  dW_j       += sum_m feats[idx[m, j]]^T g[m]                  (re-gather)
Both hit the same XLA walls as the forward gather (PERF.md: scatter-adds
dominate the 1478 ms flagship train step).  This kernel reuses the window
structure: per (tile, dz-group) the scatter-add becomes a TRANSPOSED
one-hot matmul into a window accumulator that is read-modify-written to
HBM (grid steps execute sequentially on the core, and every DMA is awaited
inside the step, so overlapping windows of consecutive tiles are safe),
and dW accumulates in VMEM scratch across all tiles via the same stacked
one-hot gather as the forward.

Rows out of window (zero on real rulebooks — tools/check_oow.py) are
repaired by the same tile-granular XLA pass as the forward.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_onehot import (LANE, _default_groups, _dot_onehot_f32,
                            _padded_rows, _snap_of, _window_layout)


def _bwd_kernel(starts_ref, plidx_ref, sub_ref, g_ref, feats_hbm, wt_ref,
                dfeats_in_hbm, dfeats_hbm, dw_ref, win, dwin, sems, wsem,
                *, groups, pack, cin_pad, wp):
    """One grid step = one output tile.

    starts (T, G); plidx/sub (TM, K); g (TM, Cout) upstream grad;
    feats (Np, pack*Cin) packed table (for dW); wt (G, per*lanes, Cout);
    dfeats_hbm (Np, pack*Cin) OUTPUT accumulator (aliased zeros input);
    dw out (G, per*lanes, Cout) f32 (accumulated across grid steps);
    win/dwin (Wp, lanes) scratch; sems (2,), wsem DMA semaphores.
    """
    t = pl.program_id(0)
    tm, k = plidx_ref.shape
    lanes = pack * cin_pad
    snap = 8 if win.dtype == jnp.float32 else 16

    @pl.when(t == 0)
    def _():
        dw_ref[:] = jnp.zeros_like(dw_ref)

    lane_group = jax.lax.broadcasted_iota(
        jnp.int32, (tm, lanes), 1) // cin_pad
    row_iota = jax.lax.broadcasted_iota(jnp.int32, (tm, wp), 1)
    g = g_ref[:]                                       # (TM, Cout)

    for gi, offs in enumerate(groups):
        start = pl.multiple_of(starts_ref[t, gi], snap)
        # features window (for dW) and current dfeats window (for RMW)
        pltpu.make_async_copy(
            feats_hbm.at[pl.ds(start, wp), :], win, sems.at[0]).start()
        pltpu.make_async_copy(
            dfeats_hbm.at[pl.ds(start, wp), :], dwin, sems.at[1]).start()

        oh_b = jnp.concatenate(
            [(plidx_ref[:, j][:, None] == row_iota) for j in offs],
            axis=0)                                    # (per*TM, Wp) bool

        # dWin: Y = g @ wt_g^T -> (TM, per*lanes); mask sub-slot; stack.
        # Product matmul at DEFAULT precision: the XLA fallback computes
        # the same g @ W^T contraction at DEFAULT (one bf16 pass on f32
        # operands on TPU — no global precision override in this repo), so
        # a split here would be slower without adding fallback parity.
        y = jax.lax.dot_general(
            g, wt_ref[gi], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)        # (TM, per*lanes)
        parts = []
        for pj, j in enumerate(offs):
            if pack == 1:
                # single slot: sub == 0 == lane_group everywhere — the
                # select is an identity mask; skip its VPU passes
                parts.append(y[:, pj * lanes:(pj + 1) * lanes])
            else:
                sel = (sub_ref[:, j][:, None] == lane_group)
                parts.append(jnp.where(
                    sel, y[:, pj * lanes:(pj + 1) * lanes], 0.0))
        # This matmul MOVES values (one-hot scatter-add of ystack rows into
        # the window): the XLA fallback accumulates these addends exactly
        # (scatter-add, not a matmul), so a Mosaic DEFAULT single bf16 pass
        # would truncate them.  bf16x3 split, like the forward's gather —
        # Precision.HIGHEST also works but its 6-pass expansion blew the
        # 16 MB scoped-VMEM limit at down0 scale (21.24M).
        tdims = (((0,), (0,)), ((), ()))
        if win.dtype == jnp.float32:
            ystack = jnp.concatenate(parts, axis=0)
            dwin_add = _dot_onehot_f32(oh_b, ystack, tdims)  # (Wp, lanes)
        else:
            ystack = jnp.concatenate(parts, axis=0).astype(win.dtype)
            dwin_add = jax.lax.dot_general(
                oh_b.astype(win.dtype), ystack, tdims,
                preferred_element_type=jnp.float32)          # (Wp, lanes)

        pltpu.make_async_copy(
            dfeats_hbm.at[pl.ds(start, wp), :], dwin, sems.at[1]).wait()
        dwin[:] = dwin[:] + dwin_add.astype(dwin.dtype)
        wb = pltpu.make_async_copy(
            dwin, dfeats_hbm.at[pl.ds(start, wp), :], wsem)
        wb.start()

        # dW: gathered rows = oh @ features-window; per-offset blocks give
        # dW_g[j] += rows_j^T @ g
        pltpu.make_async_copy(
            feats_hbm.at[pl.ds(start, wp), :], win, sems.at[0]).wait()
        # value-moving gather (exact row copies in the fallback): bf16x3
        if win.dtype == jnp.float32:
            rows = _dot_onehot_f32(oh_b, win[:])       # (per*TM, lanes)
        else:
            rows = jnp.dot(oh_b.astype(win.dtype), win[:],
                           preferred_element_type=jnp.float32)
        rparts = []
        for pj, j in enumerate(offs):
            if pack == 1:
                rparts.append(rows[pj * tm:(pj + 1) * tm])
            else:
                sel = (sub_ref[:, j][:, None] == lane_group)
                rparts.append(jnp.where(sel,
                                        rows[pj * tm:(pj + 1) * tm], 0.0))
        rl = jnp.concatenate(rparts, axis=1).astype(win.dtype)
        # product matmul: DEFAULT precision matches the XLA fallback, whose
        # own dW contraction runs the same single-bf16-pass f32 matmul
        dw_ref[gi] += jax.lax.dot_general(
            rl, g.astype(win.dtype), (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)        # (per*lanes, Cout)

        # the write-back must land before the next step reads an
        # overlapping window
        wb.wait()


@functools.partial(
    jax.jit, static_argnames=("tm", "wp", "interpret", "correction_tiles",
                              "group_mode"))
def gather_matmul_onehot_bwd(features: jnp.ndarray,
                             gather_idx: jnp.ndarray,
                             weights: jnp.ndarray,
                             grad_out: jnp.ndarray,
                             tm: int = 512,
                             wp: int = 128,
                             interpret: bool = False,
                             correction_tiles: int = 16,
                             group_mode: str = "zy"):
    """Backward of the windowed one-hot gather+matmul.

    Args:
      features: (N, Cin); gather_idx (M, K) in [0, N] (N = miss);
      weights (K, Cin, Cout); grad_out (M, Cout).
    Returns: (dfeatures (N, Cin) f32, dweights (K, Cin, Cout) f32).
    """
    n, cin = features.shape
    m, k = gather_idx.shape
    cout = weights.shape[2]
    dtype = features.dtype
    if cin > LANE:
        raise ValueError(
            f"gather_matmul_onehot_bwd supports Cin <= {LANE} (one lane "
            f"tile); got Cin={cin}. Callers gate on "
            f"sparse_conv.ONEHOT_MAX_CIN.")

    cin_pad = 1
    while cin_pad < cin or LANE % cin_pad:
        cin_pad *= 2
    pack = LANE // cin_pad
    lanes = pack * cin_pad
    snap = _snap_of(dtype)

    groups = _default_groups(k, group_mode)
    per = len(groups[0])

    feats = features
    if cin_pad != cin:
        feats = jnp.pad(feats, ((0, 0), (0, cin_pad - cin)))
    np_rows = _padded_rows(n, pack, snap, wp)
    feats = jnp.pad(feats, ((0, np_rows - n), (0, 0)))
    packed = feats.reshape(np_rows // pack, lanes)

    w_pad = weights.astype(dtype)
    if cin_pad != cin:
        w_pad = jnp.pad(w_pad, ((0, 0), (0, cin_pad - cin), (0, 0)))
    wt = jnp.tile(w_pad, (1, pack, 1))
    wt = jnp.stack(
        [jnp.concatenate([wt[j] for j in offs], axis=0) for offs in groups])

    pad_m = (-m) % tm
    idx = jnp.pad(gather_idx, ((0, pad_m), (0, 0)), constant_values=n)
    g_pad = jnp.pad(grad_out.astype(dtype), ((0, pad_m), (0, 0)))
    mp = idx.shape[0]
    n_tiles = mp // tm

    starts, plidx, sub, miss, in_win = _window_layout(
        idx, n, pack, snap, wp, np_rows, tm, groups)

    zeros_packed = jnp.zeros_like(packed)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((tm, k), lambda i, s: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tm, k), lambda i, s: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tm, cout), lambda i, s: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),           # packed table
            pl.BlockSpec((len(groups), per * lanes, cout),
                         lambda i, s: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),           # dfeats accumulator
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pl.ANY),           # dfeats (aliased)
            pl.BlockSpec((len(groups), per * lanes, cout),
                         lambda i, s: (0, 0, 0), memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((wp, lanes), dtype),
            pltpu.VMEM((wp, lanes), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    kernel = functools.partial(_bwd_kernel, groups=groups, pack=pack,
                               cin_pad=cin_pad, wp=wp)
    dpacked, dw_g = pl.pallas_call(
        kernel,
        out_shape=(jax.ShapeDtypeStruct((np_rows // pack, lanes),
                                        jnp.float32),
                   jax.ShapeDtypeStruct((len(groups), per * lanes, cout),
                                        jnp.float32)),
        grid_spec=grid_spec,
        input_output_aliases={6: 0},
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(starts, plidx.reshape(mp, k), sub.reshape(mp, k), g_pad, packed, wt,
      jnp.zeros((np_rows // pack, lanes), jnp.float32))

    dfeats = dpacked.reshape(np_rows, cin_pad)[:n, :cin]
    # ungroup + un-tile dW: (G, per, pack, cin_pad, cout) summed over pack
    dw_g = dw_g.reshape(len(groups), per, pack, cin_pad, cout)
    dw_g = jnp.sum(dw_g, axis=2)[:, :, :cin, :]
    dw = jnp.zeros((k, cin, cout), jnp.float32)
    flat_order = [j for gr in groups for j in gr]
    dw = dw.at[jnp.array(flat_order)].set(
        dw_g.reshape(k, cin, cout))

    # tile-granular correction for out-of-window entries.  Like the
    # forward, top-k tile repair silently drops contributions when more
    # than `correction_tiles` tiles carry OOW entries — lax.cond into an
    # exact full-range correction on overflow (executed only then).
    oow = ~in_win & ~miss
    cap_t = min(correction_tiles, n_tiles)
    counts = jnp.sum(oow, axis=(1, 2))
    topv, selt = jax.lax.top_k(counts, cap_t)
    covered = jnp.sum(topv)
    total_oow = jnp.sum(counts)
    feats0 = jnp.concatenate(
        [features.astype(jnp.float32), jnp.zeros((1, cin))], axis=0)
    dfeats = jnp.concatenate(
        [dfeats, jnp.zeros((1, cin), jnp.float32)], axis=0)

    def _corr(dfeats, dw, eff_idx, g_sel):
        # dfeats: scatter-add g @ W^T per flagged entry (miss -> row n,
        # trimmed by the caller); dW: gathered flagged rows x g
        gw = jnp.einsum("abd,kcd->abkc", g_sel.astype(jnp.float32),
                        weights.astype(jnp.float32))      # (.,tm,K,Cin)
        dfeats = dfeats.at[eff_idx.reshape(-1)].add(
            gw.reshape(-1, cin), mode="drop")
        rows = feats0[eff_idx]                            # (.,tm,K,Cin)
        dw = dw + jnp.einsum("abkc,abd->kcd", rows,
                             g_sel.astype(jnp.float32))
        return dfeats, dw

    def _tile_correction(args):
        dfeats, dw = args
        sel_idx = idx.reshape(n_tiles, tm, k)[selt]
        eff_idx = jnp.where(oow[selt], sel_idx, n)
        g_sel = g_pad.reshape(n_tiles, tm, cout)[selt]    # (cap, tm, Cout)
        return _corr(dfeats, dw, eff_idx, g_sel)

    def _full_correction(args):
        dfeats, dw = args
        eff_idx = jnp.where(oow, idx.reshape(n_tiles, tm, k), n)
        g_all = g_pad.reshape(n_tiles, tm, cout)
        return _corr(dfeats, dw, eff_idx, g_all)

    dfeats, dw = jax.lax.cond(covered == total_oow,
                              _tile_correction, _full_correction,
                              (dfeats, dw))
    return dfeats[:n].astype(jnp.float32), dw


# ---------------------------------------------------------------------------
# Symmetric backward for SUBMANIFOLD rulebooks.
#
# A subm rulebook satisfies idx[m, j] = r <=> idx[r, K-1-j] = m (offset
# K-1-j is the negation of offset j in the z-major enumeration), which
# transposes the dfeats scatter-add into another windowed one-hot GATHER
# over the SAME rulebook:
#     dfeats[r] = sum_j' g[idx[r, j']] @ W[K-1-j']^T
# i.e. the FORWARD kernel run on the grad table with flipped/transposed
# weights — each grid step writes its OWN output tile (no read-modify-
# write window accumulation, the serializing part of _bwd_kernel) — and
#     dW[K-1-j'] = feats^T @ g[idx[:, j']]
# one extra MXU contraction per group between the tile's CONTIGUOUS
# feature rows and the already-gathered g rows (packed space; the pack
# slots are summed out host-side).
# ---------------------------------------------------------------------------


def _symbwd_kernel(starts_ref, plidx_ref, sub_ref, fe_ref, g_hbm, wt_ref,
                   dfe_ref, dwp_ref, win_scratch, acc_ref, sems,
                   *, groups, pack, cout_pad, wp):
    """One grid step = one tile of rows r (input rows == output rows).

    starts (T, G); plidx/sub (TM, K) window layout over the PACKED G
    table; fe (TM, CinL) contiguous feature rows of this tile;
    g_hbm (Npk, pack*Cout_pad) packed grad table (HBM); wt (G,
    per*pack*Cout_pad, CinL) flipped/transposed weights; dfe out
    (TM, CinL); dwp out (G, CinL, per*pack*Cout_pad) f32 accumulated
    across grid steps (packed dW, slots summed by the host wrapper)."""
    t = pl.program_id(0)
    tm, k = plidx_ref.shape
    cin_l = fe_ref.shape[-1]
    lanes = pack * cout_pad
    snap = 8 if win_scratch.dtype == jnp.float32 else 16

    @pl.when(t == 0)
    def _():
        dwp_ref[:] = jnp.zeros_like(dwp_ref)

    for g in range(len(groups)):
        pltpu.make_async_copy(
            g_hbm.at[pl.ds(pl.multiple_of(starts_ref[t, g], snap), wp), :],
            win_scratch.at[g], sems.at[g]).start()

    acc_ref[:] = jnp.zeros((tm, cin_l), jnp.float32)
    lane_group = jax.lax.broadcasted_iota(
        jnp.int32, (tm, lanes), 1) // cout_pad
    row_iota = jax.lax.broadcasted_iota(jnp.int32, (tm, wp), 1)
    fe = fe_ref[:]                                        # (TM, CinL)

    for g, offs in enumerate(groups):
        pltpu.make_async_copy(
            g_hbm.at[pl.ds(pl.multiple_of(starts_ref[t, g], snap), wp), :],
            win_scratch.at[g], sems.at[g]).wait()
        window = win_scratch[g]                           # (Wp, lanes)
        oh_b = jnp.concatenate(
            [(plidx_ref[:, j][:, None] == row_iota) for j in offs],
            axis=0)                                       # (per*TM, Wp)
        # value-moving gather of g rows: bf16x3 for f32 tables (exact)
        if window.dtype == jnp.float32:
            r = _dot_onehot_f32(oh_b, window)
        else:
            r = jnp.dot(oh_b.astype(window.dtype), window,
                        preferred_element_type=jnp.float32)
        parts = []
        for gi, j in enumerate(offs):
            if pack == 1:
                # single slot: identity select, skip the VPU passes
                parts.append(r[gi * tm:(gi + 1) * tm]
                             .astype(window.dtype))
            else:
                sel = (sub_ref[:, j][:, None] == lane_group)
                parts.append(jnp.where(sel, r[gi * tm:(gi + 1) * tm], 0.0)
                             .astype(window.dtype))
        rl = jnp.concatenate(parts, axis=1)               # (TM, per*lanes)
        # dfeats stage (product matmul, DEFAULT precision like the
        # fallback's g @ W^T contraction)
        acc_ref[:] += jnp.dot(rl, wt_ref[g],
                              preferred_element_type=jnp.float32)
        # dW stage: contiguous feats^T @ gathered-g rows, packed space
        dwp_ref[g] += jax.lax.dot_general(
            fe, rl, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)           # (CinL, per*lanes)
    dfe_ref[:] = acc_ref[:].astype(dfe_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("tm", "wp", "interpret", "correction_tiles",
                              "group_mode", "flip"))
def gather_matmul_onehot_symbwd(features: jnp.ndarray,
                                gather_idx: jnp.ndarray,
                                weights: jnp.ndarray,
                                grad_out: jnp.ndarray,
                                tm: int = 512,
                                wp: int = 256,
                                interpret: bool = False,
                                correction_tiles: int = 16,
                                group_mode: str = "zy",
                                flip: bool = True):
    """Transposed-gather backward of the one-hot gather+matmul.

    Two callers:
      flip=True  (SUBM): gather_idx is the forward rulebook itself,
        which is symmetric (idx[m, j] = r <=> idx[r, K-1-j] = m), so
        dfeats[r] = sum_j' g[idx[r, j']] @ W[K-1-j']^T and
        dW[K-1-j'] = feats^T @ g[idx[:, j']].
      flip=False (STRIDED): gather_idx is the REVERSE rulebook
        rev[r, j] = the unique output m with fwd_idx[m, j] = r (miss if
        none — unique because for a fixed offset j the output cell is
        determined by the input cell), so
        dfeats[r] = sum_j g[rev[r, j]] @ W[j]^T and
        dW[j] = feats^T @ g[rev[:, j]].

    Args:
      features: (N, Cin) input rows (tiles iterate over these);
      gather_idx (N, K) in [0, M] (M = miss) pointing into grad_out;
      weights (K, Cin, Cout); grad_out (M, Cout).
    Returns: (dfeatures (N, Cin) f32, dweights (K, Cin, Cout) f32).
    """
    n, cin = features.shape
    n2, k = gather_idx.shape
    m = grad_out.shape[0]
    cout = weights.shape[2]
    assert n2 == n, "gather_idx must have one row per feature row"
    if cout > LANE or cin > LANE:
        raise ValueError(f"Cin/Cout must be <= {LANE}; got {cin}/{cout}")
    dtype = jnp.float32            # cotangents are f32

    # pack the GRAD table by Cout
    cout_pad = 1
    while cout_pad < cout or LANE % cout_pad:
        cout_pad *= 2
    pack = LANE // cout_pad
    lanes = pack * cout_pad
    snap = _snap_of(dtype)
    cin_l = LANE                   # feats tile / dfe / wt lane width

    groups = _default_groups(k, group_mode)
    per = len(groups[0])

    g32 = grad_out.astype(dtype)
    if cout_pad != cout:
        g32 = jnp.pad(g32, ((0, 0), (0, cout_pad - cout)))
    np_rows = _padded_rows(m, pack, snap, wp)
    g_tbl = jnp.pad(g32, ((0, np_rows - m), (0, 0)))
    g_packed = g_tbl.reshape(np_rows // pack, lanes)

    # flipped/transposed weights, pack-tiled, group-stacked:
    # wt[g] rows follow the gathered-lane layout (offset-major, then pack
    # slot, then Cout), columns are Cin (padded to the lane width)
    w_bwd = weights.astype(dtype)
    if flip:
        w_bwd = jnp.flip(w_bwd, axis=0)
    w_bwd = w_bwd.swapaxes(1, 2)
    w_bwd = jnp.pad(w_bwd, ((0, 0), (0, cout_pad - cout),
                            (0, cin_l - cin)))            # (K, CoutP, CinL)
    wt = jnp.tile(w_bwd, (1, pack, 1))                    # (K, lanes, CinL)
    wt = jnp.stack(
        [jnp.concatenate([wt[j] for j in offs], axis=0) for offs in groups])

    pad_m = (-n) % tm          # tiles iterate over FEATURE rows (n of them)
    idx = jnp.pad(gather_idx, ((0, pad_m), (0, 0)), constant_values=m)
    fe_pad = jnp.pad(features.astype(dtype),
                     ((0, pad_m), (0, cin_l - cin)))      # (Np, CinL)
    mp = idx.shape[0]
    n_tiles = mp // tm

    starts, plidx, sub, miss, in_win = _window_layout(
        idx, m, pack, snap, wp, np_rows, tm, groups)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((tm, k), lambda i, s: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tm, k), lambda i, s: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tm, cin_l), lambda i, s: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),            # packed g table
            pl.BlockSpec((len(groups), per * lanes, cin_l),
                         lambda i, s: (0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((tm, cin_l), lambda i, s: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((len(groups), cin_l, per * lanes),
                         lambda i, s: (0, 0, 0), memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((len(groups), wp, lanes), dtype),
            pltpu.VMEM((tm, cin_l), jnp.float32),
            pltpu.SemaphoreType.DMA((len(groups),)),
        ],
    )
    kernel = functools.partial(_symbwd_kernel, groups=groups, pack=pack,
                               cout_pad=cout_pad, wp=wp)
    dfe, dwp = pl.pallas_call(
        kernel,
        out_shape=(jax.ShapeDtypeStruct((mp, cin_l), jnp.float32),
                   jax.ShapeDtypeStruct((len(groups), cin_l, per * lanes),
                                        jnp.float32)),
        grid_spec=grid_spec,
        interpret=interpret,
    )(starts, plidx.reshape(mp, k), sub.reshape(mp, k), fe_pad, g_packed,
      wt)

    dfeats = dfe[:n, :cin]
    # unpack dW: (G, CinL, per, pack, CoutP) -> sum pack slots, reorder to
    # original offset ids, then flip (dW[K-1-j'] = feats^T @ g[idx[:, j']])
    dwp = dwp.reshape(len(groups), cin_l, per, pack, cout_pad)
    dwp = jnp.sum(dwp, axis=3)                    # (G, CinL, per, CoutP)
    dwp = jnp.transpose(dwp, (0, 2, 1, 3))        # (G, per, CinL, CoutP)
    flat_order = [j for gr in groups for j in gr]
    dw_tmp = jnp.zeros((k, cin_l, cout_pad), jnp.float32).at[
        jnp.array(flat_order)].set(dwp.reshape(k, cin_l, cout_pad))
    dw = dw_tmp[:, :cin, :cout]
    if flip:
        dw = jnp.flip(dw, axis=0)

    # tile-granular OOW correction (zero tiles on real rulebooks); exact
    # full-range fallback on overflow, like the forward
    oow = ~in_win & ~miss
    cap_t = min(correction_tiles, n_tiles)
    counts = jnp.sum(oow, axis=(1, 2))
    topv, selt = jax.lax.top_k(counts, cap_t)
    covered = jnp.sum(topv)
    total_oow = jnp.sum(counts)
    g0 = jnp.concatenate(
        [grad_out.astype(jnp.float32), jnp.zeros((1, cout))], axis=0)
    wb2d = weights.astype(jnp.float32)
    if flip:
        wb2d = jnp.flip(wb2d, axis=0)
    wb2d = wb2d.swapaxes(1, 2).reshape(k * cout, cin)

    def _corr(args, eff_idx, tiles_sel):
        # eff_idx (., tm, K) flagged entries (miss -> n); tiles_sel (.,)
        dfeats, dw = args
        gsel = g0[eff_idx]                                # (., tm, K, Cout)
        # dfeats: add the missing gather contributions at the tiles' OWN
        # rows (same structure as the forward correction)
        part = jnp.dot(gsel.reshape(-1, k * cout), wb2d,
                       preferred_element_type=jnp.float32)
        rows = (tiles_sel[:, None] * tm +
                jnp.arange(tm, dtype=jnp.int32)[None, :]).reshape(-1)
        dfeats = jnp.concatenate(
            [dfeats, jnp.zeros((pad_m, cin), jnp.float32)], axis=0)
        dfeats = dfeats.at[rows].add(part.reshape(-1, cin), mode="drop")
        # dW: feats[r] (x) g[idx[r, j']] for flagged entries, into
        # PRE-FLIP slot j' (flip applied on top)
        fsel = fe_pad.reshape(n_tiles, tm, cin_l)[tiles_sel][..., :cin]
        dwc = jnp.einsum("atc,atkd->kcd", fsel,
                         gsel.astype(jnp.float32),
                         preferred_element_type=jnp.float32)
        dw = dw + (jnp.flip(dwc, axis=0) if flip else dwc)
        return dfeats[:n], dw

    def _tile_correction(args):
        sel_idx = idx.reshape(n_tiles, tm, k)[selt]
        eff_idx = jnp.where(oow[selt], sel_idx, m)
        return _corr(args, eff_idx, selt)

    def _full_correction(args):
        eff_idx = jnp.where(oow, idx.reshape(n_tiles, tm, k), m)
        return _corr(args, eff_idx, jnp.arange(n_tiles, dtype=jnp.int32))

    dfeats, dw = jax.lax.cond(covered == total_oow,
                              _tile_correction, _full_correction,
                              (dfeats, dw))
    return dfeats, dw
