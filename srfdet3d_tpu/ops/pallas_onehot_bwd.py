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
            sel = (sub_ref[:, j][:, None] == lane_group)
            rparts.append(jnp.where(sel, rows[pj * tm:(pj + 1) * tm], 0.0))
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
