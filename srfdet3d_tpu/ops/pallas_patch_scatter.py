"""RoI patch-window scatter-add kernel: the RoIAlign patch backward.

The patch-path forward gathers, per RoI, a PxP-cell window of its FPN
level (P slice-gathers of P consecutive cells — slice-count bound,
cheap).  Its table cotangent is the transpose: ADD each RoI's (P, P, C)
patch cotangent back into its window.  The XLA lowering is a flat
single-row scatter-add at the row wall (~10 ns/row): 900 RoIs x 32x32
= 921,600 rows ~= 9.2 ms per decoder iteration, ~45 ms of the 93 ms
head backward (tools/bench_head_parts.py, PERF.md round-5).

A first attempt (sorted slices + per-tile windowed RMW with
dynamic-offset VMEM adds) measured 4.5x WORSE than XLA in context —
the 28.8k-slice argsort permute is itself a wide-row gather and Mosaic
dynamic-offset vector adds are expensive.  This kernel instead uses the
structure the slices already have: one RoI = ONE strided 2D block in
its level image.  The flat table is repacked per level into a padded
(Hsum, Wpad*C) 2D image; each grid step (one RoI) then

  1. DMAs the (P+8, P*C) window at (row0 & ~7, ax*C) in — both offsets
     DMA-aligned (rows snapped to the f32 sublane snap, cols a multiple
     of C=128 lanes),
  2. adds the RoI's (P, P*C) cotangent at the sub-8 row offset via an
     8-way `pl.when` over STATIC slices (no dynamic VMEM indexing),
  3. DMAs the window back, awaiting the write before the next step —
     grid steps run sequentially on the core, so overlapping RoI
     windows are safe (same RMW discipline as ops/pallas_onehot_bwd).

No sort, no permute, no correction pass: every RoI window is exact by
construction (anchors are clipped into the level in the forward).
x/y spills of levels smaller than P carry zero cotangent (zero bilinear
weight) and land in the 2D padding, which the unpack discards — the
same rows the XLA path adds zeros to.

Reference counterpart: the mmcv CUDA RoIAlign backward's atomicAdd
splats (reference mmdet3d_plugin/models/sparse_heads/srfdet_head.py:143
roi_extractor usage).
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128
_SNAP = 8          # f32 sublane DMA snap
_GAP = 8           # inter-level pad rows (absorbs the row snap-down)


def level_layout(shapes: Sequence[Tuple[int, int]], p: int):
    """Padded-2D row offsets for the per-level images.

    shapes: [(H_l, W_l)] per level.  Returns (loffs, h_sum, w_pad) where
    level l occupies rows [loffs[l], loffs[l] + max(H_l, p)) of a
    (h_sum, w_pad*C) image; w_pad = max(max W_l, p)."""
    loffs = []
    off = _GAP
    for h, _w in shapes:
        loffs.append(off)
        off += max(h, p) + _GAP
    w_pad = max(max(w for _h, w in shapes), p)
    return tuple(loffs), off, w_pad


def _kernel(scal_ref, dpv_ref, dt_in_hbm, dt_hbm, win, sem, wsem, *, p, c):
    """One grid step = one RoI.  scal (R, 3) int32 [row0 (snapped to 8),
    sub-8 offset, col0 (multiple of C)]; dpv (P, P*C) cotangent block;
    dt_hbm (Hsum, Wpad*C) OUTPUT accumulator (aliased zeros input);
    win (P+8, P*C) scratch."""
    t = pl.program_id(0)
    r0 = pl.multiple_of(scal_ref[t, 0], _SNAP)
    sub = scal_ref[t, 1]
    c0 = pl.multiple_of(scal_ref[t, 2], LANE)
    cp = pltpu.make_async_copy(
        dt_hbm.at[pl.ds(r0, p + _SNAP), pl.ds(c0, p * c)], win, sem)
    cp.start()
    cp.wait()
    pat = dpv_ref[:]
    for rr in range(_SNAP):
        @pl.when(sub == rr)
        def _(rr=rr):
            win[rr:rr + p, :] += pat
    wb = pltpu.make_async_copy(
        win, dt_hbm.at[pl.ds(r0, p + _SNAP), pl.ds(c0, p * c)], wsem)
    wb.start()
    # the write-back must land before the next step reads an overlapping
    # window
    wb.wait()


@functools.partial(jax.jit, static_argnames=("shapes", "p", "interpret"))
def roi_window_scatter_add(dpv: jnp.ndarray, lvl: jnp.ndarray,
                           ay: jnp.ndarray, ax: jnp.ndarray,
                           shapes: Tuple[Tuple[int, int], ...], p: int,
                           interpret: bool = False) -> jnp.ndarray:
    """Accumulate per-RoI patch cotangents into the flat level table.

    Args:
      dpv: (R, P, P, C) f32 patch cotangents (dy, dx minor).
      lvl: (R,) int32 FPN level of each RoI.
      ay/ax: (R,) int32 window anchors within the level (clipped by the
        forward into [0, max(H_l - P, 0)] etc.).
      shapes: ((H_l, W_l), ...) static level shapes.
    Returns: (sum(H_l*W_l), C) f32 flat table gradient (level-major, the
    layout ops/roi_align.py builds its gather table in, WITHOUT the
    trailing pad rows — the caller's pad-row grads are discarded anyway).
    """
    r, pp, _, c = dpv.shape
    assert pp == p and c % LANE == 0
    loffs, h_sum, w_pad = level_layout(shapes, p)
    loff = jnp.asarray(loffs, jnp.int32)[lvl]
    row0 = loff + ay
    scal = jnp.stack([(row0 // _SNAP) * _SNAP, row0 % _SNAP, ax * c],
                     axis=1).astype(jnp.int32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(r,),
        in_specs=[
            pl.BlockSpec((1, p, p * c), lambda i, s: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((p + _SNAP, p * c), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ],
    )

    def kern(scal_ref, dpv_ref, dt_in, dt_out, win, sem, wsem):
        _kernel(scal_ref, dpv_ref.at[0], dt_in, dt_out, win, sem, wsem,
                p=p, c=c)

    dt2d = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((h_sum, w_pad * c), jnp.float32),
        grid_spec=grid_spec,
        input_output_aliases={2: 0},   # indices count scalar prefetch
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(scal, dpv.reshape(r, p, p * c),
      jnp.zeros((h_sum, w_pad * c), jnp.float32))

    parts = []
    for (h, w), lo in zip(shapes, loffs):
        parts.append(dt2d[lo:lo + h, :w * c].reshape(h * w, c))
    return jnp.concatenate(parts, axis=0)
