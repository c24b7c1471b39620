"""Multi-level RoIAlign — one fused gather over flattened FPN levels.

TPU-native replacement for mmdet's `SingleRoIExtractor` + mmcv CUDA
`RoIAlign` (reference srfdet_head.py:143,175; cfg roi_extractor_*:
output_size=7, sampling_ratio=2, aligned).  Design:

  - FPN level per RoI follows mmdet's map_roi_levels:
      lvl = clamp(floor(log2(sqrt(w*h) / finest_scale + 1e-6)), 0, L-1)
  - instead of running RoIAlign per level and masking (4x waste), all levels
    are flattened and concatenated into one (S, C) table per sample; sample
    coordinates are converted to flat indices with per-level offsets, so the
    whole op is a single big gather + weighted sum -> MXU-friendly reshape.

Two gather strategies (`patch` parameter):

  - pairs (default): each bilinear sample gathers its two (x0, x0+1)
    corner-row pairs — 2 slice-gathers per sample, 392 slices per RoI at
    the shipped 7x7/sr=2 sizing.
  - patch (`patch=P`, e.g. 32): gather the RoI's PxP-cell feature window
    once (P slice-gathers of P consecutive cells) and evaluate every
    bilinear sample as two small separable matmuls (wy @ patch @ wx^T) —
    ~12x fewer slice-gathers for ~1.3x more bytes; the RoI path is
    slice-count bound (PERF.md).  mmdet's level mapping bounds a mapped
    RoI's sqrt(w*h) at <30 cells — but only the GEOMETRIC MEAN: an
    aspect-ratio-a RoI spans up to ~30*sqrt(a) cells on its long axis,
    so elongated boxes misfit P=32 at ordinary levels, not just
    top-level-clamped ones (see config.py roi_patch_fallback sizing
    notes).  Misfits are compacted into a `patch_fallback`-slot buffer
    and take the pairs path — exact whenever they fit the buffer; size
    the buffer from measured misfit counts (tools/bench_roi.py prints
    them), never 0 on real data.

Everything is static-shape; RoIs are never filtered, invalid RoIs simply
produce garbage rows the caller masks.
"""

from __future__ import annotations

import os
from functools import partial
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp

# slice-granular Pallas scatter for the patch-path backward (xla = flat
# single-row scatter-add at the ~10 ns/row wall; kernel = sorted windowed
# RMW vector adds, ops/pallas_patch_scatter.py).  Auto: kernel on TPU for
# f32 slices of >= 8 rows, XLA elsewhere.
SCATTER_BWD = os.environ.get("SRFDET_ROI_SCATTER_BWD", "auto")
SCATTER_INTERPRET = os.environ.get("SRFDET_ROI_SCATTER_INTERPRET",
                                   "0") == "1"


@partial(jax.custom_vjp, nondiff_argnums=(2,))
def _slice_gather_rows(table: jnp.ndarray, starts: jnp.ndarray,
                       n: int) -> jnp.ndarray:
    """Gather n-consecutive-row slices: table (S, C), starts (N,) int32 in
    [0, S-n] -> (N, n, C).

    The slice gather cuts the gathered row count vs single-row corner
    gathers (the RoI path is slice-count bound, PERF.md).  Its AUTODIFF
    transpose, however, is a scatter of overlapping n-row windows which
    XLA serializes catastrophically (measured 5.9 s/step in the flagship
    train backward at n=2) — so the backward is spelled explicitly as a
    flat single-row scatter-add, the same lowering the plain-gather VJP
    gets (~tens of ms at these sizes)."""
    c = table.shape[1]
    return jax.vmap(
        lambda i: jax.lax.dynamic_slice(table, (i, 0), (n, c)))(starts)


def _slice_gather_rows_fwd(table, starts, n):
    # custom_vjp passes nondiff_argnums in their ORIGINAL positions to the
    # fwd rule (only the bwd rule gets them prepended)
    return _slice_gather_rows(table, starts, n), (starts, table.shape[0])


def _slice_gather_rows_bwd(n, res, dg):
    starts, s_rows = res
    c = dg.shape[-1]
    idx = (starts[:, None] + jnp.arange(n, dtype=starts.dtype)).reshape(-1)
    dt = jnp.zeros((s_rows, c), dg.dtype).at[idx].add(
        dg.reshape(-1, c), mode="drop")
    return dt, None


_slice_gather_rows.defvjp(_slice_gather_rows_fwd, _slice_gather_rows_bwd)


def _pair_gather_rows(table: jnp.ndarray, starts: jnp.ndarray) -> jnp.ndarray:
    """(start, start+1) row pairs — the n=2 case of the shared slice
    gather (one custom VJP to maintain)."""
    return _slice_gather_rows(table, starts, 2)


@partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def _patch_gather(table, starts, lvl, ay, ax, shapes, p):
    """Gather every RoI's PxP-cell window: (S, C) table + (R, P) slice
    starts -> (R, P, P, C).  Forward identical to the flat slice gather;
    the VJP carries the RoI window structure (lvl, ay, ax) so the
    backward can run the block-RMW kernel
    (ops/pallas_patch_scatter.roi_window_scatter_add) instead of a
    921k-single-row XLA scatter (~9.2 ms/iteration at flagship scale)."""
    r = starts.shape[0]
    c = table.shape[1]
    pv = _slice_gather_rows(table, starts.reshape(-1), p)
    return pv.reshape(r, p, p, c)


def _patch_gather_fwd(table, starts, lvl, ay, ax, shapes, p):
    return (_patch_gather(table, starts, lvl, ay, ax, shapes, p),
            (starts, lvl, ay, ax, table.shape[0]))


def _patch_gather_bwd(shapes, p, res, dg):
    starts, lvl, ay, ax, s_rows = res
    c = dg.shape[-1]
    use_kernel = SCATTER_INTERPRET
    if SCATTER_BWD == "auto" and not use_kernel:
        try:
            use_kernel = (dg.dtype == jnp.float32 and c % 128 == 0 and
                          jax.default_backend() not in ("cpu",))
        except Exception:
            use_kernel = False
    if use_kernel:
        from .pallas_patch_scatter import roi_window_scatter_add
        dt = roi_window_scatter_add(dg, lvl.astype(jnp.int32),
                                    ay.astype(jnp.int32),
                                    ax.astype(jnp.int32), shapes, p,
                                    interpret=SCATTER_INTERPRET)
        dt = jnp.concatenate(
            [dt, jnp.zeros((s_rows - dt.shape[0], c), dt.dtype)], axis=0)
    else:
        idx = (starts.reshape(-1)[:, None] +
               jnp.arange(p, dtype=starts.dtype)).reshape(-1)
        dt = jnp.zeros((s_rows, c), dg.dtype).at[idx].add(
            dg.reshape(-1, c), mode="drop")
    return dt, None, None, None, None


_patch_gather.defvjp(_patch_gather_fwd, _patch_gather_bwd)


def _level_geometry(feats, rois, strides, finest_scale):
    """Per-RoI level mapping shared by both gather strategies.

    Returns (lvl (R,), scale s (R,), h_l, w_l, off (R,)) — all float32
    per-RoI vectors."""
    num_levels = len(feats)
    hs = jnp.array([f.shape[0] for f in feats], jnp.float32)
    ws = jnp.array([f.shape[1] for f in feats], jnp.float32)
    scales = jnp.array([1.0 / s for s in strides], jnp.float32)
    sizes = [f.shape[0] * f.shape[1] for f in feats]
    offsets = jnp.array(
        [sum(sizes[:i]) for i in range(num_levels)], jnp.float32)

    x1, y1, x2, y2 = rois[:, 0], rois[:, 1], rois[:, 2], rois[:, 3]
    scale = jnp.sqrt(jnp.maximum(x2 - x1, 0) * jnp.maximum(y2 - y1, 0))
    lvl = jnp.floor(jnp.log2(scale / finest_scale + 1e-6))
    lvl = jnp.clip(lvl, 0, num_levels - 1).astype(jnp.int32)     # (R,)
    return lvl, scales[lvl], hs[lvl], ws[lvl], offsets[lvl]


def _sample_grid(rois, s, out_size, sampling_ratio):
    """Separable sample positions: (sx (R, S), sy (R, S)) with
    S = out_size * sampling_ratio, in the RoI's level cell frame
    (aligned=True half-pixel offset)."""
    x1, y1, x2, y2 = rois[:, 0], rois[:, 1], rois[:, 2], rois[:, 3]
    rx1 = x1 * s - 0.5
    ry1 = y1 * s - 0.5
    bin_w = (x2 - x1) * s / out_size
    bin_h = (y2 - y1) * s / out_size
    sr = sampling_ratio
    grid = (jnp.arange(out_size)[:, None] +
            (jnp.arange(sr)[None, :] + 0.5) / sr).reshape(-1)   # (S,)
    sx = rx1[:, None] + bin_w[:, None] * grid[None]             # (R, S)
    sy = ry1[:, None] + bin_h[:, None] * grid[None]
    return sx, sy


def _mla_pairs(feats: Sequence[jnp.ndarray],
               rois: jnp.ndarray,
               strides: Sequence[int],
               out_size: int,
               sampling_ratio: int,
               finest_scale: float) -> jnp.ndarray:
    """Corner-pair gather strategy (see module docstring)."""
    c = feats[0].shape[-1]
    _, s, h_l, w_l, off = _level_geometry(feats, rois, strides,
                                          finest_scale)
    table = jnp.concatenate([f.reshape(-1, c) for f in feats], axis=0)
    # one zero pad row for out-of-bounds samples
    table = jnp.concatenate([table, jnp.zeros((1, c), table.dtype)], axis=0)
    pad_idx = table.shape[0] - 1

    sx, sy = _sample_grid(rois, s, out_size, sampling_ratio)
    sr = sampling_ratio
    sx = sx.reshape(-1, out_size, sr)
    sy = sy.reshape(-1, out_size, sr)

    def bilinear(y, x):
        """y (R, oh, sr), x (R, ow, sr) -> (R, oh, sr, ow, sr, C).

        The two x-corners (x0, x0+1) are ADJACENT rows of the flattened
        table, so each (y, x) pair needs TWO slice-gathers of 2 rows
        instead of four single-row gathers — the RoI path is row-count
        bound (PERF.md).  Right-edge clamps fold the x1 weight into x0
        (identical to gathering the clamped pixel twice)."""
        hh = h_l[:, None, None]
        wwl = w_l[:, None, None]
        # index math in int32: float32 loses integers past 2^24, which a
        # future high-res single-level table would silently hit
        wli = wwl.astype(jnp.int32)
        offi = off.astype(jnp.int32)
        oob_y = (y < -1.0) | (y > hh)
        oob_x = (x < -1.0) | (x > wwl)
        y = jnp.clip(y, 0.0, hh - 1.0)
        x = jnp.clip(x, 0.0, wwl - 1.0)
        y0 = jnp.floor(y)
        x0 = jnp.floor(x)
        ly = y - y0
        lx = x - x0
        y1c = jnp.minimum(y0 + 1, hh - 1.0)
        x_edge = x0 >= wwl - 1.0                     # (R, ow, sr)

        def flat(yy, oy):
            # start index of the (x0, x0+1) pair: (R, oh, sr, ow, sr)
            idx = (offi[:, None, None, None, None] +
                   yy.astype(jnp.int32)[:, :, :, None, None] *
                   wli[..., None, None] +
                   x0.astype(jnp.int32)[:, None, None, :, :])
            oob = oy[:, :, :, None, None] | oob_x[:, None, None, :, :]
            # pad_idx - 1: the pair (pad-1, pad) lands inside the table;
            # both lanes get zero weight for fully-oob samples
            return jnp.where(oob, pad_idx - 1, idx)

        def pair_gather(starts):
            shp = starts.shape
            g = _pair_gather_rows(table, starts.reshape(-1))
            return g.reshape(shp + (2, c))

        g0 = pair_gather(flat(y0, oob_y))            # (..., 2, C)
        g1 = pair_gather(flat(y1c, oob_y))
        wy0, wy1 = (1 - ly), ly
        # fold the clamped x1 weight into x0 (exact: g01 == g00 there)
        wx0 = jnp.where(x_edge, 1.0, 1 - lx)
        wx1 = jnp.where(x_edge, 0.0, lx)
        oob = oob_y[:, :, :, None, None] | oob_x[:, None, None, :, :]
        wx0 = jnp.where(oob_x, 0.0, wx0)[:, None, None, :, :]
        wx1 = jnp.where(oob_x, 0.0, wx1)[:, None, None, :, :]
        wy0b = wy0[:, :, :, None, None]
        wy1b = wy1[:, :, :, None, None]
        val = (g0[..., 0, :] * (wy0b * wx0)[..., None]
               + g0[..., 1, :] * (wy0b * wx1)[..., None]
               + g1[..., 0, :] * (wy1b * wx0)[..., None]
               + g1[..., 1, :] * (wy1b * wx1)[..., None])
        return jnp.where(oob[..., None], 0.0, val)

    vals = bilinear(sy, sx)                     # (R, oh, sr, ow, sr, C)
    pooled = jnp.mean(vals, axis=(2, 4))        # (R, oh, ow, C)
    return pooled


def _axis_weights(pos, size_l, size_i, patch):
    """Per-axis window anchor + one-hot bilinear weights within it.

    pos (R, S) sample positions; size_l/size_i (R,) level extent along the
    axis (float/int).  Returns (w (R, S, P) f32, anchor (R,) int32,
    fits (R,) bool).  Weights are zero for out-of-bounds samples and fold
    the clamped edge corner like the pairs path.  Anchor placement and the
    fit test consider only WEIGHTED cells — a fully- or partially-offscreen
    RoI whose on-image span fits the window stays on the patch path (its
    oob samples clip to the image edge but carry zero weight)."""
    oob = (pos < -1.0) | (pos > size_l[:, None])
    p = jnp.clip(pos, 0.0, size_l[:, None] - 1.0)
    c0 = jnp.floor(p)
    lc = p - c0
    edge = c0 >= size_l[:, None] - 1.0
    c1 = jnp.minimum(c0 + 1, size_l[:, None] - 1.0)
    w0 = jnp.where(oob, 0.0, jnp.where(edge, 1.0, 1.0 - lc))
    w1 = jnp.where(oob, 0.0, jnp.where(edge, 0.0, lc))
    c0i = c0.astype(jnp.int32)
    c1i = c1.astype(jnp.int32)
    big = jnp.int32(1 << 30)
    cmin = jnp.min(jnp.where(oob, big, c0i), axis=1)
    # a sample landing exactly on a cell center has w1 == 0: its c1 cell
    # is unweighted and must not widen the span (else an exactly-fitting
    # window spuriously fails the fit test)
    chi = jnp.where(w1 > 0, c1i, c0i)
    cmax = jnp.max(jnp.where(oob, -1, chi), axis=1)
    anchor = jnp.clip(cmin, 0, jnp.maximum(size_i - patch, 0))
    fits = (cmax - anchor) <= patch - 1   # all-oob: cmax=-1 -> fits, w=0
    iota = jnp.arange(patch, dtype=jnp.int32)
    o0 = c0i - anchor[:, None]
    o1 = c1i - anchor[:, None]
    w = (w0[..., None] * (iota == o0[..., None]) +
         w1[..., None] * (iota == o1[..., None]))
    return w.astype(jnp.float32), anchor, fits


def _mla_patch(feats: Sequence[jnp.ndarray],
               rois: jnp.ndarray,
               strides: Sequence[int],
               out_size: int,
               sampling_ratio: int,
               finest_scale: float,
               patch: int,
               patch_fallback: int,
               patch_chunk: int) -> jnp.ndarray:
    """Patch-gather strategy (see module docstring)."""
    r = rois.shape[0]
    c = feats[0].shape[-1]
    lvl, s, h_l, w_l, off = _level_geometry(feats, rois, strides,
                                            finest_scale)
    table = jnp.concatenate([f.reshape(-1, c) for f in feats], axis=0)
    # `patch` zero pad rows: a weighted window row never starts past the
    # table end (see anchor bound below), but its P-cell slice may run
    # into the pad when the level is narrower than the patch
    table = jnp.concatenate(
        [table, jnp.zeros((patch, c), table.dtype)], axis=0)

    sx, sy = _sample_grid(rois, s, out_size, sampling_ratio)
    hi = h_l.astype(jnp.int32)
    wi = w_l.astype(jnp.int32)
    offi = off.astype(jnp.int32)

    wx, ax, fits_x = _axis_weights(sx, w_l, wi, patch)  # (R, S, P)
    wy, ay, fits_y = _axis_weights(sy, h_l, hi, patch)
    fits = fits_x & fits_y

    # window row starts: off + (ay+dy)*W + ax.  For weighted rows
    # (ay+dy <= h_l-1, ax <= max(w_l-patch, 0)) the start stays within the
    # level, so with the patch-row pad no slice is ever clamped backwards.
    starts = (offi[:, None] +
              (ay[:, None] + jnp.arange(patch, dtype=jnp.int32)[None, :]) *
              wi[:, None] + ax[:, None])               # (R, P)

    shapes = tuple((f.shape[0], f.shape[1]) for f in feats)
    pv = _patch_gather(table, starts, lvl, ay, ax, shapes, patch)
    # HIGHEST: the default MXU precision truncates inputs to bf16,
    # which put the patch path ~1e-2 off the pairs path's pure-VPU
    # f32 bilinear (tests_tpu/test_device_parity.py); these matmuls
    # are tiny next to the patch gather, so exactness is free.
    tmp = jnp.einsum("rip,rpqc->riqc", wy, pv.astype(jnp.float32),
                     preferred_element_type=jnp.float32,
                     precision=jax.lax.Precision.HIGHEST)
    vals = jnp.einsum("rjq,riqc->rijc", wx, tmp,
                      preferred_element_type=jnp.float32,
                      precision=jax.lax.Precision.HIGHEST)
    sr = sampling_ratio
    vals = vals.reshape(r, out_size, sr, out_size, sr, c)
    pooled = jnp.mean(vals, axis=(2, 4))               # (R, oh, ow, C)

    # oversized RoIs (top-level clamped, e.g. behind-camera projections):
    # compact into `cap` slots and take the pairs path — exact whenever
    # they fit; overflow rows produce zeros (capacity discipline).
    cap = r if patch_fallback < 0 else patch_fallback
    if cap == 0:
        zero = jnp.zeros_like(pooled[:1])
        return jnp.where(fits[:, None, None, None], pooled,
                         jnp.broadcast_to(zero, pooled.shape))
    mis = ~fits
    slot = jnp.cumsum(mis.astype(jnp.int32)) - 1
    sel = jnp.where(mis & (slot < cap), slot, cap)
    rois_fb = jnp.full((cap + 1, 4), -1e6, rois.dtype).at[sel].set(
        rois, mode="drop")[:cap]
    out_fb = _mla_pairs(feats, rois_fb, strides, out_size, sampling_ratio,
                        finest_scale)
    out_fb = jnp.concatenate(
        [out_fb, jnp.zeros((1,) + out_fb.shape[1:], out_fb.dtype)], axis=0)
    return jnp.where(fits[:, None, None, None], pooled, out_fb[sel])


def _mla_xpatch(feats: Sequence[jnp.ndarray],
                rois: jnp.ndarray,
                strides: Sequence[int],
                out_size: int,
                sampling_ratio: int,
                finest_scale: float,
                xp: int,
                fallback: int) -> jnp.ndarray:
    """x-patch hybrid strategy: pairs in y, patch in x.

    The pairs path issues 2 slice-gathers per bilinear sample = 392
    2-row slices per RoI; on the 6-camera LC image path that is 752k
    slices per decoder iteration (~16 ms/iter measured — the whole
    fusion-head image cost, tools/bench_img_branch.py head).  But for a
    fixed y-corner row, all S x-samples read ONE image row spanning the
    RoI's x extent — so gather one XP-cell row slice per (RoI,
    y-sample, y-corner) = 2*S slices (14x fewer) and evaluate the
    x-bilinear as a small matmul against the one-hot x weights
    (_axis_weights), keeping the exact per-sample y weights of the
    pairs path.  Only the X extent must fit XP cells (y never misfits),
    so elongated-in-y projected boxes — the case that sank the full
    patch path on cameras (PERF.md round-3) — stay on the fast path;
    x-misfits compact into a `fallback`-slot pairs-path buffer."""
    r = rois.shape[0]
    c = feats[0].shape[-1]
    sr = sampling_ratio
    _, s, h_l, w_l, off = _level_geometry(feats, rois, strides,
                                          finest_scale)
    table = jnp.concatenate([f.reshape(-1, c) for f in feats], axis=0)
    # xp pad rows: mid-level x spills land in the next level's rows and
    # last-level spills in this pad — both carry zero x weight; the pad
    # guarantees `start + xp <= rows` so dynamic_slice never clamps
    # (clamping would MISALIGN the weighted lanes, not just waste them)
    table = jnp.concatenate(
        [table, jnp.zeros((xp, c), table.dtype)], axis=0)

    sx, sy = _sample_grid(rois, s, out_size, sampling_ratio)
    wi = w_l.astype(jnp.int32)
    offi = off.astype(jnp.int32)

    wx, ax, fits_x = _axis_weights(sx, w_l, wi, xp)     # (R, S, XP)

    hh = h_l[:, None]
    oob_y = (sy < -1.0) | (sy > hh)
    y = jnp.clip(sy, 0.0, hh - 1.0)
    y0 = jnp.floor(y)
    ly = y - y0
    y1 = jnp.minimum(y0 + 1, hh - 1.0)
    wy0 = jnp.where(oob_y, 0.0, 1.0 - ly)               # (R, S)
    wy1 = jnp.where(oob_y, 0.0, ly)
    y0i = y0.astype(jnp.int32)
    y1i = y1.astype(jnp.int32)

    starts = (offi[:, None, None] +
              jnp.stack([y0i, y1i], axis=1) * wi[:, None, None] +
              ax[:, None, None])                        # (R, 2, S)
    g = _slice_gather_rows(table, starts.reshape(-1), xp)
    g = g.reshape(r, 2, sy.shape[1], xp, c)             # (R, 2, S, XP, C)
    # x bilinear as a matmul; HIGHEST like the patch path (the pairs
    # reference is pure-VPU f32)
    val = jnp.einsum("rjp,rkipc->rkijc", wx, g.astype(jnp.float32),
                     preferred_element_type=jnp.float32,
                     precision=jax.lax.Precision.HIGHEST)
    vals = (val[:, 0] * wy0[:, :, None, None] +
            val[:, 1] * wy1[:, :, None, None])          # (R, S, S, C)
    vals = vals.reshape(r, out_size, sr, out_size, sr, c)
    pooled = jnp.mean(vals, axis=(2, 4))

    # x-misfit fallback: compact into `fallback` pairs-path slots
    cap = r if fallback < 0 else fallback
    if cap == 0:
        zero = jnp.zeros_like(pooled[:1])
        return jnp.where(fits_x[:, None, None, None], pooled,
                         jnp.broadcast_to(zero, pooled.shape))
    mis = ~fits_x
    slot = jnp.cumsum(mis.astype(jnp.int32)) - 1
    sel = jnp.where(mis & (slot < cap), slot, cap)
    rois_fb = jnp.full((cap + 1, 4), -1e6, rois.dtype).at[sel].set(
        rois, mode="drop")[:cap]
    out_fb = _mla_pairs(feats, rois_fb, strides, out_size, sampling_ratio,
                        finest_scale)
    out_fb = jnp.concatenate(
        [out_fb, jnp.zeros((1,) + out_fb.shape[1:], out_fb.dtype)], axis=0)
    return jnp.where(fits_x[:, None, None, None], pooled, out_fb[sel])


def multilevel_roi_align(feats: Sequence[jnp.ndarray],
                         rois: jnp.ndarray,
                         strides: Sequence[int],
                         out_size: int = 7,
                         sampling_ratio: int = 2,
                         finest_scale: float = 56.0,
                         patch: int = 0,
                         patch_fallback: int = -1,
                         patch_chunk: int = 32,
                         xpatch: int = 0,
                         xpatch_fallback: int = -1) -> jnp.ndarray:
    """RoIAlign over multiple levels for a single sample.

    Args:
      feats: list of (H_l, W_l, C) feature maps (NHWC without batch).
      rois: (R, 4) [x1, y1, x2, y2] in the stride-1 input frame.
      strides: per-level stride of the input frame.
      patch: 0 = corner-pair gathers (default); P > 0 = patch-gather
        strategy with a PxP cell window (32 covers mmdet level mapping).
      patch_fallback: capacity of the oversized-RoI pairs-path buffer
        (-1 = R, exact always; 0 = none, oversized RoIs produce zeros).
      patch_chunk: unused (kept for call compatibility; the patch gather
        is one fused custom-VJP op since the block-RMW backward landed).
      xpatch: XP > 0 = x-patch hybrid (pairs in y, XP-cell row slices in
        x — 14x fewer slices than pairs; see _mla_xpatch).  Mutually
        exclusive with patch.
      xpatch_fallback: pairs-path buffer capacity for x-misfits.

    Returns: (R, out_size, out_size, C).
    """
    if patch:
        return _mla_patch(feats, rois, strides, out_size, sampling_ratio,
                          finest_scale, patch, patch_fallback, patch_chunk)
    if xpatch:
        return _mla_xpatch(feats, rois, strides, out_size, sampling_ratio,
                           finest_scale, xpatch, xpatch_fallback)
    return _mla_pairs(feats, rois, strides, out_size, sampling_ratio,
                      finest_scale)
