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

Everything is static-shape; RoIs are never filtered, invalid RoIs simply
produce garbage rows the caller masks.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp


@jax.custom_vjp
def _pair_gather_rows(table: jnp.ndarray, starts: jnp.ndarray) -> jnp.ndarray:
    """Gather (start, start+1) row pairs: table (S, C), starts (N,) int32
    in [0, S-2] -> (N, 2, C).

    The 2-row slice gather halves the gathered row count vs 4 single-row
    corner gathers (the RoI path is row-count bound, PERF.md).  Its
    AUTODIFF transpose, however, is a scatter of overlapping 2-row windows
    which XLA serializes catastrophically (measured 5.9 s/step in the
    flagship train backward) — so the backward is spelled explicitly as a
    flat single-row scatter-add, the same lowering the plain-gather VJP
    gets (~tens of ms at these sizes)."""
    c = table.shape[1]
    return jax.vmap(
        lambda i: jax.lax.dynamic_slice(table, (i, 0), (2, c)))(starts)


def _pair_gather_rows_fwd(table, starts):
    return _pair_gather_rows(table, starts), (starts, table.shape[0])


def _pair_gather_rows_bwd(res, dg):
    starts, s_rows = res
    c = dg.shape[-1]
    idx = jnp.concatenate([starts, starts + 1])
    upd = jnp.concatenate([dg[:, 0, :], dg[:, 1, :]])
    dt = jnp.zeros((s_rows, c), dg.dtype).at[idx].add(upd, mode="drop")
    return dt, None


_pair_gather_rows.defvjp(_pair_gather_rows_fwd, _pair_gather_rows_bwd)


def multilevel_roi_align(feats: Sequence[jnp.ndarray],
                         rois: jnp.ndarray,
                         strides: Sequence[int],
                         out_size: int = 7,
                         sampling_ratio: int = 2,
                         finest_scale: float = 56.0) -> jnp.ndarray:
    """RoIAlign over multiple levels for a single sample.

    Args:
      feats: list of (H_l, W_l, C) feature maps (NHWC without batch).
      rois: (R, 4) [x1, y1, x2, y2] in the stride-1 input frame.
      strides: per-level stride of the input frame.

    Returns: (R, out_size, out_size, C).
    """
    num_levels = len(feats)
    c = feats[0].shape[-1]
    hs = jnp.array([f.shape[0] for f in feats], jnp.float32)
    ws = jnp.array([f.shape[1] for f in feats], jnp.float32)
    scales = jnp.array([1.0 / s for s in strides], jnp.float32)
    sizes = [f.shape[0] * f.shape[1] for f in feats]
    offsets = jnp.array(
        [sum(sizes[:i]) for i in range(num_levels)], jnp.float32)
    table = jnp.concatenate([f.reshape(-1, c) for f in feats], axis=0)
    # one zero pad row for out-of-bounds samples
    table = jnp.concatenate([table, jnp.zeros((1, c), table.dtype)], axis=0)
    pad_idx = table.shape[0] - 1

    x1, y1, x2, y2 = rois[:, 0], rois[:, 1], rois[:, 2], rois[:, 3]
    scale = jnp.sqrt(jnp.maximum(x2 - x1, 0) * jnp.maximum(y2 - y1, 0))
    lvl = jnp.floor(jnp.log2(scale / finest_scale + 1e-6))
    lvl = jnp.clip(lvl, 0, num_levels - 1).astype(jnp.int32)     # (R,)

    s = scales[lvl]                                               # (R,)
    h_l, w_l = hs[lvl], ws[lvl]
    off = offsets[lvl]

    # aligned=True RoIAlign (mmcv default): half-pixel offset
    rx1 = x1 * s - 0.5
    ry1 = y1 * s - 0.5
    roi_w = (x2 - x1) * s
    roi_h = (y2 - y1) * s
    bin_w = roi_w / out_size
    bin_h = roi_h / out_size

    sr = sampling_ratio
    # sample grid: (out, sr) fractional positions within the roi
    grid = (jnp.arange(out_size)[:, None] +
            (jnp.arange(sr)[None, :] + 0.5) / sr)                # (out, sr)
    sx = rx1[:, None, None] + bin_w[:, None, None] * grid[None]  # (R, out, sr)
    sy = ry1[:, None, None] + bin_h[:, None, None] * grid[None]

    def bilinear(y, x):
        """y (R, oh, sr), x (R, ow, sr) -> (R, oh, sr, ow, sr, C).

        The two x-corners (x0, x0+1) are ADJACENT rows of the flattened
        table, so each (y, x) pair needs TWO slice-gathers of 2 rows
        instead of four single-row gathers — the RoI path is row-count
        bound (PERF.md).  Right-edge clamps fold the x1 weight into x0
        (identical to gathering the clamped pixel twice)."""
        hh = h_l[:, None, None]
        wwl = w_l[:, None, None]
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
            idx = (off[:, None, None, None, None] +
                   yy[:, :, :, None, None] * wwl[..., None, None] +
                   x0[:, None, None, :, :])
            oob = oy[:, :, :, None, None] | oob_x[:, None, None, :, :]
            # pad_idx - 1: the pair (pad-1, pad) lands inside the table;
            # both lanes get zero weight for fully-oob samples
            return jnp.where(oob, pad_idx - 1, idx.astype(jnp.int32))

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
