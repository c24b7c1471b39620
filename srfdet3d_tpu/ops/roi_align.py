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

import jax.numpy as jnp


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
        """y (R, oh, sr), x (R, ow, sr) -> (R, oh, sr, ow, sr, C)."""
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
        x1c = jnp.minimum(x0 + 1, wwl - 1.0)

        def flat(yy, xx, oy, ox):
            # (R, oh, sr, ow, sr) flat table index
            idx = (off[:, None, None, None, None] +
                   yy[:, :, :, None, None] * wwl[..., None, None] +
                   xx[:, None, None, :, :])
            oob = oy[:, :, :, None, None] | ox[:, None, None, :, :]
            return jnp.where(oob, pad_idx, idx.astype(jnp.int32))

        g00 = table[flat(y0, x0, oob_y, oob_x)]
        g01 = table[flat(y0, x1c, oob_y, oob_x)]
        g10 = table[flat(y1c, x0, oob_y, oob_x)]
        g11 = table[flat(y1c, x1c, oob_y, oob_x)]
        wy0, wy1 = (1 - ly), ly
        wx0, wx1 = (1 - lx), lx
        val = (g00 * (wy0[:, :, :, None, None] * wx0[:, None, None, :, :])[..., None]
               + g01 * (wy0[:, :, :, None, None] * wx1[:, None, None, :, :])[..., None]
               + g10 * (wy1[:, :, :, None, None] * wx0[:, None, None, :, :])[..., None]
               + g11 * (wy1[:, :, :, None, None] * wx1[:, None, None, :, :])[..., None])
        oob = oob_y[:, :, :, None, None] | oob_x[:, None, None, :, :]
        return jnp.where(oob[..., None], 0.0, val)

    vals = bilinear(sy, sx)                     # (R, oh, sr, ow, sr, C)
    pooled = jnp.mean(vals, axis=(2, 4))        # (R, oh, ow, C)
    return pooled
