"""Middle encoders: pillar scatter (dense BEV canvas) + sparse 3D encoder.

- :class:`PointPillarsScatter` replaces mmdet3d's PointPillarsScatter
  (cfg srfdet_pillar_nusc_L.py:53-54): one static scatter into (H*W, C).
- :class:`SparseEncoder` (in sparse_encoder.py) replaces the spconv stack.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
from flax import linen as nn


def pillar_scatter(voxel_feats: jnp.ndarray, voxel_coords: jnp.ndarray,
                   voxel_mask: jnp.ndarray,
                   output_shape: Tuple[int, int]) -> jnp.ndarray:
    """Scatter one sample's pillar features into a dense BEV canvas.

    voxel_feats (V_cap, C) + coords (V_cap, 3) zyx + mask -> (ny, nx, C).
    Invalid slots scatter to a dropped index. Parameter-free.
    """
    ny, nx = output_shape
    c = voxel_feats.shape[-1]
    flat_idx = voxel_coords[:, 1] * nx + voxel_coords[:, 2]
    flat_idx = jnp.where(voxel_mask, flat_idx, ny * nx)
    canvas = jnp.zeros((ny * nx + 1, c), voxel_feats.dtype)
    canvas = canvas.at[flat_idx].set(voxel_feats, mode="drop")
    return canvas[:-1].reshape(ny, nx, c)


def pillar_scatter_batched(voxel_feats: jnp.ndarray,
                           voxel_coords: jnp.ndarray,
                           voxel_mask: jnp.ndarray,
                           output_shape: Tuple[int, int]) -> jnp.ndarray:
    """(B, V, C) -> (B, ny, nx, C) via ONE flat scatter (the batch index
    folds into the cell key; vmapped scatters compile pathologically
    slowly on the remote TPU compiler)."""
    ny, nx = output_shape
    b, v, c = voxel_feats.shape
    cells = ny * nx
    flat_idx = voxel_coords[..., 1] * nx + voxel_coords[..., 2]
    offs = (jnp.arange(b, dtype=jnp.int32) * cells)[:, None]
    flat_idx = jnp.where(voxel_mask, flat_idx + offs, b * cells)
    canvas = jnp.zeros((b * cells + 1, c), voxel_feats.dtype)
    canvas = canvas.at[flat_idx.reshape(-1)].set(
        voxel_feats.reshape(-1, c), mode="drop")
    return canvas[:-1].reshape(b, ny, nx, c)


class PointPillarsScatter(nn.Module):
    """Module wrapper over :func:`pillar_scatter` (per-sample inputs)."""
    output_shape: Tuple[int, int]  # (ny, nx)

    @nn.compact
    def __call__(self, voxel_feats: jnp.ndarray, voxel_coords: jnp.ndarray,
                 voxel_mask: jnp.ndarray) -> jnp.ndarray:
        return pillar_scatter(voxel_feats, voxel_coords, voxel_mask,
                              self.output_shape)
