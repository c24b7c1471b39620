"""Masked segment reductions (TPU-native DynamicScatter equivalents).

The reference consumes mmcv's CUDA `DynamicScatter` (voxel_encoder.py:82,
99-102).  On TPU, scatter-mean/max over point->voxel maps are expressed as
`jax.ops.segment_*` with static segment counts; invalid points carry segment
id == num_segments and fall off the end (segment ops drop out-of-range ids).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def segment_mean(data: jnp.ndarray,
                 segment_ids: jnp.ndarray,
                 num_segments: int) -> jnp.ndarray:
    """Mean of data rows per segment; empty segments yield 0.

    Out-of-range ids (e.g. ``num_segments`` used as the invalid marker) are
    dropped.
    """
    # accumulate in f32: a bf16 count saturates at 256 rows (256 + 1
    # rounds back to 256) and a bf16 sum loses low bits on dense voxels.
    # The count rides as an extra data column: segment scatters price by
    # ROW (~10 ns/row regardless of width, PERF.md), so one (C+1)-wide
    # scatter costs half of separate sum + count scatters.
    aug = jnp.concatenate(
        [data.astype(jnp.float32),
         jnp.ones(data.shape[:1] + (1,), jnp.float32)], axis=1)
    tot = jax.ops.segment_sum(aug, segment_ids, num_segments)
    total, count = tot[:, :-1], tot[:, -1]
    return (total / jnp.maximum(count, 1.0)[:, None]).astype(data.dtype)


def segment_max(data: jnp.ndarray,
                segment_ids: jnp.ndarray,
                num_segments: int) -> jnp.ndarray:
    """Max of data rows per segment; empty segments yield 0 (as mmcv does)."""
    out = jax.ops.segment_max(data, segment_ids, num_segments)
    # segment_max initializes empty segments with the dtype's lowest value
    # (-inf for floats, INT_MIN for ints); zero them like the CUDA op
    # (which only writes touched voxels of a zero canvas).  An isfinite
    # test would be a no-op for integer dtypes and would also zero
    # legitimate -inf/NaN rows; detect emptiness directly instead.
    counts = jax.ops.segment_sum(
        jnp.ones_like(segment_ids, jnp.int32), segment_ids, num_segments)
    empty = (counts == 0).reshape((-1,) + (1,) * (out.ndim - 1))
    return jnp.where(empty, jnp.zeros((), out.dtype), out)
