"""Pallas fused gather+matmul for sparse convolution (TPU).

The sparse conv's hot op is `features[gather_idx] @ weights`: XLA lowers the
row gather through HBM at ~30 GB/s effective (measured, PERF.md).  But every
stage's feature table fits in VMEM — nuScenes capacities give at most
(120k x 16 | 60k x 32 | 30k x 64 | 15k x 128) x 4 B ~= 7.7 MB — so this
kernel pins the WHOLE table in VMEM once and gathers per output tile at
on-chip speed, feeding the (TM, K*Cin) x (K*Cin, Cout) product straight to
the MXU.

Falls back to the XLA path (ops/sparse_conv.gathered_conv_apply_batched)
when the table exceeds the VMEM budget.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# feature table + weights + tiles must fit comfortably in ~16 MB VMEM
_VMEM_TABLE_BUDGET = 9 * 1024 * 1024
_TM = 256                              # output rows per grid step


def _kernel(idx_ref, feats_ref, w_ref, out_ref):
    """One kernel offset per grid step: full-table VMEM shuffle + matmul.

    idx (1, M) VMEM; feats (M, Cin) VMEM (table padded to M rows);
    w (1, Cin, Cout) VMEM; out (M, Cout) VMEM, accumulated across steps.

    Mosaic's dynamic-gather only supports same-shape shuffles
    (indices.shape == input.shape), hence the offset-major decomposition:
    each step permutes the whole table once and feeds one thin matmul.
    """
    k = pl.program_id(0)

    @pl.when(k == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    table = feats_ref[:]                               # (M, Cin)
    idx = idx_ref[0].reshape(-1)                       # (M,)
    idx2 = jnp.broadcast_to(idx[:, None], table.shape)
    gathered = jnp.take_along_axis(table, idx2, axis=0)
    out_ref[:] += jnp.dot(gathered, w_ref[0],
                          preferred_element_type=jnp.float32
                          ).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def gather_matmul_pallas(features: jnp.ndarray,
                         gather_idx: jnp.ndarray,
                         weights: jnp.ndarray,
                         interpret: bool = False) -> jnp.ndarray:
    """features (V1, Cin) WITH pad row last; gather_idx (M, K) int32 in
    [0, V1); weights (K, Cin, Cout) -> (M, Cout).

    Requires M >= V1 (true for submanifold convs where M == V) so the
    shuffle covers the table; extra table rows are padding."""
    v1, cin = features.shape
    m, k = gather_idx.shape
    cout = weights.shape[2]
    rows = max(m, v1)
    rows = rows + ((-rows) % 128)
    table = jnp.zeros((rows, cin), features.dtype).at[:v1].set(features)
    # misses already point at the zero pad row v1-1 of `features`; rows
    # beyond v1 are zero too.
    idx = jnp.full((rows, k), v1 - 1, jnp.int32).at[:m].set(gather_idx)
    idx3 = idx.T.reshape(k, rows // 128, 128)          # TPU-tileable blocks
    w = weights.astype(features.dtype)

    out = pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct((rows, cout), features.dtype),
        grid=(k,),
        in_specs=[
            pl.BlockSpec((1, rows // 128, 128), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),     # idx column i
            pl.BlockSpec((rows, cin), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),     # whole table
            pl.BlockSpec((1, cin, cout), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((rows, cout), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(idx3, table, w)
    return out[:m]


def fits_vmem(v1: int, cin: int, cout: int, k: int,
              dtype_bytes: int = 4) -> bool:
    table = v1 * cin * dtype_bytes
    w = k * cin * cout * dtype_bytes
    tiles = _TM * (k + k * cin + cout) * dtype_bytes * 2
    return table + w + tiles <= _VMEM_TABLE_BUDGET


def gathered_conv_apply_pallas(features: jnp.ndarray,
                               gather_idx: jnp.ndarray,
                               weights: jnp.ndarray,
                               interpret: bool = False
                               ) -> Optional[jnp.ndarray]:
    """Batched wrapper matching gathered_conv_apply_batched's contract:
    features (B, V, Cin), gather_idx (B, M, K) GLOBAL flat indices
    (B*V = pad), weights (K, Cin, Cout) -> (B, M, Cout), or None when the
    table exceeds the VMEM budget (caller falls back to XLA)."""
    b, v, cin = features.shape
    _, m, k = gather_idx.shape
    cout = weights.shape[2]
    if not fits_vmem(b * v + 1, cin, cout, k,
                     2 if features.dtype == jnp.bfloat16 else 4):
        return None
    flat = jnp.concatenate(
        [features.reshape(b * v, cin),
         jnp.zeros((1, cin), features.dtype)], axis=0)
    out = gather_matmul_pallas(flat, gather_idx.reshape(b * m, k),
                               weights, interpret=interpret)
    return out.reshape(b, m, cout)
