"""Windowed-DMA Pallas gather+matmul for sparse convolution.

The XLA row-gather runs at ~30 GB/s effective (PERF.md); this kernel
exploits the sorted-key layout: for one kernel offset, the input rows
matched by a tile of consecutive output rows are near-monotone, so MOST of
them fall inside a contiguous window of the feature table.  Per (tile,
offset) the kernel DMAs one contiguous window (fast, large blocks), then
applies a SAME-SHAPE VMEM shuffle (the only dynamic gather Mosaic lowers)
with window-relative indices, and feeds one (TM, K*Cin) x (K*Cin, Cout)
matmul to the MXU.

Rows outside their window are zeroed in-kernel and repaired by a small XLA
correction pass (gather only the out-of-window entries per offset).

Host-side layout work (window starts, relative indices, correction masks)
is plain XLA in :func:`gather_matmul_windowed`.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(starts_ref, lidx_ref, feats_hbm, w_ref, out_ref, scratch,
            sems):
    """Grid step = one output tile.

    starts (n_tiles, K) scalar-prefetched window starts (SMEM);
    lidx (TM, K) VMEM relative indices (W = miss/zero row);
    feats (V1, Cin) HBM; w (K*Cin, Cout) VMEM; out (TM, Cout);
    scratch (K, W + 8, Cin) VMEM; sems (K,) DMA.
    """
    t = pl.program_id(0)
    tm, k = lidx_ref.shape
    cin = feats_hbm.shape[1]
    w_rows = scratch.shape[1] - 8

    # launch all K window DMAs
    for j in range(k):
        pltpu.make_async_copy(
            feats_hbm.at[pl.ds(starts_ref[t, j], w_rows), :],
            scratch.at[j, pl.ds(0, w_rows), :],
            sems.at[j],
        ).start()

    lidx = lidx_ref[:]                                  # (TM, K)
    pieces = []
    for j in range(k):
        pltpu.make_async_copy(
            feats_hbm.at[pl.ds(starts_ref[t, j], w_rows), :],
            scratch.at[j, pl.ds(0, w_rows), :],
            sems.at[j],
        ).wait()
        # zero the miss row (lidx uses w_rows as the miss index)
        scratch[j, w_rows, :] = jnp.zeros((cin,), scratch.dtype)
        window = scratch[j]                             # (W+8, Cin) value
        # same-shape shuffle: out[i, c] = window[idx2[i, c], c]
        idx = lidx[:, j]                                # (TM,) in [0, W]
        idx2 = jnp.concatenate(
            [jnp.broadcast_to(idx[:, None], (tm, cin)),
             jnp.zeros((w_rows + 8 - tm, cin), jnp.int32)], axis=0)
        shuffled = jnp.take_along_axis(window, idx2, axis=0)
        pieces.append(shuffled[:tm])                    # (TM, Cin)
    g = jnp.concatenate(pieces, axis=1)                 # (TM, K*Cin)
    out_ref[:] = jnp.dot(g, w_ref[:],
                         preferred_element_type=jnp.float32
                         ).astype(out_ref.dtype)


@functools.partial(jax.jit,
                   static_argnames=("tm", "window", "interpret", "correct"))
def gather_matmul_windowed(features: jnp.ndarray,
                           gather_idx: jnp.ndarray,
                           weights: jnp.ndarray,
                           tm: int = 512,
                           window: int = 1024,
                           interpret: bool = False,
                           correct: bool = True) -> jnp.ndarray:
    """features (V1, Cin) with zero pad row LAST; gather_idx (M, K) int32 in
    [0, V1); weights (K, Cin, Cout) -> (M, Cout).  Exact when correct=True:
    out-of-window entries are fixed up by an XLA correction pass
    (correct=False is for benchmarking the kernel alone)."""
    v1, cin = features.shape
    m, k = gather_idx.shape
    cout = weights.shape[2]

    pad_m = (-m) % tm
    idx = jnp.pad(gather_idx, ((0, pad_m), (0, 0)),
                  constant_values=v1 - 1)
    mp = idx.shape[0]
    n_tiles = mp // tm

    # per (tile, offset): window start = min valid idx in tile, snapped to 8
    tiles = idx.reshape(n_tiles, tm, k)
    starts = jnp.min(tiles, axis=1)                     # (T, K)
    starts = jnp.minimum(starts, max(v1 - window, 0))
    starts = (starts // 8) * 8
    rel = tiles - starts[:, None, :]                    # (T, TM, K)
    in_win = (rel >= 0) & (rel < window)
    lidx = jnp.where(in_win, rel, window).astype(jnp.int32)

    # ensure the DMA window never reads past the array
    feats_padded = jnp.pad(features, ((0, window + 8), (0, 0)))
    w2 = weights.reshape(k * cin, cout).astype(features.dtype)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,                       # starts -> SMEM
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((tm, k), lambda i, s: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),       # feats stay in HBM
            pl.BlockSpec((k * cin, cout), lambda i, s: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tm, cout), lambda i, s: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((k, window + 8, cin), features.dtype),
            pltpu.SemaphoreType.DMA((k,)),
        ],
    )
    out = pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct((mp, cout), features.dtype),
        grid_spec=grid_spec,
        interpret=interpret,
    )(starts, lidx.reshape(mp, k), feats_padded, w2)
    out = out[:m]

    if not correct:
        return out

    # correction: entries that fell outside their window, compacted to a
    # static cap (C_CAP pairs) — typically a small fraction of M*K
    oow = (~in_win).reshape(mp, k)[:m]                  # (M, K)
    flat_oow = oow.reshape(-1)
    c_cap = max(256, (m * k) // 16)
    # order: oow entries first
    order = jnp.argsort(~flat_oow)[:c_cap]
    take = flat_oow[order]                              # (C_CAP,)
    rows_m = (order // k).astype(jnp.int32)
    offs_k = (order % k).astype(jnp.int32)
    in_rows = jnp.where(take, gather_idx[rows_m, offs_k], v1 - 1)
    gathered = features[in_rows]                        # (C_CAP, Cin)
    wsel = weights.astype(features.dtype)[offs_k]       # (C_CAP, Cin, Cout)
    part = jnp.einsum("ci,cio->co", gathered, wsel,
                      preferred_element_type=jnp.float32
                      ).astype(out.dtype)
    part = jnp.where(take[:, None], part, 0.0)
    return out.at[rows_m].add(part)
