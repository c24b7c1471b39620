"""Rulebook v2 (wide-lane windows) vs dense table, plus sort microbench."""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import srfdet3d_tpu.ops.sparse_conv as sc
from srfdet3d_tpu.ops.sparse_conv import (
    subm_gather_indices_batched, conv_out_shape)
from srfdet3d_tpu.configs import srfdet_voxel_nusc_L
from tools.bench_stages import make_stage, time_fn, readback


def main():
    print("device:", jax.devices()[0], flush=True)
    rb = readback()
    print(f"readback {rb:.1f}", flush=True)
    cfg = srfdet_voxel_nusc_L()
    spec = cfg.voxelization
    rng = np.random.default_rng(0)

    # sort microbench: output-site scale
    for n in (960_000, 262_144):
        xi = jnp.asarray(rng.integers(0, 1 << 23, n).astype(np.int32))
        xf = xi.astype(jnp.float32)
        tsi = time_fn(lambda: jnp.sort(xi))
        tsf = time_fn(lambda: jnp.sort(xf))
        # argsort variant (voxelizer uses sort of keys + payload)
        tai = time_fn(lambda: jnp.argsort(xi))
        print(f"sort {n}: int32 {tsi - rb:.1f} ms, f32 {tsf - rb:.1f} ms, "
              f"argsort i32 {tai - rb:.1f} ms", flush=True)

    d0 = tuple(spec.sparse_shape)
    caps = cfg.middle.capacities
    shapes = [d0]
    for _ in range(3):
        shapes.append(conv_out_shape(shapes[-1], (3, 3, 3), (2, 2, 2),
                                     (1, 1, 1)))
    vlist = [spec.max_voxels, caps[0], caps[1], caps[2]]

    for si, (shape, v) in enumerate(zip(shapes, vlist)):
        c, m = make_stage(rng, shape, v)
        ref = None
        for lookup in ("dense", "pallas"):
            sc.LOOKUP_METHOD = lookup

            def rb_fn(c=c, m=m, shape=shape, _l=lookup):
                return subm_gather_indices_batched(c, m, shape, 3)

            try:
                jf = jax.jit(rb_fn)
                out = jf()
                t = time_fn(lambda: jf())
                if ref is None:
                    ref = np.asarray(out)
                    d = 0
                else:
                    d = int((np.asarray(out) != ref).sum())
                print(f"stage{si} rulebook [{lookup}]: {t - rb:.1f} ms, "
                      f"mismatches {d}", flush=True)
            except Exception as e:
                print(f"stage{si} rulebook [{lookup}] FAILED {str(e)[:200]}",
                      flush=True)


if __name__ == "__main__" and not os.environ.get("SPLIT"):
    main()


def split_bench():
    """Split dense-table rulebook cost: build vs lookup, and the
    3-consecutive-cell slice-gather variant."""
    print("== split ==", flush=True)
    rb = readback()
    cfg = srfdet_voxel_nusc_L()
    spec = cfg.voxelization
    rng = np.random.default_rng(0)
    shape = tuple(spec.sparse_shape)
    d, h, w = shape
    cells = d * h * w
    v = spec.max_voxels
    c, m = make_stage(rng, shape, v)
    from srfdet3d_tpu.ops.sparse_conv import (
        _key, _offsets, subm_gather_indices_batched)
    keys = jax.vmap(lambda cc, mm: _key(cc, shape, mm))(c, m)

    # flat (1D) cell table for the historical variants below; the shipped
    # path now uses the haloed 2D table (sparse_conv._build_dense_table)
    def build_flat(k):
        gk = jnp.where(k[0] < cells, k[0], cells)
        t_ = jnp.full((cells + 1,), v, jnp.int32)
        return t_.at[gk].set(jnp.arange(v, dtype=jnp.int32), mode="drop")

    build = jax.jit(build_flat)
    t = time_fn(lambda: build(keys))
    print(f"stage0 table build: {t - rb:.1f} ms", flush=True)
    table = build(keys)

    jreal = jax.jit(lambda cc, mm: subm_gather_indices_batched(
        cc, mm, shape, 3))
    t = time_fn(lambda: jreal(c, m))
    print(f"stage0 SHIPPED subm rulebook (2D 3x3 slices): {t - rb:.1f} ms",
          flush=True)

    offs = np.asarray(_offsets((3, 3, 3))) - 1          # (27, 3)
    coords = c[0]

    def lookup27(table, coords, mask):
        nc = coords[:, None, :] + jnp.asarray(offs)[None]
        in_rng = ((nc >= 0).all(-1) & (nc[..., 0] < d) &
                  (nc[..., 1] < h) & (nc[..., 2] < w))
        nk = (nc[..., 0] * h + nc[..., 1]) * w + nc[..., 2]
        nk = jnp.where(in_rng & mask[:, None], nk, cells)
        hit = table[jnp.minimum(nk, cells)]
        return jnp.where(nk < cells, hit, v)

    jl27 = jax.jit(lookup27)
    t = time_fn(lambda: jl27(table, coords, m[0]))
    print(f"stage0 lookup 27-single: {t - rb:.1f} ms", flush=True)

    def lookup9(table, coords, mask):
        key = (coords[:, 0] * h + coords[:, 1]) * w + coords[:, 2]
        # leading miss cell: valid-row starts land at >= 0 after +1 and
        # boundary windows stay aligned (start = center - 1 can be -1)
        table1 = jnp.concatenate([jnp.full((1,), v, table.dtype), table])
        outs = []
        for dz in (-1, 0, 1):
            for dy in (-1, 0, 1):
                start = key + dz * h * w + dy * w
                sl = jax.vmap(
                    lambda s: jax.lax.dynamic_slice(table1, (s,), (3,)))(
                    jnp.clip(start, 0, cells - 1))
                outs.append(sl)
        out = jnp.stack(outs, 1).reshape(-1, 27)
        # validity mask identical to lookup27
        nc = coords[:, None, :] + jnp.asarray(offs)[None]
        in_rng = ((nc >= 0).all(-1) & (nc[..., 0] < d) &
                  (nc[..., 1] < h) & (nc[..., 2] < w))
        return jnp.where(in_rng & mask[:, None], out, v)

    jl9 = jax.jit(lookup9)
    t = time_fn(lambda: jl9(table, coords, m[0]))
    print(f"stage0 lookup 9-slice3: {t - rb:.1f} ms", flush=True)
    a = np.asarray(jl27(table, coords, m[0]))
    b = np.asarray(jl9(table, coords, m[0]))
    print(f"mismatches {(a != b).sum()}", flush=True)


if __name__ == "__main__" and os.environ.get("SPLIT"):
    split_bench()
