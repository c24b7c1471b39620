"""Per-stage attribution at flagship shapes: voxelize, rulebooks (dense vs
pallas), gathered convs (xla vs onehot), output-site generation.

Latencies are shape-driven (static capacities), so standalone ops at the
real shapes attribute the full-forward time well.
"""

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
    subm_gather_indices_batched, strided_gather_indices_batched,
    generate_output_sites, gathered_conv_apply_batched, SparseTensor,
    conv_out_shape, make_key_table)
from srfdet3d_tpu.ops.voxelize import voxelize_points
from srfdet3d_tpu.configs import srfdet_voxel_nusc_L


def sync(x):
    return float(jnp.sum(jnp.asarray(x, jnp.float32).ravel()[:64]))


def time_fn(fn, iters=8):
    sync(fn())
    for _ in range(2):
        sync(fn())
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        sync(fn())
        ts.append(time.perf_counter() - t0)
    return float(np.percentile(ts, 50)) * 1000


def readback():
    f = jax.jit(lambda v: v + 1)
    x = jnp.zeros((8, 128))
    return time_fn(lambda: f(x))


def make_stage(rng, shape, v, seed_frac=1.0):
    """Random sorted active coords at the given occupancy."""
    d, h, w = shape
    cells = d * h * w
    n = min(v, cells)
    keys = np.sort(rng.choice(cells, size=n, replace=False))
    coords = np.stack([keys // (h * w), (keys // w) % h, keys % w],
                      -1).astype(np.int32)
    c = np.zeros((1, v, 3), np.int32)
    c[0, :n] = coords
    m = np.zeros((1, v), bool)
    m[0, :n] = True
    return jnp.asarray(c), jnp.asarray(m)


def main():
    print("device:", jax.devices()[0], flush=True)
    rb = readback()
    print(f"readback {rb:.1f} ms", flush=True)
    cfg = srfdet_voxel_nusc_L()
    spec = cfg.voxelization
    rng = np.random.default_rng(0)

    # 1. voxelizer at flagship caps
    p = cfg.points_cap
    pts = np.zeros((1, p, cfg.points_dim), np.float32)
    lo, hi = cfg.pc_range[:3], cfg.pc_range[3:6]
    nr = p // 2
    pts[0, :nr, 0] = rng.uniform(lo[0], hi[0], nr)
    pts[0, :nr, 1] = rng.uniform(lo[1], hi[1], nr)
    pts[0, :nr, 2] = rng.uniform(lo[2], hi[2], nr)
    msk = np.zeros((1, p), bool)
    msk[0, :nr] = True
    jpts, jmsk = jnp.asarray(pts), jnp.asarray(msk)
    vox_fn = jax.jit(lambda a, b: jax.vmap(
        lambda x, y: voxelize_points(x, y, spec))(a, b))
    t = time_fn(lambda: vox_fn(jpts, jmsk).voxel_coords)
    print(f"voxelize: {t - rb:.1f} ms", flush=True)

    # stages: (shape, V, cin, cout, n_subm_convs)
    d0 = tuple(spec.sparse_shape)
    caps = cfg.middle.capacities
    shapes = [d0]
    for _ in range(3):
        shapes.append(conv_out_shape(shapes[-1], (3, 3, 3), (2, 2, 2),
                                     (1, 1, 1)))
    vlist = [spec.max_voxels, caps[0], caps[1], caps[2]]
    chans = [16, 32, 64, 128]

    coords_all = []
    for s, v in zip(shapes, vlist):
        coords_all.append(make_stage(rng, s, v))

    # 'pallas' lookup is opt-in and not shipped; its kernel compile takes
    # tens of minutes through the remote compiler — bench only on demand
    lookups = ("dense", "pallas") if os.environ.get("BENCH_PALLAS_RB") \
        else ("dense",)
    for si, (shape, v, ch) in enumerate(zip(shapes, vlist, chans)):
        c, m = coords_all[si]
        for lookup in lookups:
            sc.LOOKUP_METHOD = lookup

            def rb_fn(c=c, m=m, shape=shape):
                return subm_gather_indices_batched(c, m, shape, 3)

            try:
                jf = jax.jit(rb_fn)
                t = time_fn(lambda: jf())
                print(f"stage{si} subm rulebook [{lookup}]: {t - rb:.1f} ms",
                      flush=True)
            except Exception as e:
                print(f"stage{si} rulebook [{lookup}] FAILED {str(e)[:200]}",
                      flush=True)
        sc.LOOKUP_METHOD = "dense"
        gidx = jax.jit(lambda c=c, m=m, shape=shape:
                       subm_gather_indices_batched(c, m, shape, 3))()
        feats = jnp.asarray(rng.normal(size=(1, v, ch)).astype(np.float32))
        w = jnp.asarray(
            rng.normal(size=(27, ch, ch)).astype(np.float32) * 0.05)
        for gather in ("xla", "onehot"):
            sc.GATHER_METHOD = gather

            def conv_fn(f=feats, g=gidx, w=w, _m=gather):
                return gathered_conv_apply_batched(f, g, w)

            try:
                jf = jax.jit(conv_fn)
                t = time_fn(lambda: jf())
                print(f"stage{si} conv {ch}ch [{gather}]: {t - rb:.1f} ms",
                      flush=True)
            except Exception as e:
                print(f"stage{si} conv [{gather}] FAILED {str(e)[:200]}",
                      flush=True)

        # output-site generation (the sort)
        if si < 3:
            def sites_fn(c=c, m=m, shape=shape, cap=caps[si]):
                return jax.vmap(lambda cc, mm: generate_output_sites(
                    SparseTensor(jnp.zeros((cc.shape[0], 1)), cc, mm, shape),
                    (3, 3, 3), (2, 2, 2), (1, 1, 1), cap))(c, m)[0]

            jf = jax.jit(sites_fn)
            t = time_fn(lambda: jf())
            print(f"stage{si} output sites: {t - rb:.1f} ms", flush=True)


if __name__ == "__main__":
    main()
