"""Symmetric subm backward kernel vs the generic RMW backward kernel, on
REAL per-stage subm rulebooks at flagship shapes (one chip)."""

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

import srfdet3d_tpu.ops.sparse_conv as sc  # noqa: E402
from srfdet3d_tpu.configs import srfdet_voxel_nusc_L  # noqa: E402
from srfdet3d_tpu.ops.pallas_onehot_bwd import (  # noqa: E402
    gather_matmul_onehot_bwd, gather_matmul_onehot_symbwd)
from srfdet3d_tpu.ops.sparse_conv import (  # noqa: E402
    conv_out_shape, subm_gather_indices_batched, onehot_tile_params)


def make_stage(rng, shape, v):
    d, h, w = shape
    occ = min(v, d * h * w)
    lin = np.sort(rng.choice(d * h * w, size=occ, replace=False))
    coords = np.stack([lin // (h * w), (lin // w) % h, lin % w], -1)
    coords = np.concatenate([coords, np.zeros((v - occ, 3), np.int64)], 0)
    mask = np.arange(v) < occ
    return (jnp.asarray(coords, jnp.int32)[None], jnp.asarray(mask)[None])


def time_fn(fn, iters=10):
    float(jnp.sum(fn()))
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        float(jnp.sum(fn()))
        ts.append(time.perf_counter() - t0)
    return float(np.percentile(ts, 50)) * 1000


def main():
    print("device:", jax.devices()[0], flush=True)
    rb = time_fn(lambda: jnp.zeros(()))
    print(f"readback {rb:.1f}", flush=True)
    cfg = srfdet_voxel_nusc_L()
    spec = cfg.voxelization
    rng = np.random.default_rng(0)

    d0 = tuple(spec.sparse_shape)
    caps = cfg.middle.capacities
    shapes = [d0]
    for _ in range(3):
        shapes.append(conv_out_shape(shapes[-1], (3, 3, 3), (2, 2, 2),
                                     (1, 1, 1)))
    vlist = [spec.max_voxels, caps[0], caps[1], caps[2]]
    chans = [16, 32, 64, 128]
    k = 27

    for si, (shape, v, ch) in enumerate(zip(shapes, vlist, chans)):
        c, m = make_stage(rng, shape, v)
        sc.LOOKUP_METHOD = "dense"
        idx = jax.jit(lambda c=c, m=m, shape=shape:
                      subm_gather_indices_batched(c, m, shape, 3))()
        idx = idx.reshape(v, k)
        feats = jnp.asarray(rng.normal(size=(v, ch)).astype(np.float32))
        w = jnp.asarray(
            rng.normal(size=(k, ch, ch)).astype(np.float32) * 0.05)
        g = jnp.asarray(rng.normal(size=(v, ch)).astype(np.float32))

        _, wpb, tmb = onehot_tile_params(ch, k, bwd=True)
        t = time_fn(lambda: gather_matmul_onehot_bwd(
            feats, idx, w, g, tm=tmb, wp=wpb, correction_tiles=16)[0])
        print(f"stage{si} {ch}ch generic bwd: {t - rb:.1f} ms", flush=True)
        t = time_fn(lambda: gather_matmul_onehot_symbwd(
            feats, idx, w, g, tm=tmb, wp=wpb, correction_tiles=16)[0])
        print(f"stage{si} {ch}ch symbwd:      {t - rb:.1f} ms", flush=True)
        d_g = gather_matmul_onehot_bwd(feats, idx, w, g, tm=tmb, wp=wpb,
                                       correction_tiles=16)
        d_s = gather_matmul_onehot_symbwd(feats, idx, w, g, tm=tmb, wp=wpb,
                                          correction_tiles=16)
        e0 = float(jnp.max(jnp.abs(d_g[0] - d_s[0])))
        e1 = float(jnp.max(jnp.abs(d_g[1] - d_s[1])))
        print(f"stage{si} dfe err {e0:.2e} dw err {e1:.2e}", flush=True)


if __name__ == "__main__":
    main()
