"""Kernel v2 (grouped matmuls) vs XLA on REAL per-stage rulebooks."""

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
from srfdet3d_tpu.ops.pallas_onehot import gather_matmul_onehot
from srfdet3d_tpu.configs import srfdet_voxel_nusc_L
from tools.bench_stages import make_stage, time_fn, readback, sync


@jax.jit
def xla_conv(features, gather_idx, weights):
    b, v, cin = features.shape
    _, m, k = gather_idx.shape
    cout = weights.shape[2]
    flat = jnp.concatenate(
        [features.reshape(b * v, cin),
         jnp.zeros((1, cin), features.dtype)], axis=0)
    g = flat[gather_idx.reshape(b * m, k)]
    out = jnp.dot(g.reshape(b * m, k * cin),
                  weights.reshape(k * cin, cout),
                  preferred_element_type=jnp.float32)
    return out.astype(features.dtype).reshape(b, m, cout)


def main():
    print("device:", jax.devices()[0], flush=True)
    rb = readback()
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

    for si, (shape, v, ch) in enumerate(zip(shapes, vlist, chans)):
        c, m = make_stage(rng, shape, v)
        sc.LOOKUP_METHOD = "dense"
        gidx = jax.jit(lambda c=c, m=m, shape=shape:
                       subm_gather_indices_batched(c, m, shape, 3))()
        flat_idx = gidx.reshape(v, 27)
        for dt in (jnp.float32, jnp.bfloat16):
            feats = jnp.asarray(
                rng.normal(size=(v, ch)).astype(np.float32)).astype(dt)
            w = jnp.asarray(
                rng.normal(size=(27, ch, ch)).astype(np.float32) * 0.05)
            name = "f32" if dt == jnp.float32 else "bf16"
            t = time_fn(lambda: xla_conv(feats[None], gidx, w))
            print(f"stage{si} {ch}ch {name} xla: {t - rb:.1f} ms",
                  flush=True)
            for wrows in (1024, 2048):
                cin_pad = 1
                while cin_pad < ch or 128 % cin_pad:
                    cin_pad *= 2
                pack = 128 // min(cin_pad, 128)
                wp = max(wrows // pack, 16)
                tmb = 2_500_000 // (9 * wp * 2)
                tm = min(512, max(128, (tmb // 128) * 128))
                try:
                    t = time_fn(lambda: gather_matmul_onehot(
                        feats, flat_idx, w, tm=tm, wp=wp,
                        correction_tiles=8))
                    print(f"stage{si} {ch}ch {name} onehot w={wrows} "
                          f"tm={tm}: {t - rb:.1f} ms", flush=True)
                except Exception as e:
                    print(f"stage{si} {ch}ch {name} onehot w={wrows} "
                          f"FAILED {str(e)[:150]}", flush=True)
            if dt == jnp.float32:
                ref = np.asarray(xla_conv(feats[None], gidx, w))[0]
                got = np.asarray(gather_matmul_onehot(
                    feats, flat_idx, w, tm=tm,
                    wp=max(1024 // pack, 16), correction_tiles=8))
                print(f"stage{si} f32 max err "
                      f"{np.abs(ref - got).max():.2e}", flush=True)
                # backward: XLA autodiff vs pallas bwd kernel
                from srfdet3d_tpu.ops.pallas_onehot_bwd import (
                    gather_matmul_onehot_bwd)
                g = jnp.asarray(rng.normal(size=(v, ch)).astype(np.float32))
                bwd_ref = jax.jit(jax.grad(
                    lambda fe, we: jnp.sum(xla_conv(fe[None], gidx, we)[0]
                                           * g), argnums=(0, 1)))
                t = time_fn(lambda: bwd_ref(feats, w)[0])
                print(f"stage{si} bwd xla: {t - rb:.1f} ms", flush=True)
                try:
                    t = time_fn(lambda: gather_matmul_onehot_bwd(
                        feats, flat_idx, w, g, tm=tm,
                        wp=max(1024 // pack, 16), correction_tiles=8)[0])
                    d_ref = bwd_ref(feats, w)
                    d_k = gather_matmul_onehot_bwd(
                        feats, flat_idx, w, g, tm=tm,
                        wp=max(1024 // pack, 16), correction_tiles=8)
                    e0 = float(jnp.max(jnp.abs(d_ref[0] - d_k[0])))
                    e1 = float(jnp.max(jnp.abs(d_ref[1] - d_k[1])))
                    print(f"stage{si} bwd onehot: {t - rb:.1f} ms "
                          f"(dfe err {e0:.2e}, dw err {e1:.2e})", flush=True)
                except Exception as e:
                    print(f"stage{si} bwd onehot FAILED {str(e)[:200]}",
                          flush=True)


if __name__ == "__main__":
    main()
