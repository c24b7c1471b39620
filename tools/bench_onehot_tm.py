"""Sweep the one-hot kernels' tile size (tm) at real stage layouts.

ONEHOT_TM caps tm at 512 globally, but the 2.5 MB VMEM budget in
onehot_tile_params allows tm up to ~1600 at cin=16 (bwd) / ~3200 (fwd).
The kernels look grid-step-latency-bound (stage0 bwd: 2115 sequential
(tile, group) steps at tm=512) — fewer, bigger tiles may be a direct win.
Times fwd + bwd at stage-0/1 layouts for tm in {512, 1024, 1536} and
checks exactness vs the XLA path at each setting.

    python tools/bench_onehot_tm.py [stage_indices e.g. 0,1]
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

import srfdet3d_tpu.ops.sparse_conv as sc  # noqa: E402
from srfdet3d_tpu.ops.sparse_conv import (  # noqa: E402
    subm_gather_indices_batched, conv_out_shape)
from srfdet3d_tpu.ops.pallas_onehot import gather_matmul_onehot  # noqa: E402
from srfdet3d_tpu.ops.pallas_onehot_bwd import (  # noqa: E402
    gather_matmul_onehot_bwd)
from srfdet3d_tpu.configs import srfdet_voxel_nusc_L  # noqa: E402
from tools.bench_stages import make_stage, time_fn, readback  # noqa: E402
from tools.bench_convs import xla_conv  # noqa: E402


def main():
    which = ([int(x) for x in sys.argv[1].split(",")]
             if len(sys.argv) > 1 else [0, 1])
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

    for si in which:
        shape, v, ch = shapes[si], vlist[si], chans[si]
        c, m = make_stage(rng, shape, v)
        sc.LOOKUP_METHOD = "dense"
        gidx = jax.jit(lambda c=c, m=m, shape=shape:
                       subm_gather_indices_batched(c, m, shape, 3))()
        flat_idx = gidx.reshape(v, 27)
        feats = jnp.asarray(rng.normal(size=(v, ch)).astype(np.float32))
        w = jnp.asarray(
            rng.normal(size=(27, ch, ch)).astype(np.float32) * 0.05)
        g = jnp.asarray(rng.normal(size=(v, ch)).astype(np.float32))

        cin_pad = 1
        while cin_pad < ch or 128 % cin_pad:
            cin_pad *= 2
        pack = 128 // min(cin_pad, 128)

        ref = np.asarray(xla_conv(feats[None], gidx, w))[0]
        bwd_ref = jax.jit(jax.grad(
            lambda fe, we: jnp.sum(xla_conv(fe[None], gidx, we)[0] * g),
            argnums=(0, 1)))
        d_ref = bwd_ref(feats, w)

        # window must cover the tile's key span (~tm/pack packed rows)
        # plus the offset-group slack (~32 packed rows measured on real
        # rulebooks); snap to 8-row multiples
        for tm in (512, 1024, 1536):
            wp = max(1024 // pack, 16, ((tm // pack + 64 + 7) // 8) * 8)
            vb = 3 * tm * wp * 4
            tag = f"tm={tm} wp={wp} ({vb / 1e6:.1f}MB)"
            try:
                t = time_fn(lambda tm=tm, wp=wp: gather_matmul_onehot(
                    feats, flat_idx, w, tm=tm, wp=wp, correction_tiles=8))
                got = np.asarray(gather_matmul_onehot(
                    feats, flat_idx, w, tm=tm, wp=wp, correction_tiles=8))
                err = np.abs(ref - got).max()
                print(f"stage{si} {ch}ch fwd {tag}: {t - rb:.1f} ms "
                      f"(err {err:.2e})", flush=True)
            except Exception as e:
                print(f"stage{si} fwd {tag} FAILED {str(e)[:150]}",
                      flush=True)
            try:
                t = time_fn(lambda tm=tm, wp=wp: gather_matmul_onehot_bwd(
                    feats, flat_idx, w, g, tm=tm, wp=wp,
                    correction_tiles=8)[0])
                d_k = gather_matmul_onehot_bwd(
                    feats, flat_idx, w, g, tm=tm, wp=wp, correction_tiles=8)
                e0 = float(jnp.max(jnp.abs(d_ref[0] - d_k[0])))
                e1 = float(jnp.max(jnp.abs(d_ref[1] - d_k[1])))
                print(f"stage{si} {ch}ch bwd {tag}: {t - rb:.1f} ms "
                      f"(dfe err {e0:.2e}, dw err {e1:.2e})", flush=True)
            except Exception as e:
                print(f"stage{si} bwd {tag} FAILED {str(e)[:150]}",
                      flush=True)


if __name__ == "__main__":
    main()
