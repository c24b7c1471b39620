"""Grad-path localization for the sparse encoder: bitmap vs table backends.

Times value_and_grad of the FLAGSHIP-scale sparse encoder alone (sum-of-
output loss), per rulebook backend and gather method, to localize train-
step regressions to the encoder backward vs the rest of the train graph.

    python tools/bench_encoder_grad.py [bitmap|table ...] [xla|onehot]
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
from srfdet3d_tpu.configs import srfdet_voxel_nusc_L  # noqa: E402
from srfdet3d_tpu.models.sparse_encoder import SparseEncoder  # noqa: E402


def main():
    backends = (sys.argv[1].split(",") if len(sys.argv) > 1
                else ["bitmap", "table"])
    gather = sys.argv[2] if len(sys.argv) > 2 else "onehot"
    sc.GATHER_METHOD = gather
    sc.ONEHOT_BWD = gather
    cfg = srfdet_voxel_nusc_L()
    mid = cfg.middle
    print("device:", jax.devices()[0], "gather:", gather, flush=True)

    d = int(round((cfg.pc_range[5] - cfg.pc_range[2]) / cfg.voxel_size[2])) + 1
    h = int(round((cfg.pc_range[4] - cfg.pc_range[1]) / cfg.voxel_size[1]))
    w = int(round((cfg.pc_range[3] - cfg.pc_range[0]) / cfg.voxel_size[0]))
    v = cfg.voxels_cap
    rng = np.random.default_rng(0)
    # unique voxel coords at full occupancy (like the real voxelizer output)
    flat = rng.choice(d * h * w, size=v, replace=False).astype(np.int64)
    coords = np.stack([flat // (h * w), (flat // w) % h, flat % w],
                      axis=-1).astype(np.int32)[None]
    feats = rng.normal(size=(1, v, mid.in_channels)).astype(np.float32)
    mask = np.ones((1, v), bool)
    batch = (jnp.asarray(feats), jnp.asarray(coords), jnp.asarray(mask))
    print(f"grid ({d},{h},{w}) voxels {v}", flush=True)

    for backend in backends:
        enc = SparseEncoder(
            in_channels=mid.in_channels, sparse_shape=(d, h, w),
            base_channels=mid.base_channels,
            output_channels=mid.output_channels,
            encoder_channels=mid.encoder_channels,
            encoder_paddings=mid.encoder_paddings,
            block_type=mid.block_type, capacities=mid.capacities,
            rulebook=backend)
        variables = jax.jit(lambda f, c, m: enc.init(
            jax.random.PRNGKey(0), f, c, m, train=False))(*batch)

        def loss_fn(params, f, c, m):
            out, _ = enc.apply(
                {"params": params,
                 "batch_stats": variables.get("batch_stats", {})},
                f, c, m, train=True, mutable=["batch_stats"])
            return jnp.sum(out.astype(jnp.float32))

        fwd = jax.jit(lambda p, f, c, m: loss_fn(p, f, c, m))
        grad = jax.jit(jax.value_and_grad(loss_fn))

        for tag, fn in (("fwd", lambda: fwd(variables["params"], *batch)),
                        ("grad", lambda: grad(variables["params"], *batch))):
            t0 = time.perf_counter()
            out = fn()
            val = out[0] if tag == "grad" else out
            float(val)  # host readback = true sync
            print(f"{backend} {tag}: compile+run "
                  f"{time.perf_counter() - t0:.0f}s", flush=True)
            ts = []
            for _ in range(6):
                t0 = time.perf_counter()
                out = fn()
                val = out[0] if tag == "grad" else out
                float(val)
                ts.append(time.perf_counter() - t0)
            print(f"{backend} {tag}: p50 "
                  f"{np.percentile(ts, 50) * 1000:.1f} ms", flush=True)


if __name__ == "__main__":
    main()
