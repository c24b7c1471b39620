"""Point-branch benchmark: voxelize -> VFE -> sparse encoder -> SECOND+FPN.

Sweeps gather method x rulebook method on the flagship config and reports
p50 latency + max BEV-output deviation vs the XLA/dense baseline.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from __graft_entry__ import entry, _synthetic_batch  # noqa: E402
import srfdet3d_tpu.ops.sparse_conv as sc  # noqa: E402
from srfdet3d_tpu.models.detector import SRFDet  # noqa: E402
from srfdet3d_tpu.configs import srfdet_voxel_nusc_L  # noqa: E402


def time_fn(fn, iters=10):
    def sync():
        out = fn()
        return float(jnp.sum(out[0]))

    sync()
    for _ in range(2):
        sync()
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        sync()
        ts.append(time.perf_counter() - t0)
    return float(np.percentile(ts, 50)) * 1000


def main():
    print("device:", jax.devices()[0], flush=True)
    cfg = srfdet_voxel_nusc_L()
    batch = _synthetic_batch(cfg, batch_size=1)
    model = SRFDet(cfg)
    variables = jax.jit(lambda r, b: model.init(r, b, train=False))(
        jax.random.PRNGKey(0), batch)
    pts, msk = batch["points"], batch["points_mask"]

    def run(gather, lookup):
        sc.GATHER_METHOD = gather
        sc.LOOKUP_METHOD = lookup

        def f(v, p, m):
            return model.apply(v, p, m, False,
                               method=SRFDet.extract_point_features)

        jf = jax.jit(f)
        t0 = time.perf_counter()
        out = jf(variables, pts, msk)
        jnp.sum(out[0]).block_until_ready()
        compile_s = time.perf_counter() - t0
        t = time_fn(lambda: jf(variables, pts, msk))
        return out, t, compile_s

    base, t_base, c0 = run("xla", "dense")
    print(f"xla/dense: p50 {t_base:.1f} ms (compile {c0:.0f}s)", flush=True)
    for gather, lookup in (("onehot", "dense"), ("onehot", "pallas"),
                           ("xla", "pallas")):
        try:
            out, t, cs = run(gather, lookup)
            d = max(float(jnp.max(jnp.abs(o - b)))
                    for o, b in zip(out, base))
            print(f"{gather}/{lookup}: p50 {t:.1f} ms (compile {cs:.0f}s) "
                  f"max BEV diff {d:.3e}", flush=True)
        except Exception as e:
            print(f"{gather}/{lookup} FAILED: {str(e)[:400]}", flush=True)


if __name__ == "__main__":
    main()
