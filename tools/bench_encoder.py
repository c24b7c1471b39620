"""Full-forward sweep: gather method x rulebook method on the flagship.

Times the complete forward for each combination and, for deviation
localization, captures per-submodule intermediates and reports the max
deviation at the middle-encoder boundary vs the final logits.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from __graft_entry__ import entry  # noqa: E402  (compile cache on)
import srfdet3d_tpu.ops.sparse_conv as sc  # noqa: E402


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


def max_diff(tree_a, tree_b):
    leaves_a = jax.tree.leaves(tree_a)
    leaves_b = jax.tree.leaves(tree_b)
    return max(float(jnp.max(jnp.abs(a.astype(jnp.float32) -
                                     b.astype(jnp.float32))))
               for a, b in zip(leaves_a, leaves_b))


def main():
    print("device:", jax.devices()[0], flush=True)
    forward, (variables, batch) = entry()

    from srfdet3d_tpu.models.detector import SRFDet
    from srfdet3d_tpu.configs import srfdet_voxel_nusc_L
    model = SRFDet(srfdet_voxel_nusc_L())

    def mid_filter(mdl, _):
        return mdl.name == "pts_middle_encoder"

    results = {}
    for gather, lookup in (("xla", "dense"), ("onehot", "dense"),
                           ("onehot", "pallas"), ("xla", "pallas")):
        sc.GATHER_METHOD = gather
        sc.LOOKUP_METHOD = lookup

        def f(v, b, _g=gather, _l=lookup):   # distinct ids per variant
            return model.apply(v, b, train=False)

        def f_cap(v, b, _g=gather, _l=lookup):
            return model.apply(v, b, train=False,
                               capture_intermediates=mid_filter)

        try:
            jf = jax.jit(f)
            t0 = time.perf_counter()
            out = jf(variables, batch)
            jnp.sum(out[0]).block_until_ready()
            cs = time.perf_counter() - t0
            t = time_fn(lambda: jf(variables, batch))
            (_, mids) = jax.jit(f_cap)(variables, batch)
            results[(gather, lookup)] = (out, mids["intermediates"], t)
            print(f"{gather}/{lookup}: p50 {t:.1f} ms (compile {cs:.0f}s)",
                  flush=True)
        except Exception as e:
            print(f"{gather}/{lookup} FAILED: {str(e)[:400]}", flush=True)

    if ("xla", "dense") in results:
        base_out, base_mid, _ = results[("xla", "dense")]
        for key, (out, mid, _) in results.items():
            if key == ("xla", "dense"):
                continue
            d_mid = max_diff(mid, base_mid)
            d_log = float(jnp.max(jnp.abs(out[0] - base_out[0])))
            print(f"{key}: middle-encoder max diff {d_mid:.3e}, "
                  f"logits max diff {d_log:.3e}", flush=True)


if __name__ == "__main__":
    main()
