"""Flagship forward: XLA gather vs one-hot Pallas gather (correctness + p50).

Runs the full srfdet_voxel_nusc_L forward twice on the same batch with the
two gather methods and reports max deviation and latency.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from __graft_entry__ import entry  # noqa: E402  (enables compile cache)
import srfdet3d_tpu.ops.sparse_conv as sc  # noqa: E402


def time_fn(fn, iters=10):
    def sync():
        lg, bx = fn()
        return float(jnp.sum(lg[-1, :, 0, 0]))

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
    forward, (variables, batch) = entry()

    # distinct function objects: jax.jit caches traces on the function id,
    # so jitting the same `forward` twice would NOT retrace after the
    # GATHER_METHOD flip
    def forward_xla(v, b):
        return forward(v, b)

    def forward_oh(v, b):
        return forward(v, b)

    sc.GATHER_METHOD = "xla"
    f_xla = jax.jit(forward_xla)
    t0 = time.perf_counter()
    out_xla = f_xla(variables, batch)
    jnp.sum(out_xla[0]).block_until_ready()
    print(f"xla compile+run {time.perf_counter() - t0:.0f}s", flush=True)
    t_xla = time_fn(lambda: f_xla(variables, batch))
    print(f"xla p50 {t_xla:.1f} ms", flush=True)

    sc.GATHER_METHOD = "onehot"
    f_oh = jax.jit(forward_oh)
    t0 = time.perf_counter()
    out_oh = f_oh(variables, batch)
    jnp.sum(out_oh[0]).block_until_ready()
    print(f"onehot compile+run {time.perf_counter() - t0:.0f}s", flush=True)
    t_oh = time_fn(lambda: f_oh(variables, batch))
    print(f"onehot p50 {t_oh:.1f} ms", flush=True)

    lg_d = float(jnp.max(jnp.abs(out_xla[0] - out_oh[0])))
    bx_d = float(jnp.max(jnp.abs(out_xla[1] - out_oh[1])))
    lg_scale = float(jnp.max(jnp.abs(out_xla[0])))
    print(f"max |dlogits| {lg_d:.3e} (scale {lg_scale:.2e}), "
          f"max |dboxes| {bx_d:.3e}", flush=True)


if __name__ == "__main__":
    main()
