"""TPU microbench: packed one-hot windowed gather kernel vs XLA row gather.

Run serialized (one TPU process at a time):
    nohup python tools/bench_onehot.py > /tmp/bench_onehot.log 2>&1 &
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

from srfdet3d_tpu.ops.pallas_onehot import gather_matmul_onehot


def near_monotone_idx(rng, m, k, n, spread, miss_frac):
    base = np.sort(rng.integers(0, n, size=(m,)))
    idx = np.zeros((m, k), np.int32)
    for j in range(k):
        jitter = rng.integers(-spread, spread + 1, size=(m,))
        idx[:, j] = np.clip(base + jitter, 0, n - 1)
    miss = rng.random((m, k)) < miss_frac
    idx[miss] = n
    return idx


@jax.jit
def xla_ref(features, gather_idx, weights):
    n, cin = features.shape
    m, k = gather_idx.shape
    cout = weights.shape[2]
    feats0 = jnp.concatenate(
        [features, jnp.zeros((1, cin), features.dtype)], axis=0)
    g = feats0[gather_idx]
    out = jnp.dot(g.reshape(m, k * cin),
                  weights.astype(features.dtype).reshape(k * cin, cout),
                  preferred_element_type=jnp.float32)
    return out.astype(features.dtype)


def sync(x):
    return float(jnp.sum(x[0]))


def time_fn(fn, iters=10):
    sync(fn())  # compile
    for _ in range(2):
        sync(fn())
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        sync(fn())
        ts.append(time.perf_counter() - t0)
    return float(np.percentile(ts, 50)) * 1000


def readback_ms():
    x = jnp.zeros((8, 128))
    f = jax.jit(lambda v: v + 1)
    return time_fn(lambda: f(x))


def main():
    print("device:", jax.devices()[0], flush=True)
    rb = readback_ms()
    print(f"readback baseline: {rb:.1f} ms", flush=True)
    rng = np.random.default_rng(0)

    cases = [
        # (name, n, m, k, cin, cout)
        ("stage0", 120_000, 120_000, 27, 16, 16),
        ("stage1", 60_000, 60_000, 27, 32, 32),
        ("stage2", 30_000, 30_000, 27, 64, 64),
        ("stage3", 15_000, 15_000, 27, 128, 128),
    ]
    for name, n, m, k, cin, cout in cases:
        feats = jnp.asarray(
            rng.normal(size=(n, cin)).astype(np.float32))
        w = jnp.asarray(
            rng.normal(size=(k, cin, cout)).astype(np.float32) * 0.1)
        idx = jnp.asarray(near_monotone_idx(rng, m, k, n,
                                            spread=300, miss_frac=0.3))
        t_xla = time_fn(lambda: xla_ref(feats, idx, w))
        print(f"{name}: XLA gather+matmul {t_xla - rb:.1f} ms", flush=True)
        for dtype in (jnp.float32, jnp.bfloat16):
            f2 = feats.astype(dtype)
            for tm, wp_rows in ((512, 2048), (512, 4096)):
                pack = 128 // max(
                    16 if cin <= 16 else cin, 1)
                pack = max(pack, 1)
                wp = max(wp_rows // pack, 16)
                try:
                    for correct in (False, True):
                        t = time_fn(lambda: gather_matmul_onehot(
                            f2, idx, w, tm=tm, wp=wp, correct=correct))
                        tag = "corr" if correct else "raw "
                        print(f"{name}: onehot {dtype.__name__} tm={tm} "
                              f"wp={wp} {tag} {t - rb:.1f} ms", flush=True)
                except Exception as e:
                    print(f"{name}: onehot {dtype.__name__} tm={tm} "
                          f"wp={wp} FAILED: {str(e)[:300]}", flush=True)
        # correctness spot check on TPU (f32)
        try:
            ref = np.asarray(xla_ref(feats, idx, w))
            got = np.asarray(gather_matmul_onehot(
                feats, idx, w, tm=512, wp=max(2048 * cin // 2048, 16)))
            err = np.abs(ref - got).max()
            print(f"{name}: f32 max err vs XLA = {err:.2e}", flush=True)
        except Exception as e:
            print(f"{name}: correctness check FAILED: {str(e)[:300]}",
                  flush=True)


if __name__ == "__main__":
    main()
