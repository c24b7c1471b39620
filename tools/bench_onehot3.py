"""TPU round 3: bf16 kernel lowering fix + correction-v2 timing."""

import os
import sys
import time
import traceback

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from srfdet3d_tpu.ops.pallas_onehot import gather_matmul_onehot
from tools.bench_onehot import near_monotone_idx, xla_ref, time_fn, readback_ms


def main():
    print("device:", jax.devices()[0], flush=True)
    rb = readback_ms()
    print(f"readback: {rb:.1f} ms", flush=True)
    rng = np.random.default_rng(0)
    n = m = 120_000
    k, cin, cout = 27, 16, 16
    feats = jnp.asarray(rng.normal(size=(n, cin)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(k, cin, cout)).astype(np.float32) * 0.1)
    idx = jnp.asarray(near_monotone_idx(rng, m, k, n,
                                        spread=300, miss_frac=0.3))
    ref = np.asarray(xla_ref(feats, idx, w))

    for tiles in (8, 16, 64):
        t = time_fn(lambda: gather_matmul_onehot(
            feats, idx, w, tm=512, wp=256, correction_tiles=tiles))
        got = np.asarray(gather_matmul_onehot(
            feats, idx, w, tm=512, wp=256, correction_tiles=tiles))
        print(f"f32 corr-v3 tiles={tiles}: {t - rb:.1f} ms, "
              f"max err {np.abs(got - ref).max():.2e}", flush=True)

    try:
        f2 = feats.astype(jnp.bfloat16)
        t_raw = time_fn(lambda: gather_matmul_onehot(
            f2, idx, w, tm=512, wp=256, correct=False))
        t_cor = time_fn(lambda: gather_matmul_onehot(
            f2, idx, w, tm=512, wp=256, correction_tiles=16))
        got = np.asarray(gather_matmul_onehot(
            f2, idx, w, tm=512, wp=256, correction_tiles=16), np.float32)
        print(f"bf16 raw {t_raw - rb:.1f} ms, corr {t_cor - rb:.1f} ms, "
              f"max err vs f32 {np.abs(got - ref).max():.2e}", flush=True)
        t_xla_bf16 = time_fn(lambda: xla_ref(f2, idx, w))
        print(f"bf16 XLA gather {t_xla_bf16 - rb:.1f} ms", flush=True)
    except Exception:
        traceback.print_exc()


if __name__ == "__main__":
    main()
