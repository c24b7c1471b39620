"""Voxelizer sort variants at flagship scale (262,144 points).

The voxelizer's (key, idx) lax.sort is ~2/3 of its 16.8 ms.  Variants:
  pair      lax.sort((int32 key, int32 idx))        — shipped
  u64       lax.sort(key << 18 | idx) single array  — one comparator
  u32rank   sort key only + derive idx via stable rank reconstruction

    python tools/bench_voxsort.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from tools.bench_encoder_grad_parts import _time  # noqa: E402

P = 262144


def main():
    rng = np.random.default_rng(0)
    key = jnp.asarray(rng.integers(0, 89_000_000, P).astype(np.int32))
    idx = jnp.arange(P, dtype=jnp.int32)

    @jax.jit
    def pair(key, idx):
        sk, si = jax.lax.sort((key, idx), num_keys=1)
        return jnp.sum(sk) + jnp.sum(si)

    @jax.jit
    def u64(key, idx):
        k64 = (key.astype(jnp.int64) << 18) | idx.astype(jnp.int64)
        s = jax.lax.sort(k64)
        sk = (s >> 18).astype(jnp.int32)
        si = (s & ((1 << 18) - 1)).astype(jnp.int32)
        return jnp.sum(sk) + jnp.sum(si)

    @jax.jit
    def key_only(key):
        return jnp.sum(jax.lax.sort(key))

    print(f"device {jax.devices()[0]}", flush=True)
    print(f"pair sort: {_time(lambda: pair(key, idx), 'x'):.2f} ms",
          flush=True)
    print(f"u64 sort: {_time(lambda: u64(key, idx), 'x'):.2f} ms",
          flush=True)
    print(f"key-only sort: {_time(lambda: key_only(key), 'x'):.2f} ms",
          flush=True)


if __name__ == "__main__":
    main()
