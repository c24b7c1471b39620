"""Per-piece cost of the OTA guarantee-loop body at flagship-vmapped shape
(6, 1, 900, 256): argmin-over-preds, dedup compare, full step — each under
a fixed-trip fori_loop (no data-dependent cond) to get ms/iteration.

    python tools/probe_ota_body.py [iters]
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

L, B, P, G = 6, 1, 900, 256
N = int(sys.argv[1]) if len(sys.argv) > 1 else 50
rng = np.random.default_rng(0)
cost = jnp.asarray(rng.normal(size=(L, B, P, G)).astype(np.float32))
gm = jnp.zeros((L, B, G), bool).at[..., :20].set(True)
iota_p = jnp.arange(P, dtype=jnp.int32)
iota_g = jnp.arange(G, dtype=jnp.int32)


def timeit(fn, tag):
    t0 = time.perf_counter()
    float(jnp.sum(fn()))
    print(f"{tag}: compile+run {time.perf_counter() - t0:.0f}s", flush=True)
    ts = []
    for _ in range(8):
        t0 = time.perf_counter()
        float(jnp.sum(fn()))
        ts.append(time.perf_counter() - t0)
    ms = np.percentile(ts, 50) * 1000
    print(f"{tag}: p50 {ms:.1f} ms ({(ms - 27) / N:.3f} ms/iter)", flush=True)


@jax.jit
def argmin_preds(c):
    def body(i, carry):
        bump, acc = carry
        bp = jnp.argmin(c + bump[..., None], axis=-2)           # (L,B,G)
        bump = bump + (jnp.sum(bp) % 2).astype(jnp.float32)
        return bump, acc + jnp.sum(bp)
    _, acc = jax.lax.fori_loop(0, N, body,
                               (jnp.zeros((L, B, P), jnp.float32),
                                jnp.int32(0)))
    return acc


@jax.jit
def dedup_compare(c):
    best1h = (jnp.argmin(c, axis=-1)[..., None] == iota_g)      # invariant

    def body(i, carry):
        m, acc = carry
        conflicted = jnp.count_nonzero(m, axis=-1) > 1
        m2 = jnp.where(conflicted[..., None], best1h, m)
        m2 = m2 ^ (i % 2 == 0)
        return m2, acc + jnp.count_nonzero(m2)
    m0 = jnp.zeros((L, B, P, G), bool)
    _, acc = jax.lax.fori_loop(0, N, body, (m0, jnp.int32(0)))
    return acc


@jax.jit
def full_step(c):
    best1h = (jnp.argmin(c, axis=-1)[..., None] == iota_g)

    def body(i, carry):
        m, bump, acc = carry
        bump = bump + 1e5 * jnp.any(m, axis=-1).astype(jnp.float32)
        un = gm & ~jnp.any(m, axis=-2)
        bp = jnp.argmin(c + bump[..., None], axis=-2)           # (L,B,G)
        add = (bp[..., None, :] == iota_p[:, None]) & un[..., None, :]
        m = m | add
        conflicted = jnp.count_nonzero(m, axis=-1) > 1
        m = jnp.where(conflicted[..., None], best1h, m)
        return m, bump, acc + jnp.count_nonzero(m)
    m0 = jnp.zeros((L, B, P, G), bool)
    _, _, acc = jax.lax.fori_loop(
        0, N, body, (m0, jnp.zeros((L, B, P), jnp.float32), jnp.int32(0)))
    return acc


print("device:", jax.devices()[0], "N =", N, flush=True)
timeit(lambda: argmin_preds(cost), "argmin-over-preds")
timeit(lambda: dedup_compare(cost), "dedup compare")
timeit(lambda: full_step(cost), "full step body")
