"""Probe for the column-form (z-dense, plan-sparse) encoder design.

Questions this answers on real hardware (one v5e chip):
  1. XLA row-gather effective bandwidth at COLUMN row widths (~1.3 KB)
     vs the known ~30 GB/s at 32-512 B rows — the design's linchpin.
  2. Cost of the z-banded column conv in several XLA lowerings
     (einsum over (k,c) with shifted z-windows / pre-transpose + sliced
     matmuls / NHWC conv_general_dilated).
  3. Plan-table (2D) slice3 rulebook cost vs the 3D one.
  4. The plan-key sort that builds columns from voxels.

Shapes = nuScenes flagship stage 0: V=120k voxels, grid (41, 1472, 1472),
C=16; assume worst case 1 voxel/column (P=120k columns).
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

ITERS = 10


def stream_ms(fn, *args):
    # reduce on device so streamed iterates don't accumulate HBM
    red = jax.jit(lambda *a: jnp.sum(
        jax.tree_util.tree_leaves(fn(*a))[0].astype(jnp.float32)))

    def burst(n):
        t0 = time.perf_counter()
        outs = [red(*args) for _ in range(n)]
        s = float(jnp.stack(outs).sum())
        assert np.isfinite(s)
        return (time.perf_counter() - t0) / n * 1000

    jax.block_until_ready(red(*args))
    burst(4)
    burst(4)
    return min(burst(ITERS), burst(ITERS))


def main():
    print("device:", jax.devices()[0], flush=True)
    rng = np.random.default_rng(0)
    P, Z, C = 120_000, 41, 16
    D, H, W = 41, 1472, 1472

    # --- 1. gather bandwidth vs row width ------------------------------
    for rows, width, tag in (
            (P * 9, Z * C, "column 9-nbr (1312B rows)"),
            (P * 9, 4 * C, "narrow 9-nbr (128B rows)"),
            (P * 27, 2 * C, "current 27-nbr (64B rows)")):
        table = jnp.asarray(
            rng.normal(size=(P + 1, width)).astype(np.float32)
        ).astype(jnp.bfloat16)
        idx = jnp.asarray(rng.integers(0, P, size=(rows,)).astype(np.int32))
        f = jax.jit(lambda t, i: t[i])
        t = stream_ms(f, table, idx)
        gb = rows * width * 2 / 1e9
        print(f"gather {tag}: {t:.2f} ms  ({gb:.2f} GB -> "
              f"{gb / (t / 1e3):.0f} GB/s, {t * 1e6 / rows:.1f} ns/row)",
              flush=True)

    # near-diagonal indices (plan-sorted neighbors) vs random
    span = 2000
    base = jnp.asarray(np.repeat(np.arange(P), 9).astype(np.int32))
    jitter = jnp.asarray(rng.integers(-span, span, size=(P * 9,))
                         .astype(np.int32))
    idx_nd = jnp.clip(base + jitter, 0, P - 1)
    table = jnp.asarray(rng.normal(size=(P + 1, Z * C)).astype(np.float32)
                        ).astype(jnp.bfloat16)
    f = jax.jit(lambda t, i: t[i])
    t = stream_ms(f, table, idx_nd)
    gb = P * 9 * Z * C * 2 / 1e9
    print(f"gather column near-diag: {t:.2f} ms ({gb / (t/1e3):.0f} GB/s)",
          flush=True)

    # --- 2. column conv lowerings --------------------------------------
    g = jnp.asarray(rng.normal(size=(P, 9, Z + 2, C)).astype(np.float32)
                    ).astype(jnp.bfloat16)
    w = jnp.asarray(rng.normal(size=(3, 9, C, C)).astype(np.float32) * 0.1
                    ).astype(jnp.bfloat16)

    def conv_einsum(g, w):
        out = 0
        for dz in range(3):
            out = out + jnp.einsum(
                "pkzc,kcd->pzd", g[:, :, dz:dz + Z, :], w[dz],
                preferred_element_type=jnp.float32)
        return out.astype(jnp.bfloat16)

    def conv_transpose(g, w):
        t = g.transpose(0, 2, 1, 3).reshape(P, Z + 2, 9 * C)
        out = 0
        for dz in range(3):
            out = out + jnp.dot(
                t[:, dz:dz + Z, :].reshape(P * Z, 9 * C),
                w[dz].reshape(9 * C, C),
                preferred_element_type=jnp.float32)
        return out.astype(jnp.bfloat16)

    def conv_nhwc(g, w):
        # N=P, H=9 (valid), W=Z+2 (valid -> Z), C
        out = jax.lax.conv_general_dilated(
            g, w.transpose(1, 0, 2, 3),          # (9, 3, C, C) HWIO
            window_strides=(1, 1), padding="VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32)
        return out.astype(jnp.bfloat16)

    for name, fn in (("einsum(k,c) x3", conv_einsum),
                     ("transpose+matmul x3", conv_transpose),
                     ("conv NHWC", conv_nhwc)):
        try:
            jf = jax.jit(fn)
            t = stream_ms(jf, g, w)
            print(f"column conv [{name}]: {t:.2f} ms", flush=True)
        except Exception as e:
            print(f"column conv [{name}] FAILED: {str(e)[:160]}", flush=True)

    # fused gather+conv (what a stage conv actually runs)
    cols = jnp.asarray(rng.normal(size=(P + 1, Z * C)).astype(np.float32)
                       ).astype(jnp.bfloat16)
    gidx = idx_nd.reshape(P, 9)

    def fused(cols, gidx, w):
        gg = cols[gidx].reshape(P, 9, Z, C)
        gg = jnp.pad(gg, ((0, 0), (0, 0), (1, 1), (0, 0)))
        return conv_einsum(gg, w)

    t = stream_ms(jax.jit(fused), cols, gidx, w)
    print(f"fused gather+einsum conv: {t:.2f} ms", flush=True)

    # --- 3. plan rulebook: 3 slice3 gathers into an (H*W+1,) table -----
    plan_cells = H * W
    ptable = jnp.zeros((plan_cells + 1,), jnp.int32)
    pkeys = jnp.asarray(np.sort(rng.choice(plan_cells, size=P, replace=False))
                        .astype(np.int32))
    ptable = ptable.at[pkeys].set(jnp.arange(P, dtype=jnp.int32))

    def plan_rb(ptable, pkeys):
        t1 = jnp.concatenate([jnp.full((1,), P, jnp.int32), ptable])
        rows = []
        for dy in (-1, 0, 1):
            starts = jnp.clip(pkeys + dy * W - 1 + 1, 0, plan_cells - 1)
            rows.append(jax.vmap(
                lambda s: jax.lax.dynamic_slice(t1, (s,), (3,)))(starts))
        return jnp.stack(rows, 1).reshape(P, 9)

    t = stream_ms(jax.jit(plan_rb), ptable, pkeys)
    print(f"plan slice3 rulebook (9 nbrs): {t:.2f} ms", flush=True)

    # --- 4. plan-key sort (columns_from_voxels) ------------------------
    keys = jnp.asarray(rng.integers(0, plan_cells, size=(P,))
                       .astype(np.int32))
    payload = jnp.arange(P, dtype=jnp.int32)
    f = jax.jit(lambda k, p: jax.lax.sort((k, p), num_keys=1))
    t = stream_ms(f, keys, payload)
    print(f"120k key+payload sort: {t:.2f} ms", flush=True)

    # --- 5. current stage0 einsum-gather conv for reference ------------
    ftable = jnp.asarray(rng.normal(size=(P + 1, C)).astype(np.float32)
                         ).astype(jnp.bfloat16)
    gidx27 = jnp.asarray(rng.integers(0, P, size=(P, 27)).astype(np.int32))
    w27 = jnp.asarray(rng.normal(size=(27 * C, C)).astype(np.float32) * .1
                      ).astype(jnp.bfloat16)

    def conv27(ftable, gidx27, w27):
        gg = ftable[gidx27.reshape(-1)].reshape(P, 27 * C)
        return jnp.dot(gg, w27, preferred_element_type=jnp.float32
                       ).astype(jnp.bfloat16)

    t = stream_ms(jax.jit(conv27), ftable, gidx27, w27)
    print(f"current-style 27-gather+matmul conv: {t:.2f} ms", flush=True)


if __name__ == "__main__":
    main()
