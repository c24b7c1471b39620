"""TPU follow-up: correction-pass breakdown, proper correctness check,
bf16 repro, new NMS timing."""

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
    idx_np = near_monotone_idx(rng, m, k, n, spread=300, miss_frac=0.3)
    idx = jnp.asarray(idx_np)

    # 1. proper correctness: generous window
    ref = np.asarray(xla_ref(feats, idx, w))
    for wp in (256, 512):
        got = np.asarray(gather_matmul_onehot(feats, idx, w, tm=512, wp=wp))
        print(f"correct wp={wp}: max err {np.abs(got - ref).max():.2e}",
              flush=True)

    # 2. correction-pass component costs at stage0 scale
    mk = m * k
    oow = jnp.asarray(rng.random(mk) < 0.02)
    cap = mk // 8

    @jax.jit
    def comp_cumsum(o):
        return jnp.cumsum(o) - 1

    @jax.jit
    def comp_scatter(o):
        pos = jnp.cumsum(o) - 1
        slot = jnp.where(o & (pos < cap), pos, cap)
        rows = jnp.arange(mk, dtype=jnp.int32) // k
        return jnp.full((cap + 1,), 0, jnp.int32).at[slot].set(
            rows, mode="drop")[:cap]

    @jax.jit
    def comp_gather_w(offs_k):
        return w[offs_k]                       # (cap, 16, 16) materialize

    @jax.jit
    def comp_einsum(gathered, offs_k):
        wsel = w[offs_k]
        return jnp.einsum("ci,cio->co", gathered, wsel,
                          preferred_element_type=jnp.float32)

    @jax.jit
    def comp_loop_mm(gathered, offs_k):
        part = jnp.zeros((cap, cout), jnp.float32)
        for j in range(k):
            pj = jnp.dot(gathered, w[j], preferred_element_type=jnp.float32)
            part = part + jnp.where((offs_k == j)[:, None], pj, 0.0)
        return part

    @jax.jit
    def comp_scatter_add(out, rows_m, part):
        return out.at[rows_m].add(part, mode="drop")

    offs_k = jnp.asarray(rng.integers(0, k, cap).astype(np.int32))
    rows_m = jnp.asarray(rng.integers(0, m, cap).astype(np.int32))
    gathered = jnp.asarray(rng.normal(size=(cap, cin)).astype(np.float32))
    out0 = jnp.zeros((m, cout), jnp.float32)
    print(f"cumsum {time_fn(lambda: comp_cumsum(oow)) - rb:.1f} ms",
          flush=True)
    print(f"scatter-compact {time_fn(lambda: comp_scatter(oow)) - rb:.1f} ms",
          flush=True)
    print(f"w-gather (cap,16,16) "
          f"{time_fn(lambda: comp_gather_w(offs_k)) - rb:.1f} ms", flush=True)
    print(f"einsum w-gathered "
          f"{time_fn(lambda: comp_einsum(gathered, offs_k)) - rb:.1f} ms",
          flush=True)
    print(f"loop-matmul "
          f"{time_fn(lambda: comp_loop_mm(gathered, offs_k)) - rb:.1f} ms",
          flush=True)
    t_sadd = time_fn(lambda: comp_scatter_add(out0, rows_m, gathered)) - rb
    print(f"scatter-add {t_sadd:.1f} ms", flush=True)

    # 3. bf16 repro with full traceback
    try:
        f2 = feats.astype(jnp.bfloat16)
        out = gather_matmul_onehot(f2, idx, w, tm=512, wp=256, correct=False)
        out.block_until_ready()
        print("bf16 kernel compiled OK", flush=True)
    except Exception:
        print("bf16 FAILURE traceback:", flush=True)
        traceback.print_exc()

    # 4. new NMS/decode timing at flagship scale
    from srfdet3d_tpu.models.head import decode_boxes
    logits = jnp.asarray(rng.normal(size=(1, 900, 10)).astype(np.float32))
    boxes = jnp.asarray(rng.normal(size=(1, 900, 10)).astype(np.float32))
    dec = jax.jit(lambda l, b: decode_boxes(l, b))

    def run():
        r = dec(logits, boxes)
        return r["scores"]

    t = time_fn(run)
    print(f"decode_boxes (B=1, 900x10, NMS): {t - rb:.1f} ms", flush=True)


if __name__ == "__main__":
    main()
