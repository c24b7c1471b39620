"""AOT warm-start floor decomposition (VERDICT r3 weak #4).

Answers whether the ~22-90 s "cache-hit compile" of the serving artifact
is program-size-dependent (then: shrink/split the program) or a fixed
relay/backend cost (then: document the floor).  Measures, in one
process:

  1. relay round-trip floor: a trivial jitted program's first call
     (compile + execute) and its steady-state call time,
  2. a mid-size program (184^2 conv stack) first call,
  3. the flagship AOT artifact: pickle load / deserialize / device_put
     params / first predict call (the "cache-hit compile"), separately.

Run AFTER bench.py has written flagship_aot.jxp (same code fingerprint).

    python tools/bench_aot_floor.py
"""
import os
import pickle
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

AOT = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "flagship_aot.jxp")


def t(label, fn):
    t0 = time.perf_counter()
    out = fn()
    dt = time.perf_counter() - t0
    print(f"{label}: {dt:.2f} s", flush=True)
    return out


def main():
    print(f"device {jax.devices()[0]}", flush=True)

    x = jnp.ones((8, 128), jnp.float32)
    f1 = jax.jit(lambda x: jnp.sum(x * 2.0))
    t("tiny program first call (relay floor)", lambda: float(f1(x)))
    t0 = time.perf_counter()
    for _ in range(10):
        float(f1(x))
    print(f"tiny program steady call: "
          f"{(time.perf_counter() - t0) / 10 * 1000:.1f} ms", flush=True)

    y = jnp.ones((1, 184, 184, 256), jnp.float32)
    w = jnp.ones((3, 3, 256, 256), jnp.float32)

    @jax.jit
    def mid(y, w):
        for _ in range(10):
            y = jax.lax.conv_general_dilated(
                y, w, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return jnp.sum(y)

    t("mid program (10-conv) first call", lambda: float(mid(y, w)))

    if not os.path.exists(AOT):
        print("no flagship_aot.jxp — run bench.py first", flush=True)
        return
    art = t("artifact pickle load", lambda: pickle.load(open(AOT, "rb")))
    exported = t("jax.export.deserialize",
                 lambda: jax.export.deserialize(art["exported"]))
    variables = t("device_put params",
                  lambda: jax.device_put(art["variables"]))
    batch = jax.device_put(art["batch"])
    call = jax.jit(exported.call)
    t("flagship first call (cache-hit compile + run)",
      lambda: float(jnp.sum(call(variables, batch)["scores"])))
    t0 = time.perf_counter()
    float(jnp.sum(call(variables, batch)["scores"]))
    print(f"flagship second call: {time.perf_counter() - t0:.2f} s",
          flush=True)


if __name__ == "__main__":
    main()
