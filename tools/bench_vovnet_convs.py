"""Isolated VoVNet conv/block timings at exact LC shapes (6x928x1600).

Answers where the backbone's MXU gap comes from (PERF.md: ~21% MXU at
139.5 ms bf16; roofline total ~5.9 TFLOP):
  - single 3x3 convs at each stage's (spatial, Cin, Cout) — achieved
    TFLOP/s vs the 128-lane padding-limited bound,
  - one full OSA block per stage (convs + BN + eSE + concat + 1x1),
  - the same block without BN / without eSE (fusion-stall attribution).

    python tools/bench_vovnet_convs.py
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

from flax import linen as nn  # noqa: E402
from srfdet3d_tpu.models.vovnet import _OSABlock, _ConvBN  # noqa: E402

DT = jnp.bfloat16


def _time(fn, iters=20):
    fn()  # compile
    float(jnp.sum(fn()))
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn()
    float(jnp.sum(r))
    return (time.perf_counter() - t0) / iters * 1000


def conv_bench(label, hw, cin, cout, k=3):
    h, w = hw
    x = jnp.ones((6, h, w, cin), DT)
    conv = nn.Conv(cout, (k, k), padding="SAME", use_bias=False, dtype=DT)
    params = conv.init(jax.random.PRNGKey(0), x)
    f = jax.jit(lambda p, x: conv.apply(p, x))
    ms = _time(lambda: f(params, x))
    flops = 2 * 6 * h * w * k * k * cin * cout
    print(f"{label}: {ms:.2f} ms  {flops / ms / 1e9:.0f} GFLOP/s "
          f"(pad-bound {cin}x{cout})", flush=True)
    return ms


def block_bench(label, hw, cin, conv_ch, out_ch, n=5, identity=False,
                variant="full"):
    h, w = hw
    x = jnp.ones((6, h, w, cin), DT)
    blk = _OSABlock(conv_ch=conv_ch, out_ch=out_ch, layer_per_block=n,
                    identity=identity, dtype=DT)
    params = blk.init(jax.random.PRNGKey(0), x)
    f = jax.jit(lambda p, x: blk.apply(p, x))
    ms = _time(lambda: f(params, x))
    px = 6 * h * w
    macs = px * (9 * cin * conv_ch + (n - 1) * 9 * conv_ch * conv_ch +
                 (cin + n * conv_ch) * out_ch)
    print(f"{label} [{variant}]: {ms:.2f} ms  "
          f"{2 * macs / ms / 1e9:.0f} GFLOP/s", flush=True)
    return ms


def main():
    print(f"device {jax.devices()[0]} dtype {DT.__name__}", flush=True)
    # single convs, per stage
    conv_bench("s2 conv 128->128 @232x400", (232, 400), 128, 128)
    conv_bench("s3 conv 160->160 @116x200", (116, 200), 160, 160)
    conv_bench("s4 conv 192->192 @58x100", (58, 100), 192, 192)
    conv_bench("s4 conv 256->256 @58x100 (pad-free ref)", (58, 100),
               256, 256)
    conv_bench("s4 conv0 768->192 @58x100", (58, 100), 768, 192)
    conv_bench("s3 1x1 1056->512 @116x200", (116, 200), 1056, 512, k=1)
    # full OSA blocks
    block_bench("s3 block (256->160x5->512)", (116, 200), 256, 160, 512)
    block_bench("s4 block (768->192x5->768)", (58, 100), 768, 192, 768,
                identity=True)


if __name__ == "__main__":
    main()
