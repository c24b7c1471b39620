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
                variant="full", reps=3):
    """reps copies of the block in one program (dispatch-amortized)."""
    h, w = hw
    x = jnp.ones((6, h, w, cin), DT)
    if variant == "full":
        blk = _OSABlock(conv_ch=conv_ch, out_ch=out_ch, layer_per_block=n,
                        identity=identity, dtype=DT)
    else:
        blk = _VariantBlock(conv_ch=conv_ch, out_ch=out_ch, layers=n,
                            variant=variant, dtype=DT)
    params = blk.init(jax.random.PRNGKey(0), x)

    # rep only when shapes chain (out_ch == cin)
    if out_ch == cin and reps > 1:
        f = jax.jit(lambda p, x: _chain_apply(blk, p, x, reps))
        div = reps
    else:
        f = jax.jit(lambda p, x: blk.apply(p, x))
        div = 1
    ms = _time(lambda: f(params, x)) / div
    px = 6 * h * w
    macs = px * (9 * cin * conv_ch + (n - 1) * 9 * conv_ch * conv_ch +
                 (cin + n * conv_ch) * out_ch)
    print(f"{label} [{variant}]: {ms:.2f} ms  "
          f"{2 * macs / ms / 1e9:.0f} TFLOP/s-ish", flush=True)
    return ms


def _chain_apply(blk, p, x, reps):
    for _ in range(reps):
        x = blk.apply(p, x)
    return x


class _VariantBlock(nn.Module):
    """OSA block ablations: sum-split aggregation / no BN / no eSE."""
    conv_ch: int
    out_ch: int
    layers: int = 5
    variant: str = "sumagg"
    dtype: object = DT

    @nn.compact
    def __call__(self, x):
        from srfdet3d_tpu.models.vovnet import _eSE
        use_bn = "nobn" not in self.variant
        feats = [x]
        for i in range(self.layers):
            x = nn.Conv(self.conv_ch, (3, 3), padding="SAME",
                        use_bias=False, dtype=DT, name=f"c{i}")(x)
            if use_bn:
                x = nn.BatchNorm(use_running_average=True, momentum=0.9,
                                 epsilon=1e-5, dtype=DT)(x)
            x = nn.relu(x)
            feats.append(x)
        if "sumagg" in self.variant:
            # concat + 1x1  ==  sum of per-feature 1x1 projections
            # (identical math, no wide concat tensor materialized)
            y = 0.0
            for i, f in enumerate(feats):
                y = y + nn.Conv(self.out_ch, (1, 1), use_bias=False,
                                dtype=DT, name=f"agg{i}")(f)
        else:
            y = nn.Conv(self.out_ch, (1, 1), use_bias=False, dtype=DT,
                        name="agg")(jnp.concatenate(feats, -1))
        if use_bn:
            y = nn.BatchNorm(use_running_average=True, momentum=0.9,
                             epsilon=1e-5, dtype=DT)(y)
        y = nn.relu(y)
        if "noese" not in self.variant:
            y = _eSE(self.out_ch, dtype=DT)(y)
        return y


def matmul_bench(label, m, k, n):
    a = jnp.ones((m, k), DT)
    b = jnp.ones((k, n), DT)
    f = jax.jit(lambda a, b: jnp.dot(a, b,
                                     preferred_element_type=jnp.float32))
    ms = _time(lambda: f(a, b))
    print(f"{label}: {ms:.2f} ms  {2 * m * k * n / ms / 1e9:.0f} TFLOP/s-ish",
          flush=True)
    return ms


def chain_bench(label, hw, ch, n_convs=5, reps=4):
    """n_convs sequential 3x3 convs REPEATED reps times in one program —
    amortizes dispatch so the per-conv number is honest."""
    h, w = hw
    x = jnp.ones((6, h, w, ch), DT)
    conv = nn.Conv(ch, (3, 3), padding="SAME", use_bias=False, dtype=DT)
    params = conv.init(jax.random.PRNGKey(0), x)

    def chain(p, x):
        for _ in range(n_convs * reps):
            x = conv.apply(p, x)
        return x

    f = jax.jit(chain)
    ms = _time(lambda: f(params, x))
    per = ms / (n_convs * reps)
    fl = 2 * 6 * h * w * 9 * ch * ch
    print(f"{label}: {per:.3f} ms/conv  {fl / per / 1e9:.0f} TFLOP/s-ish",
          flush=True)
    return per


def main():
    print(f"device {jax.devices()[0]} dtype {DT.__name__}", flush=True)
    # pure matmuls at the conv GEMM shapes: the MXU ceiling for each
    matmul_bench("GEMM s3 (139200x1440x160)", 139200, 1440, 160)
    matmul_bench("GEMM s4 (34800x1728x192)", 34800, 1728, 192)
    matmul_bench("GEMM s3 1x1 (139200x1056x512)", 139200, 1056, 512)
    # dispatch-amortized conv chains (the honest per-conv number)
    chain_bench("s3 conv chain 160ch @116x200", (116, 200), 160)
    chain_bench("s4 conv chain 192ch @58x100", (58, 100), 192)
    chain_bench("s2 conv chain 128ch @232x400", (232, 400), 128)
    # full OSA blocks + ablations (s4 chains reps=3: cin == out_ch)
    block_bench("s3 block (256->160x5->512)", (116, 200), 256, 160, 512)
    block_bench("s4 block (768->192x5->768)", (58, 100), 768, 192, 768,
                identity=True)
    for var in ("concat", "sumagg", "concat_nobn", "sumagg_noese_nobn"):
        block_bench("s4 block", (58, 100), 768, 192, 768, variant=var)
        block_bench("s3ish block", (116, 200), 512, 160, 512, variant=var)


if __name__ == "__main__":
    main()
