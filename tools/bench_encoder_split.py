"""Split the flagship encoder cost: rulebook machinery vs conv compute.

Session-12 localization (bench_encoder_grad_parts) gave cumulative
per-stage numbers (fwd 139.5 / grad 329.6 ms at k=4) but could not say how
much of each is the integer rulebook walk (build_columns + subm/strided
rulebooks + output sites) vs the gather-GEMM + BN compute.  This times,
as separate cached jitted programs at EXACT flagship layouts:

  rb      the full bitmap rulebook walk alone (all stages: subm x4,
          downsample x3, convout, dense coords) — integer-only, no grad
  convs   the conv+BN+residual+densify stack on PRECOMPUTED rulebooks
          (fwd and value_and_grad wrt params+feats)

full-encoder reference numbers come from bench_encoder_grad_parts k=4.

    python tools/bench_encoder_split.py [bitmap] [onehot|xla]
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

import flax.linen as nn  # noqa: E402

import srfdet3d_tpu.ops.sparse_conv as sc  # noqa: E402
from srfdet3d_tpu.configs import srfdet_voxel_nusc_L  # noqa: E402
from srfdet3d_tpu.models.sparse_encoder import (  # noqa: E402
    _BitmapRulebooks, _GatheredConvBN)
from srfdet3d_tpu.ops.sparse_conv import sparse_to_dense_batched  # noqa: E402
from tools.bench_encoder_grad_parts import _flagship_batch, _time  # noqa: E402


def main():
    gather = sys.argv[2] if len(sys.argv) > 2 else "onehot"
    sc.GATHER_METHOD = gather
    sc.ONEHOT_BWD = gather
    cfg = srfdet_voxel_nusc_L()
    mid = cfg.middle
    (d, h, w), (feats, coords, mask) = _flagship_batch(cfg)
    caps = tuple(mid.capacities)
    print(f"device: {jax.devices()[0]} gather={gather} "
          f"grid=({d},{h},{w}) caps={caps}", flush=True)

    statics = {}

    def walk(coords, mask):
        """Exact rulebook sequence of the flagship basicblock layout."""
        rb = _BitmapRulebooks(coords, mask, (d, h, w))
        g = {"s0": rb.subm(), "m0": rb.mask}
        g["d0"] = rb.downsample(1, caps[0]); g["m1"] = rb.mask
        g["s1"] = rb.subm()
        g["d1"] = rb.downsample(1, caps[1]); g["m2"] = rb.mask
        g["s2"] = rb.subm()
        g["d2"] = rb.downsample((0, 1, 1), caps[2]); g["m3"] = rb.mask
        g["s3"] = rb.subm()
        g["out"] = rb.convout(caps[3]); g["m4"] = rb.mask
        b, p, _ = rb.cs.ccoords.shape
        m = rb.vcol.shape[1]
        ccflat = jnp.concatenate(
            [rb.cs.ccoords.reshape(b * p, 2),
             jnp.zeros((1, 2), jnp.int32)], axis=0)
        yx = ccflat[rb.vcol.reshape(-1)].reshape(b, m, 2)
        g["dcoords"] = jnp.concatenate([rb.vz[..., None], yx], axis=-1)
        statics["dense_shape"] = rb.cs.shape
        return g

    def walk_timed(coords, mask):
        g = walk(coords, mask)
        s = sum(jnp.sum(x.astype(jnp.float32)) for x in jax.tree.leaves(g))
        return s, g

    jwalk = jax.jit(walk_timed)
    _time(lambda: jwalk(coords, mask), "rulebook walk (all stages)")
    g = jwalk(coords, mask)[1]  # concrete arrays
    dense_shape = statics["dense_shape"]
    print("dense shape:", dense_shape, flush=True)

    class ConvsOnly(nn.Module):
        @nn.compact
        def __call__(self, feats, g, train=False):
            chans = mid.encoder_channels

            def block(feats, gidx, mask, ch, name):
                identity = feats
                f = _GatheredConvBN(ch, 27, name=f"{name}_conv1")(
                    feats, gidx, mask, train=train)
                f = _GatheredConvBN(ch, 27, relu=False, name=f"{name}_conv2")(
                    f, gidx, mask, train=train)
                return jnp.where(mask[..., None], nn.relu(f + identity), 0.0)

            mask = g["m0"]
            feats = _GatheredConvBN(mid.base_channels, 27, name="conv_input")(
                feats, g["s0"], mask, train=train)
            for i in range(4):
                sk, mk = f"s{i}", f"m{i}"
                for j in range(len(chans[i]) - (1 if i < 3 else 0)):
                    feats = block(feats, g[sk], g[mk], chans[i][j],
                                  f"bb{i}_{j}")
                if i < 3:
                    feats = _GatheredConvBN(chans[i][-1], 27,
                                            name=f"down{i}")(
                        feats, g[f"d{i}"], g[f"m{i + 1}"], train=train)
            feats = _GatheredConvBN(mid.output_channels, 3, name="conv_out")(
                feats, g["out"], g["m4"], train=train)
            dense = sparse_to_dense_batched(feats, g["dcoords"], g["m4"],
                                            dense_shape)
            b, d_, h_, w_, c_ = dense.shape
            return dense.transpose(0, 2, 3, 1, 4).reshape(b, h_, w_, d_ * c_)

    enc = ConvsOnly()
    variables = jax.jit(lambda f, gg: enc.init(
        jax.random.PRNGKey(0), f, gg, train=False))(feats, g)

    def loss_fn(params, f, gg):
        out, _ = enc.apply(
            {"params": params, "batch_stats": variables.get("batch_stats",
                                                            {})},
            f, gg, train=True, mutable=["batch_stats"])
        return jnp.sum(out.astype(jnp.float32))

    fwd = jax.jit(loss_fn)
    grad = jax.jit(jax.value_and_grad(loss_fn, argnums=(0, 1)))
    p = variables["params"]
    f_ms = _time(lambda: fwd(p, feats, g), "convs-only fwd")
    g_ms = _time(lambda: grad(p, feats, g)[0], "convs-only grad")
    print(f"convs-only bwd ~{g_ms - f_ms:.1f} ms", flush=True)


if __name__ == "__main__":
    main()
