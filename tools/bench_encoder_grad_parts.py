"""Localize the sparse-encoder BACKWARD cost (train-step <=400 ms push).

bench_encoder_grad.py showed grad(encoder) ~642 ms vs 192 ms forward at
flagship scale, while the per-conv one-hot backward kernels measure ~10 ms
each (tools/bench_convs.py) — so a large share of the backward is
unaccounted.  This segments it two ways:

  1. truncated stacks: grad of the encoder cut after stage k (k = 1..4
     of the basicblock layout) — cumulative per-stage fwd/bwd cost;
  2. isolated pieces at stage-0 scale: the plan-major sort's gather
     transpose, MaskedBatchNorm train-mode grad, and the dense-scatter
     transpose — the non-conv suspects.

Usage:  python tools/bench_encoder_grad_parts.py [bitmap|table] [onehot|xla] [scale]

scale (default 1): divide the grid plan dims and voxel capacities by this —
scale=4 runs a 1/16-size problem that is tractable on CPU for structural
(fwd:bwd ratio) comparisons.
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

import srfdet3d_tpu.ops.sparse_conv as sc  # noqa: E402
from srfdet3d_tpu.configs import srfdet_voxel_nusc_L  # noqa: E402
from srfdet3d_tpu.models.sparse_encoder import SparseEncoder  # noqa: E402


def _flagship_batch(cfg, scale=1):
    mid = cfg.middle
    d = int(round((cfg.pc_range[5] - cfg.pc_range[2]) / cfg.voxel_size[2])) + 1
    h = int(round((cfg.pc_range[4] - cfg.pc_range[1]) / cfg.voxel_size[1])) \
        // scale
    w = int(round((cfg.pc_range[3] - cfg.pc_range[0]) / cfg.voxel_size[0])) \
        // scale
    v = cfg.voxels_cap // (scale * scale)
    rng = np.random.default_rng(0)
    flat = rng.choice(d * h * w, size=v, replace=False).astype(np.int64)
    coords = np.stack([flat // (h * w), (flat // w) % h, flat % w],
                      axis=-1).astype(np.int32)
    # PLAN-major order — the encoder's input contract (the voxelizer
    # emits it; benches that skipped this measured the eqmatch kernel
    # with shuffled queries, firing its fallback on every tile)
    coords = coords[np.argsort((coords[:, 1].astype(np.int64) * w +
                                coords[:, 2]) * d + coords[:, 0])][None]
    feats = rng.normal(size=(1, v, mid.in_channels)).astype(np.float32)
    mask = np.ones((1, v), bool)
    return (d, h, w), (jnp.asarray(feats), jnp.asarray(coords),
                       jnp.asarray(mask))


def _time(fn, label, iters=8):
    """Stream-amortized ms/it: per-call readback costs 25-30 ms on the
    tunneled backend and was polluting every isolated-piece number."""
    def burst(n):
        t0 = time.perf_counter()
        out = None
        for _ in range(n):
            out = fn()
        val = out[0] if isinstance(out, tuple) else out
        float(jnp.sum(val) if hasattr(val, "sum") else val)
        return (time.perf_counter() - t0) * 1000.0

    t0 = time.perf_counter()
    burst(1)
    print(f"{label}: compile+run {time.perf_counter() - t0:.0f}s",
          flush=True)
    burst(2)
    ms = (burst(iters) - burst(1)) / (iters - 1)
    print(f"{label}: {ms:.1f} ms/it (stream)", flush=True)
    return ms


def main():
    backend = sys.argv[1] if len(sys.argv) > 1 else "bitmap"
    gather = sys.argv[2] if len(sys.argv) > 2 else "onehot"
    scale = int(sys.argv[3]) if len(sys.argv) > 3 else 1
    sc.GATHER_METHOD = gather
    sc.ONEHOT_BWD = gather
    cfg = srfdet_voxel_nusc_L()
    mid = cfg.middle
    (d, h, w), batch = _flagship_batch(cfg, scale)
    caps = tuple(cc // (scale * scale) for cc in mid.capacities)
    print(f"device: {jax.devices()[0]} backend={backend} gather={gather} "
          f"grid=({d},{h},{w}) caps={caps}", flush=True)

    # 1. truncated stacks ---------------------------------------------------
    n_stages = len(mid.encoder_channels)
    for k in range(1, n_stages + 1):
        chans = [tuple(b) for b in mid.encoder_channels[:k]]
        if k < n_stages and mid.block_type == "basicblock":
            # the dropped downsample carried the stage's channel change;
            # keep the truncated last stage channel-consistent (the block
            # count — what we time — is unchanged)
            chans[-1] = tuple(chans[-1][0] for _ in chans[-1])
        enc = SparseEncoder(
            in_channels=mid.in_channels, sparse_shape=(d, h, w),
            base_channels=mid.base_channels,
            output_channels=mid.output_channels,
            encoder_channels=tuple(chans),
            encoder_paddings=mid.encoder_paddings[:k],
            block_type=mid.block_type,
            capacities=caps, rulebook=backend,
            # truncated stacks stop at their last sparse stage: densifying
            # an early-stage grid is a 22 GB HBM OOM at flagship scale
            densify=(k == n_stages))
        variables = jax.jit(lambda f, c, m, e=enc: e.init(
            jax.random.PRNGKey(0), f, c, m, train=False))(*batch)

        # batch passed as ARGUMENTS: closing over device arrays embeds
        # them as HLO constants and XLA constant-folds the whole rulebook
        # machinery at compile time (coords-only index math), which both
        # exploded compiles (889 s at k=4) and hid ~60% of the real
        # backward (163 vs 450 ms) — see PERF.md session 8
        def loss_fn(params, f, c, m, e=enc, v=variables):
            out, _ = e.apply(
                {"params": params,
                 "batch_stats": v.get("batch_stats", {})},
                f, c, m, train=True, mutable=["batch_stats"])
            return jnp.sum(out.astype(jnp.float32))

        fwd = jax.jit(loss_fn)
        grad = jax.jit(jax.value_and_grad(loss_fn))
        p = variables["params"]
        f_ms = _time(lambda: fwd(p, *batch), f"stages<= {k} fwd")
        g_ms = _time(lambda: grad(p, *batch), f"stages<= {k} grad")
        print(f"stages<={k}: bwd-only ~{g_ms - f_ms:.1f} ms", flush=True)

    # 2. isolated non-conv pieces at stage-0 scale --------------------------
    from srfdet3d_tpu.ops.bitmap_rulebook import sort_plan_major
    from srfdet3d_tpu.models.layers import MaskedBatchNorm

    v_eff = batch[0].shape[1]
    feats16 = jnp.zeros((1, v_eff, 16), jnp.float32)
    coords, mask = batch[1], batch[2]

    def sort_loss(f, c, m):
        sf, _, _ = sort_plan_major(f, c, m, (d, h, w))
        return jnp.sum(sf)

    g_sort = jax.jit(jax.grad(sort_loss))
    _time(lambda: g_sort(feats16, coords, mask),
          "sort_plan_major grad (16ch)")

    bn = MaskedBatchNorm()
    bnv = jax.jit(lambda f, m: bn.init(jax.random.PRNGKey(0), f, m,
                                       train=False))(feats16, mask)

    def bn_loss(f):
        out, _ = bn.apply(bnv, f, mask, train=True,
                          mutable=["batch_stats"])
        return jnp.sum(out)

    g_bn = jax.jit(jax.grad(bn_loss))
    _time(lambda: g_bn(feats16), f"MaskedBatchNorm grad ({v_eff} x 16)")


if __name__ == "__main__":
    main()
