"""LC image-branch breakdown at the parity-honest input (6 x 928 x 1600).

Times, on one chip:
  1. VoVNet-99 backbone alone,
  2. backbone + img FPN (= extract_img_features),
  3. the head's img channel-reduce convs,
  4. full LC predict (tools/bench_config.py measures this too).

Run after tunnel restore:  python tools/bench_img_branch.py [n_cams]
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

from srfdet3d_tpu.configs import srfdet_voxel_nusc_LC  # noqa: E402
from srfdet3d_tpu.models.vovnet import VoVNet  # noqa: E402
from srfdet3d_tpu.models.fpn import FPN  # noqa: E402


def _time(fn, label, iters=8):
    t0 = time.perf_counter()
    float(jnp.sum(fn()))
    print(f"{label}: compile+run {time.perf_counter() - t0:.0f}s", flush=True)
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        float(jnp.sum(fn()))
        ts.append(time.perf_counter() - t0)
    print(f"{label}: p50 {np.percentile(ts, 50) * 1000:.1f} ms", flush=True)


def main():
    cfg = srfdet_voxel_nusc_LC()
    n_cam = int(sys.argv[1]) if len(sys.argv) > 1 else cfg.img.num_cams
    h, w = cfg.img.img_shape
    print(f"device: {jax.devices()[0]}  input: {n_cam} x {h} x {w}",
          flush=True)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(n_cam, h, w, 3)).astype(np.float32))

    bb = VoVNet(cfg.img.backbone)
    vb = jax.jit(lambda xx: bb.init(jax.random.PRNGKey(0), xx))(x)
    bb_fwd = jax.jit(lambda v, xx: bb.apply(v, xx))
    _time(lambda: bb_fwd(vb, x)[-1], "vovnet99 backbone")

    neck = FPN(out_channels=cfg.img.neck_out_channels,
               num_outs=cfg.img.neck_num_outs,
               relu_before_extra_convs=cfg.img.relu_before_extra_convs)
    stages = bb_fwd(vb, x)        # reuse the compiled backbone program
    vn = jax.jit(lambda s: neck.init(jax.random.PRNGKey(1), s))(stages)

    full = jax.jit(lambda v_b, v_n, xx: neck.apply(
        v_n, bb.apply(v_b, xx))[-1])
    _time(lambda: full(vb, vn, x), "backbone+FPN")

    # channel-reduce convs (head img_convs), feat 256 -> hidden 128
    from flax import linen as nn

    class Reduce(nn.Module):
        @nn.compact
        def __call__(self, feats):
            return [nn.Conv(cfg.head.hidden_dim, (3, 3), padding=1,
                            name=f"img_conv_{i}")(f)
                    for i, f in enumerate(feats)]

    red = Reduce()
    pyramid = jax.jit(lambda v_b, v_n, xx: neck.apply(
        v_n, bb.apply(v_b, xx)))(vb, vn, x)
    vr = jax.jit(lambda s: red.init(jax.random.PRNGKey(2), s))(pyramid)
    reduce_fwd = jax.jit(lambda v, s: red.apply(v, s)[-1])
    _time(lambda: reduce_fwd(vr, pyramid), "img_convs reduce")


if __name__ == "__main__":
    main()
