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


def head_img_parts(cfg, rng):
    """Fusion-head image path decomposition (VERDICT r4 #5: the ~79 ms
    per-predict img path was never profiled).  Pieces, at LC shapes
    (900 proposals, 6 cams, cap 320, hidden 128, strides 4/8/16/32):

      project    img_rois_from_boxes einsum + denorm
      pool       pooled_img_roi (compaction + pairs RoIAlign + scatter)
      pool_nc    pooled_img_roi cap=0 (all 5400 pairs, reference-style)
      align      the vmapped multilevel_roi_align alone on precompacted
                 (6, 320) RoIs — isolates the gather from compaction
    x5 = per-predict cost is 5 iterations of project+pool.
    """
    import jax  # noqa: F811
    from srfdet3d_tpu.models import head as hm
    from srfdet3d_tpu.ops.roi_align import multilevel_roi_align
    n_cam = cfg.img.num_cams
    h, w = cfg.img.img_shape
    n_p = cfg.head.num_proposals
    cdim = cfg.head.hidden_dim
    strides = tuple(cfg.head.img_strides)
    cap = cfg.head.img_roi_cap
    img_feats = [jnp.asarray(rng.normal(
        size=(1, n_cam, h // s, w // s, cdim)).astype(np.float32))
        for s in strides]
    print("img feat lvls:", [tuple(f.shape) for f in img_feats],
          flush=True)

    # plausible camera RoIs: each proposal lands in ~1-2 cameras with
    # box sizes of tens of pixels; the rest sit far off-image
    rois = np.full((1, n_cam, n_p, 4), -1e6, np.float32)
    for p in range(n_p):
        for cam in rng.choice(n_cam, rng.integers(1, 3), replace=False):
            cx, cy = rng.uniform(0, w), rng.uniform(0, h)
            bw, bh = rng.uniform(8, 160, 2)
            rois[0, cam, p] = (cx - bw / 2, cy - bh / 2,
                               cx + bw / 2, cy + bh / 2)
    cam_rois = jnp.asarray(rois)

    boxes = np.zeros((1, n_p, 10), np.float32)
    boxes[..., :3] = rng.uniform(0.05, 0.95, (1, n_p, 3))
    boxes[..., 3:6] = rng.normal(0.5, 0.3, (1, n_p, 3))
    yaw = rng.uniform(-np.pi, np.pi, (1, n_p))
    boxes[..., 6], boxes[..., 7] = np.sin(yaw), np.cos(yaw)
    boxes_abs = hm.denormalize_centers(jnp.asarray(boxes), cfg.pc_range)
    l2i = jnp.asarray(rng.normal(size=(1, n_cam, 4, 4)).astype(np.float32))

    f_proj = jax.jit(lambda b, m: hm.img_rois_from_boxes(b, m))
    _time(lambda: f_proj(boxes_abs, l2i), "project (x5)")

    f_pool = jax.jit(lambda fs, r: hm.pooled_img_roi(
        fs, r, strides, 7, cap=cap))
    _time(lambda: f_pool(img_feats, cam_rois), f"pool cap={cap} (x5)")

    f_nc = jax.jit(lambda fs, r: hm.pooled_img_roi(
        fs, r, strides, 7, cap=0))
    _time(lambda: f_nc(img_feats, cam_rois), "pool cap=0 (x5)")

    f_xp = jax.jit(lambda fs, r: hm.pooled_img_roi(
        fs, r, strides, 7, cap=cap, xpatch=32, xpatch_fallback=96))
    _time(lambda: f_xp(img_feats, cam_rois), f"pool xpatch32/96 (x5)")
    f_xp0 = jax.jit(lambda fs, r: hm.pooled_img_roi(
        fs, r, strides, 7, cap=cap, xpatch=32, xpatch_fallback=0))
    _time(lambda: f_xp0(img_feats, cam_rois), f"pool xpatch32/0 (x5)")

    rois_c = jnp.asarray(rois[0, :, :cap])               # (n_cam, cap, 4)
    flat_feats = tuple(f.reshape((n_cam,) + f.shape[2:])
                       for f in img_feats)
    f_al = jax.jit(lambda fs, r: jax.vmap(
        lambda ff, rr: multilevel_roi_align(ff, rr, strides, out_size=7))(
        fs, r))
    _time(lambda: f_al(flat_feats, rois_c), f"align {n_cam}x{cap} (x5)")


def main():
    cfg = srfdet_voxel_nusc_LC()
    if len(sys.argv) > 1 and sys.argv[1] == "head":
        print(f"device: {jax.devices()[0]}", flush=True)
        head_img_parts(cfg, np.random.default_rng(0))
        return
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
