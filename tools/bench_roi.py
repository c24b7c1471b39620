"""RoIAlign strategy A/B at flagship shapes: corner-pairs vs patch-gather.

Times the LiDAR BEV RoI path (900 proposals, 4-level BEV) and the
6-camera image RoI path (visible-pair cap 320) for patch=0 (pairs) vs
patch=32, forward and grad-wrt-features, on one chip.

    python tools/bench_roi.py [patch_values...]   # default: 0 32
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

from srfdet3d_tpu.ops.roi_align import (  # noqa: E402
    multilevel_roi_align, _axis_weights, _level_geometry, _sample_grid)
from srfdet3d_tpu.models.head import pooled_img_roi  # noqa: E402


def _misfit_count(feats, rois, strides, patch=32):
    """How many RoIs would take the pairs fallback at this patch size."""
    _, s, h_l, w_l, _ = _level_geometry(feats, rois, strides, 56.0)
    sx, sy = _sample_grid(rois, s, 7, 2)
    _, _, fx = _axis_weights(sx, w_l, w_l.astype(jnp.int32), patch)
    _, _, fy = _axis_weights(sy, h_l, h_l.astype(jnp.int32), patch)
    return int(jnp.sum(~(fx & fy)))


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
    patches = [int(a) for a in sys.argv[1:]] or [0, 32]
    print("device:", jax.devices()[0], flush=True)
    rng = np.random.default_rng(0)

    # ---- LiDAR BEV path: 900 proposals over a 184x184-stride-8 pyramid
    c = 128
    n_p = 900
    bev = [jnp.asarray(rng.normal(size=(1, 184 // (1 << i), 184 // (1 << i),
                                        c)).astype(np.float32))
           for i in range(4)]
    strides = (8, 16, 32, 64)
    # RoI sizes ~ real boxes: 0.5-20 m at 0.075 m/voxel-stride-8 = 0.6 m/cell
    ctr = rng.uniform(100, 1300, (1, n_p, 2))
    wh = rng.uniform(6, 260, (1, n_p, 2))
    rois = jnp.asarray(np.concatenate(
        [ctr - wh / 2, ctr + wh / 2], -1).astype(np.float32))
    print(f"lidar misfits@32: {_misfit_count(tuple(bev), rois[0], strides)}"
          f" / {n_p}", flush=True)

    for p in patches:
        def fwd(p=p):
            return jax.vmap(lambda f, r: multilevel_roi_align(
                tuple(f), r, strides, patch=p, patch_fallback=64))(
                tuple(bev), rois)
        f = jax.jit(fwd)
        _time(f, f"lidar fwd patch={p}")
        g = jax.jit(jax.grad(lambda b0: jnp.sum(jax.vmap(
            lambda f, r: multilevel_roi_align(
                tuple(f), r, strides, patch=p, patch_fallback=64))(
            (b0,) + tuple(bev[1:]), rois))))
        _time(lambda: g(bev[0]), f"lidar grad patch={p}")

    # ---- image path: 6 cams, cap 320, 4-level FPN of the flagship LC
    # network input (1600x900 padded to 1600x928, configs/__init__.py)
    n_cam, cap = 6, 320
    img = [jnp.asarray(rng.normal(
        size=(1, n_cam, 928 // s, 1600 // s, c)).astype(np.float32))
        for s in (4, 8, 16, 32)]
    # mix of on-image, off-image and behind-camera-style huge RoIs
    x1 = rng.uniform(-1800, 1600, (1, n_cam, n_p))
    y1 = rng.uniform(-1000, 900, (1, n_cam, n_p))
    w = rng.uniform(12, 1000, (1, n_cam, n_p))
    h = rng.uniform(12, 800, (1, n_cam, n_p))
    big = rng.random((1, n_cam, n_p)) < 0.03
    w = np.where(big, 1e5, w)
    h = np.where(big, 1e5, h)
    cam_rois = jnp.asarray(np.stack(
        [x1, y1, x1 + w, y1 + h], -1).astype(np.float32))
    flat_img = tuple(f[0, 0] for f in img)
    mis = max(_misfit_count(flat_img, cam_rois[0, k], (4, 8, 16, 32))
              for k in range(n_cam))
    print(f"img max misfits@32 per cam: {mis} / {n_p}", flush=True)

    for p in patches:
        f = jax.jit(lambda p=p: pooled_img_roi(
            img, cam_rois, (4, 8, 16, 32), 7, cap=cap, patch=p,
            patch_fallback=64))
        _time(f, f"img fwd patch={p} cap={cap}")
        g = jax.jit(jax.grad(lambda i0, p=p: jnp.sum(pooled_img_roi(
            [i0] + img[1:], cam_rois, (4, 8, 16, 32), 7, cap=cap,
            patch=p, patch_fallback=64))))
        _time(lambda: g(img[0]), f"img grad patch={p} cap={cap}")


if __name__ == "__main__":
    main()
