"""Predict-path benchmark for any registered config.

    python tools/bench_config.py srfdet_voxel_kitti_L [batch] [bfloat16] [occ] [k=v ...]

Trailing k=v args are dotted config overrides (tools/train.py
apply_cfg_options), e.g. `head.roi_patch=0` for an A/B against the
shipped default.

Builds the model from the named config factory, runs the full predict
(forward + decode + NMS) on a synthetic batch and prints p50 latency plus
pipelined stream throughput.  `occ` (default 0.5) is the filled fraction
of the points capacity — static shapes make latency occupancy-independent
only up to the voxel cap; lower occ shows the real-scene regime
(VERDICT r1 item 9).
"""

import dataclasses
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

from __graft_entry__ import _synthetic_batch  # noqa: E402
from srfdet3d_tpu import configs  # noqa: E402
from srfdet3d_tpu.models.detector import SRFDet  # noqa: E402


def main():
    name = sys.argv[1] if len(sys.argv) > 1 else "srfdet_voxel_nusc_L"
    bs = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    dtype = sys.argv[3] if len(sys.argv) > 3 else "float32"
    occ = float(sys.argv[4]) if len(sys.argv) > 4 else 0.5
    overrides = [a for a in sys.argv[5:] if "=" in a]
    cfg = getattr(configs, name)()
    if overrides:
        from train import apply_cfg_options
        cfg = apply_cfg_options(cfg, overrides)
        print("overrides:", " ".join(overrides), flush=True)
    if dtype == "img_bf16":
        # bf16 on the image branch only (MXU-bound convs); lidar fp32
        if cfg.img is None:
            print(f"{name} has no image branch; img_bf16 is meaningless",
                  flush=True)
            return 2
        cfg = dataclasses.replace(
            cfg, img=dataclasses.replace(cfg.img,
                                         compute_dtype="bfloat16"))
    elif dtype != "float32":
        cfg = dataclasses.replace(cfg, compute_dtype=dtype)
    print(f"config {name} bs={bs} {dtype} occ={occ}; "
          f"device {jax.devices()[0]}", flush=True)

    rng = np.random.default_rng(0)
    batch = _synthetic_batch(cfg, batch_size=bs)
    if occ != 0.5:
        # refill with occ * cap real points (default synthetic batch
        # fills half the cap — worst-case voxel occupancy at nuScenes
        # scale); mask the rest
        p = cfg.points_cap
        n_real = int(p * occ)
        pts = np.zeros((bs, p, cfg.points_dim), np.float32)
        lo, hi = cfg.pc_range[:3], cfg.pc_range[3:6]
        pts[:, :n_real, 0] = rng.uniform(lo[0], hi[0], (bs, n_real))
        pts[:, :n_real, 1] = rng.uniform(lo[1], hi[1], (bs, n_real))
        pts[:, :n_real, 2] = rng.uniform(lo[2], hi[2], (bs, n_real))
        if cfg.points_dim > 3:
            pts[:, :n_real, 3:] = rng.uniform(
                0, 1, (bs, n_real, cfg.points_dim - 3))
        mask = np.zeros((bs, p), bool)
        mask[:, :n_real] = True
        batch["points"] = jnp.asarray(pts)
        batch["points_mask"] = jnp.asarray(mask)
    if cfg.use_img:
        h, w = cfg.img.img_shape
        n_cam = cfg.img.num_cams
        batch["images"] = jnp.asarray(
            rng.normal(size=(bs, n_cam, h, w, 3)).astype(np.float32))
        # surround rig: cameras yawed 360/n_cam apart (a box projects into
        # 1-2 of them, like the real nuScenes rig) — an identity rig makes
        # every proposal visible in every camera and misstates the
        # visible-pair compaction (head.img_roi_cap)
        l2i = np.zeros((bs, n_cam, 4, 4), np.float32)
        intr = np.eye(4, dtype=np.float32)
        intr[0, 0] = intr[1, 1] = 800.0
        intr[0, 2] = w / 2
        intr[1, 2] = h / 2
        for k in range(n_cam):
            yaw = 2 * np.pi * k / n_cam
            fwd = np.array([np.cos(yaw), np.sin(yaw), 0.0])
            right = np.array([-np.sin(yaw), np.cos(yaw), 0.0])
            down = np.array([0.0, 0.0, -1.0])
            l2c = np.eye(4, dtype=np.float32)
            l2c[:3, :3] = np.stack([right, down, fwd])
            l2i[:, k] = intr @ l2c
        batch["lidar2img"] = jnp.asarray(l2i)

    model = SRFDet(cfg)
    variables = jax.jit(lambda r, b: model.init(r, b, train=False))(
        jax.random.PRNGKey(0), batch)
    fn = jax.jit(lambda v, b: model.apply(v, b, method=SRFDet.predict))

    def run():
        out = fn(variables, batch)
        return float(jnp.sum(out["scores"]))

    t0 = time.perf_counter()
    run()
    print(f"compile+run {time.perf_counter() - t0:.0f}s", flush=True)
    for _ in range(3):
        run()
    ts = []
    for _ in range(10):
        t0 = time.perf_counter()
        run()
        ts.append(time.perf_counter() - t0)
    p50 = float(np.percentile(ts, 50)) * 1000
    print(f"{name} bs={bs} {dtype}: predict p50 {p50:.1f} ms "
          f"({bs * 1000 / p50:.2f} frames/s/chip)", flush=True)

    # pipelined stream throughput: sync once at the end (bench.py style)
    run()
    iters = 16
    t0 = time.perf_counter()
    outs = [fn(variables, batch) for _ in range(iters)]
    s = float(jnp.sum(jnp.stack([jnp.sum(o["scores"]) for o in outs])))
    stream = time.perf_counter() - t0
    assert np.isfinite(s)
    print(f"{name} bs={bs} {dtype}: stream throughput "
          f"{bs * iters / stream:.2f} frames/s/chip", flush=True)


if __name__ == "__main__":
    main()
