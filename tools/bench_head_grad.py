"""Grad-path localization for the decoder head + OTA loss at flagship scale.

Times forward and value_and_grad of SRFDetHead (+ srfdet_losses OTA path)
on synthetic BEV maps, isolating the decoder/assign share of the train
step from the encoder's.

    python tools/bench_head_grad.py [head|loss ...]
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

from srfdet3d_tpu.configs import srfdet_voxel_nusc_L  # noqa: E402
from srfdet3d_tpu.models.head import SRFDetHead  # noqa: E402
from srfdet3d_tpu.models.losses import srfdet_losses  # noqa: E402


def main():
    parts = sys.argv[1].split(",") if len(sys.argv) > 1 else ["head", "loss"]
    cfg = srfdet_voxel_nusc_L()
    h = cfg.head
    print("device:", jax.devices()[0], flush=True)

    grid_h = int(round((cfg.pc_range[4] - cfg.pc_range[1])
                       / cfg.voxel_size[1]))
    grid_w = int(round((cfg.pc_range[3] - cfg.pc_range[0])
                       / cfg.voxel_size[0]))
    rng = np.random.default_rng(0)
    bev = [jnp.asarray(rng.normal(size=(
        1, grid_h // s, grid_w // s, h.feat_channels_lidar)
    ).astype(np.float32)) for s in h.lidar_strides]
    print("bev levels:", [tuple(f.shape) for f in bev], flush=True)

    head = SRFDetHead(
        num_classes=h.num_classes,
        feat_channels_lidar=h.feat_channels_lidar,
        hidden_dim=h.hidden_dim,
        num_proposals=h.num_proposals,
        num_heads=h.num_heads,
        with_dpg=h.with_dpg,
        num_dpg_exp=h.num_dpg_exp,
        pc_range=tuple(cfg.pc_range),
        voxel_size=tuple(cfg.voxel_size),
        dim_feedforward=h.dim_feedforward,
        num_cls_convs=h.num_cls_convs,
        num_reg_convs=h.num_reg_convs,
        num_attn_heads=h.num_attn_heads,
        dropout=h.dropout,
        dynamic_dim=h.dynamic_dim,
        lidar_strides=tuple(h.lidar_strides))
    variables = jax.jit(lambda f: head.init(
        jax.random.PRNGKey(0), f, train=False))(bev)

    gt_boxes = jnp.asarray(rng.normal(size=(1, cfg.gt_cap, 9))
                           .astype(np.float32))
    gt_labels = jnp.zeros((1, cfg.gt_cap), jnp.int32)
    gt_mask = jnp.zeros((1, cfg.gt_cap), bool).at[:, :20].set(True)

    def head_only(params, f):
        logits, boxes = head.apply(
            {"params": params,
             "batch_stats": variables.get("batch_stats", {})},
            f, train=True, mutable=["batch_stats"],
            rngs={"dropout": jax.random.PRNGKey(1)})[0]
        return jnp.sum(logits.astype(jnp.float32)) + \
            jnp.sum(boxes.astype(jnp.float32))

    def with_loss(params, f):
        (logits, boxes), _ = head.apply(
            {"params": params,
             "batch_stats": variables.get("batch_stats", {})},
            f, train=True, mutable=["batch_stats"],
            rngs={"dropout": jax.random.PRNGKey(1)})
        losses = srfdet_losses(logits, boxes, gt_boxes, gt_labels, gt_mask,
                               cfg.loss, cfg.ota)
        return sum(jnp.sum(v) for v in jax.tree.leaves(losses))

    fns = {"head": head_only, "loss": with_loss}
    for part in parts:
        fn = fns[part]
        fwd = jax.jit(fn)
        # argnums=(0, 1): the BEV maps are param-dependent in the real
        # train step, so their cotangent path (RoIAlign backward into the
        # feature tables) must be part of what we time
        grad = jax.jit(jax.value_and_grad(fn, argnums=(0, 1)))
        for tag, f in (("fwd", lambda: fwd(variables["params"], bev)),
                       ("grad", lambda: grad(variables["params"], bev))):
            t0 = time.perf_counter()
            out = f()
            val = out[0] if tag == "grad" else out
            float(val)
            print(f"{part} {tag}: compile+run "
                  f"{time.perf_counter() - t0:.0f}s", flush=True)
            ts = []
            for _ in range(6):
                t0 = time.perf_counter()
                out = f()
                val = out[0] if tag == "grad" else out
                float(val)
                ts.append(time.perf_counter() - t0)
            print(f"{part} {tag}: p50 "
                  f"{np.percentile(ts, 50) * 1000:.1f} ms", flush=True)


if __name__ == "__main__":
    main()
