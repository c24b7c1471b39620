"""Component-level grad localization INSIDE the decoder head (session 12).

bench_head_grad puts the full head at ~25 ms fwd / ~115 ms bwd (readback
subtracted) at flagship scale — 4.6x, on a module whose FLOPs are trivial
(~20 GFLOP). This probes where the backward goes, each part as its own
cached jitted program with a scalar readback:

  roi       5x vmapped multilevel_roi_align (patch and pairs), fwd + grad
            wrt the BEV tables (the table scatter-add backward)
  iter1     ONE SingleSRFDetHead iteration, fwd + grad (params + feats)
  iter1_nr  iter1 with stop_gradient around the RoI output (no table
            scatter / no RoI bwd) — isolates the proposal-network bwd
  scan      the full 5-iteration scanned head (= bench_head_grad head)
  scan_nodrop   scan with dropout=0.0 (RNG + dropout-mask bwd cost)
  scan_remat    scan with remat=True (residual save/restore vs recompute)
  scan_unroll   5 python-unrolled iterations (scan-machinery overhead)
  scan_u5       nn.scan with unroll=num_heads (stacked params kept;
                lax.scan inlines the bodies) — the landable variant
  scan_u5r      scan_u5 + remat

    python tools/bench_head_parts.py [roi,iter1,iter1_nr,scan,...]
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
from srfdet3d_tpu.models import head as head_mod  # noqa: E402
from srfdet3d_tpu.ops.roi_align import multilevel_roi_align  # noqa: E402


def _time(fn, tag, iters=8):
    t0 = time.perf_counter()
    float(jnp.sum(fn()))
    print(f"{tag}: compile+run {time.perf_counter() - t0:.0f}s", flush=True)
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        float(jnp.sum(fn()))
        ts.append(time.perf_counter() - t0)
    print(f"{tag}: p50 {np.percentile(ts, 50) * 1000:.1f} ms", flush=True)


def main():
    parts = sys.argv[1].split(",") if len(sys.argv) > 1 else [
        "roi", "iter1", "iter1_nr", "scan"]
    cfg = srfdet_voxel_nusc_L()
    h = cfg.head
    n_p = h.num_proposals
    print("device:", jax.devices()[0], flush=True)

    grid_h = int(round((cfg.pc_range[4] - cfg.pc_range[1])
                       / cfg.voxel_size[1]))
    grid_w = int(round((cfg.pc_range[3] - cfg.pc_range[0])
                       / cfg.voxel_size[0]))
    rng = np.random.default_rng(0)
    bev = tuple(jnp.asarray(rng.normal(size=(
        1, grid_h // s, grid_w // s, h.feat_channels_lidar)
    ).astype(np.float32)) for s in h.lidar_strides)
    print("bev levels:", [tuple(f.shape) for f in bev], flush=True)

    # realistic proposal boxes (normalized centers, smallish sizes)
    boxes = np.zeros((1, n_p, 10), np.float32)
    boxes[..., :3] = rng.uniform(0.05, 0.95, (1, n_p, 3))
    boxes[..., 3:6] = rng.normal(0.5, 0.3, (1, n_p, 3))
    yaw = rng.uniform(-np.pi, np.pi, (1, n_p))
    boxes[..., 6], boxes[..., 7] = np.sin(yaw), np.cos(yaw)
    boxes = jnp.asarray(boxes)
    boxes_abs = head_mod.denormalize_centers(boxes, cfg.pc_range)
    rois = head_mod.lidar_rois_from_boxes(
        boxes_abs, cfg.pc_range, cfg.voxel_size)     # (1, n_p, 4)

    if "roi" in parts:
        for tag, patch, fb in (("patch32", h.roi_patch or 32,
                                h.roi_patch_fallback),
                               ("pairs", 0, -1)):
            def roi5(feats, _patch=patch, _fb=fb):
                tot = 0.0
                for _ in range(5):
                    out = jax.vmap(
                        lambda f, r: multilevel_roi_align(
                            f, r, h.lidar_strides, out_size=7,
                            patch=_patch, patch_fallback=_fb))(feats, rois)
                    tot = tot + jnp.sum(out.astype(jnp.float32))
                return tot
            f = jax.jit(roi5)
            g = jax.jit(jax.grad(roi5))
            _time(lambda: f(bev), f"roi5 {tag} fwd")
            _time(lambda: g(bev)[0], f"roi5 {tag} grad")

    def make_single():
        return head_mod.SingleSRFDetHead(
            num_classes=h.num_classes,
            feat_channels=h.feat_channels_lidar,
            dim_feedforward=h.dim_feedforward,
            num_cls_convs=h.num_cls_convs,
            num_reg_convs=h.num_reg_convs,
            num_attn_heads=h.num_attn_heads,
            dropout=h.dropout,
            dynamic_dim=h.dynamic_dim,
            pc_range=tuple(cfg.pc_range),
            voxel_size=tuple(cfg.voxel_size),
            use_pts=True, use_img=False,
            lidar_strides=tuple(h.lidar_strides),
            roi_patch=h.roi_patch,
            roi_patch_fallback=h.roi_patch_fallback)

    if "iter1" in parts or "iter1_nr" in parts:
        single = make_single()
        prop0 = jnp.asarray(
            rng.normal(size=(1, n_p, h.feat_channels_lidar)), jnp.float32)
        params = jax.jit(lambda f: single.init(
            jax.random.PRNGKey(0), f, None, boxes, prop0,
            train=False))(bev)["params"]

        def run1(p, feats, nr):
            if nr:
                # freeze the RoI gather: grads flow through the proposal
                # network only
                feats = jax.tree.map(jax.lax.stop_gradient, feats)
            logits, pred, obj = single.apply(
                {"params": p}, feats, None, boxes, prop0, train=True,
                rngs={"dropout": jax.random.PRNGKey(1)})
            return (jnp.sum(logits.astype(jnp.float32)) +
                    jnp.sum(pred.astype(jnp.float32)) +
                    jnp.sum(obj.astype(jnp.float32)))

        for tag in [t for t in ("iter1", "iter1_nr") if t in parts]:
            nr = tag == "iter1_nr"
            f = jax.jit(lambda p, ft, _nr=nr: run1(p, ft, _nr))
            g = jax.jit(jax.grad(
                lambda p, ft, _nr=nr: run1(p, ft, _nr), argnums=(0, 1)))
            _time(lambda: f(params, bev), f"{tag} fwd")
            _time(lambda: g(params, bev)[0]["bboxes_delta"]["bias"],
                  f"{tag} grad")

    if "scan_unroll" in parts:
        prop0 = jnp.asarray(
            rng.normal(size=(1, n_p, h.feat_channels_lidar)), jnp.float32)
        singles = [make_single() for _ in range(5)]
        params_u = [jax.jit(lambda f, m=m: m.init(
            jax.random.PRNGKey(i), f, None, boxes, prop0,
            train=False))(bev)["params"]
            for i, m in enumerate(singles)]

        def run_unroll(ps, feats):
            bx, pf = boxes, prop0
            tot = 0.0
            for i, m in enumerate(singles):
                logits, pred, pf = m.apply(
                    {"params": ps[i]}, feats, None, bx, pf, train=True,
                    rngs={"dropout": jax.random.PRNGKey(10 + i)})
                bx = jax.lax.stop_gradient(pred)
                tot = (tot + jnp.sum(logits.astype(jnp.float32)) +
                       jnp.sum(pred.astype(jnp.float32)))
            return tot

        f = jax.jit(run_unroll)
        g = jax.jit(jax.grad(run_unroll, argnums=(0, 1)))
        _time(lambda: f(params_u, bev), "scan_unroll fwd")
        _time(lambda: g(params_u, bev)[1][0], "scan_unroll grad")

    scan_variants = [p for p in parts if p.startswith("scan")
                     and p != "scan_unroll"]
    for variant in scan_variants:
        head = head_mod.SRFDetHead(
            num_classes=h.num_classes,
            feat_channels_lidar=h.feat_channels_lidar,
            hidden_dim=h.hidden_dim,
            num_proposals=n_p,
            num_heads=h.num_heads,
            with_dpg=h.with_dpg,
            num_dpg_exp=h.num_dpg_exp,
            pc_range=tuple(cfg.pc_range),
            voxel_size=tuple(cfg.voxel_size),
            dim_feedforward=h.dim_feedforward,
            num_cls_convs=h.num_cls_convs,
            num_reg_convs=h.num_reg_convs,
            num_attn_heads=h.num_attn_heads,
            dropout=0.0 if variant == "scan_nodrop" else h.dropout,
            dynamic_dim=h.dynamic_dim,
            lidar_strides=tuple(h.lidar_strides),
            roi_patch=h.roi_patch,
            roi_patch_fallback=h.roi_patch_fallback,
            unroll_train=variant in ("scan_u5", "scan_u5r"),
            remat=variant in ("scan_remat", "scan_u5r"))
        variables = jax.jit(lambda f: head.init(
            jax.random.PRNGKey(0), f, train=False))(bev)

        def runh(p, feats, _head=head, _vars=variables):
            (logits, bxs), _ = _head.apply(
                {"params": p,
                 "batch_stats": _vars.get("batch_stats", {})},
                feats, train=True, mutable=["batch_stats"],
                rngs={"dropout": jax.random.PRNGKey(1)})
            return (jnp.sum(logits.astype(jnp.float32)) +
                    jnp.sum(bxs.astype(jnp.float32)))

        f = jax.jit(runh)
        g = jax.jit(jax.grad(runh, argnums=(0, 1)))
        _time(lambda: f(variables["params"], bev), f"{variant} fwd")
        _time(lambda: g(variables["params"], bev)[1][0], f"{variant} grad")


if __name__ == "__main__":
    main()
