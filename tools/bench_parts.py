"""Streamed per-subgraph profile of the flagship predict path.

Each part is jitted separately and dispatched ITERS times with ONE final
readback, so the ~30-40 ms tunnel sync amortizes away (PERF.md: single-op
timings below ~15 ms are readback noise).  Submodules run standalone on
their param subtrees; the encoder+VFE share is derived by subtraction.

    python tools/bench_parts.py [bfloat16]
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
from srfdet3d_tpu.configs import srfdet_voxel_nusc_L  # noqa: E402
from srfdet3d_tpu.models.detector import SRFDet  # noqa: E402
from srfdet3d_tpu.models.second import SECOND  # noqa: E402
from srfdet3d_tpu.models.fpn import FPN  # noqa: E402
from srfdet3d_tpu.models.head import SRFDetHead, decode_boxes  # noqa: E402
from srfdet3d_tpu.ops.voxelize import voxelize_points  # noqa: E402

ITERS = 20


def stream_ms(fn, *args):
    def burst(n):
        t0 = time.perf_counter()
        outs = [fn(*args) for _ in range(n)]
        s = float(jnp.sum(jnp.stack(
            [jax.tree_util.tree_leaves(o)[0].ravel()[:8]
             .astype(jnp.float32).sum() for o in outs])))
        assert np.isfinite(s)
        return (time.perf_counter() - t0) / n * 1000

    out = fn(*args)
    jax.block_until_ready(out)
    burst(5)        # the FIRST streamed burst of a process reads ~80 ms
    burst(5)        # regardless of op (warmup artifact) — discard two
    return min(burst(ITERS), burst(ITERS))


def main():
    dtype = sys.argv[1] if len(sys.argv) > 1 else "float32"
    cfg = srfdet_voxel_nusc_L()
    if dtype != "float32":
        cfg = dataclasses.replace(cfg, compute_dtype=dtype)
    print(f"device {jax.devices()[0]} dtype {dtype}", flush=True)
    batch = _synthetic_batch(cfg, batch_size=1)
    model = SRFDet(cfg)
    variables = jax.jit(lambda r, b: model.init(r, b, train=False))(
        jax.random.PRNGKey(0), batch)
    p, bs_ = variables["params"], variables.get("batch_stats", {})
    jdt = jnp.bfloat16 if dtype == "bfloat16" else jnp.float32

    spec = cfg.voxelization
    from srfdet3d_tpu.ops.voxelize import voxelize_points_batched
    vox_fn = jax.jit(lambda pts, m: voxelize_points_batched(pts, m, spec))
    print(f"voxelize (batched): "
          f"{stream_ms(vox_fn, batch['points'], batch['points_mask']):.1f} "
          f"ms", flush=True)

    fwd_fn = jax.jit(lambda v, b: model.apply(v, b, train=False))
    t_fwd = stream_ms(fwd_fn, variables, batch)
    print(f"full forward (no decode): {t_fwd:.1f} ms", flush=True)
    feats_fn = None
    feats = None

    # SECOND+FPN standalone on a BEV-shaped input
    nx = int(round((cfg.pc_range[3] - cfg.pc_range[0]) / cfg.voxel_size[0]))
    hw = nx // cfg.out_size_factor
    rng = np.random.default_rng(0)
    bev = jnp.asarray(rng.normal(size=(
        1, hw, hw, 2 * cfg.middle.output_channels)).astype(np.float32)
    ).astype(jdt)
    second = SECOND(out_channels=cfg.backbone.out_channels,
                    layer_nums=cfg.backbone.layer_nums,
                    layer_strides=cfg.backbone.layer_strides, dtype=jdt)
    sec_vars = {"params": p["pts_backbone"],
                "batch_stats": bs_["pts_backbone"]}
    sec_fn = jax.jit(lambda v, x: second.apply(v, x, train=False))
    stages = sec_fn(sec_vars, bev)
    print(f"SECOND: {stream_ms(sec_fn, sec_vars, bev):.1f} ms", flush=True)

    fpn = FPN(out_channels=cfg.neck_out_channels,
              num_outs=cfg.neck_num_outs, use_norm=True, use_act=True,
              dtype=jdt)
    fpn_vars = {"params": p["pts_neck"], "batch_stats": bs_["pts_neck"]}
    fpn_fn = jax.jit(lambda v, x: fpn.apply(v, x, train=False))
    print(f"FPN: {stream_ms(fpn_fn, fpn_vars, stages):.1f} ms", flush=True)

    h = cfg.head
    head = SRFDetHead(
        num_classes=cfg.num_classes,
        feat_channels_lidar=h.feat_channels_lidar,
        num_proposals=h.num_proposals, num_heads=h.num_heads,
        with_dpg=h.with_dpg, num_dpg_exp=h.num_dpg_exp,
        pc_range=tuple(cfg.pc_range), voxel_size=tuple(cfg.voxel_size),
        dim_feedforward=h.dim_feedforward, dynamic_dim=h.dynamic_dim,
        lidar_strides=tuple(h.lidar_strides), dtype=jdt)
    head_vars = {"params": p["bbox_head"], "batch_stats": bs_["bbox_head"]}
    # synthetic BEV pyramid matching the neck output shapes
    feats = []
    hw0 = hw
    for _ in range(cfg.neck_num_outs):
        feats.append(jnp.asarray(rng.normal(size=(
            1, hw0, hw0, cfg.neck_out_channels)).astype(np.float32)
        ).astype(jdt))
        hw0 //= 2
    feats = tuple(feats)
    head_fn = jax.jit(lambda v, f: head.apply(v, list(f), None, None,
                                              train=False))
    out = head_fn(head_vars, feats)
    print(f"decoder head: {stream_ms(head_fn, head_vars, feats):.1f} ms",
          flush=True)

    t = cfg.test
    dec_fn = jax.jit(lambda o: decode_boxes(
        o[0][-1], o[1][-1], use_nms=t.use_nms,
        nms_thr=t.nms_thr, score_thr=t.score_thr,
        max_per_img=t.max_per_img,
        post_center_range=t.post_center_range))
    print(f"decode+NMS: {stream_ms(dec_fn, out):.1f} ms", flush=True)

    full = jax.jit(lambda v, b: model.apply(v, b, method=SRFDet.predict))
    print(f"FULL predict: {stream_ms(full, variables, batch):.1f} ms",
          flush=True)


if __name__ == "__main__":
    main()
