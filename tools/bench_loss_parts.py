"""Decompose the OTA loss cost at flagship scale (session-9 bisect put the
loss machinery at ~75 ms fwd / ~69 ms extra in grad on top of the head).

Times, each as its own cached jitted program with a scalar readback:
  assign   six ota_assign_batch layers (stop-gradient path)
  layerls  _layer_losses with a fixed precomputed assignment (fwd + grad)
  full     srfdet_losses fwd on detached head outputs
  iou      6x iou_3d (900 x G)
  sort     6x double argsort of the (900, G) cost
  loop     the guarantee while_loop alone (6 layers)

    python tools/bench_loss_parts.py [parts,comma,separated]
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
from srfdet3d_tpu.assign import ota  # noqa: E402
from srfdet3d_tpu.models.losses import _layer_losses, srfdet_losses  # noqa: E402
from srfdet3d_tpu.geometry.iou import iou_3d  # noqa: E402


def _time(fn, tag, iters=10):
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
        "assign", "layerls", "full", "iou", "sort", "loop"]
    cfg = srfdet_voxel_nusc_L()
    n_p, n_cls = cfg.head.num_proposals, cfg.head.num_classes
    L, B, G = cfg.head.num_heads + 1, 1, cfg.gt_cap
    print(f"device: {jax.devices()[0]} L={L} B={B} n_p={n_p} G={G}",
          flush=True)

    rng = np.random.default_rng(0)
    logits = jnp.asarray(rng.normal(size=(L, B, n_p, n_cls)) * 2,
                         jnp.float32)
    boxes = np.zeros((L, B, n_p, 10), np.float32)
    boxes[..., :3] = rng.uniform(-50, 50, (L, B, n_p, 3))
    boxes[..., 2] = rng.uniform(-3, 1, (L, B, n_p))
    boxes[..., 3:6] = rng.normal(0.5, 0.3, (L, B, n_p, 3))
    yaw = rng.uniform(-np.pi, np.pi, (L, B, n_p))
    boxes[..., 6], boxes[..., 7] = np.sin(yaw), np.cos(yaw)
    boxes = jnp.asarray(boxes)
    gt = np.zeros((B, G, 9), np.float32)
    gt[..., :2] = rng.uniform(-50, 50, (B, G, 2))
    gt[..., 2] = rng.uniform(-2, 0, (B, G))
    gt[..., 3:6] = rng.uniform(0.5, 4, (B, G, 3))
    gt[..., 6] = rng.uniform(-np.pi, np.pi, (B, G))
    gt = jnp.asarray(gt)
    gl = jnp.asarray(rng.integers(0, n_cls, (B, G)), jnp.int32)
    gm = jnp.zeros((B, G), bool).at[:, :20].set(True)

    if "assign" in parts:
        @jax.jit
        def assign_all(bx, lg):
            outs = []
            for layer in range(L):
                hi = L if layer == L - 1 else layer + 1
                outs.append(ota.ota_assign_batch(
                    bx[layer], lg[layer], gt, gl, gm, hi, cfg.ota))
            return sum(jnp.sum(o) for o in outs)
        _time(lambda: assign_all(boxes, logits), "assign 6 layers")

    matched = jax.jit(lambda bx, lg: ota.ota_assign_batch(
        bx[0], lg[0], gt, gl, gm, 1, cfg.ota))(boxes, logits)

    if "layerls" in parts:
        @jax.jit
        def lls(lg, bx):
            tot = 0.0
            for layer in range(L):
                c, b = _layer_losses(lg[layer], bx[layer], matched, gt, gl,
                                     cfg.loss)
                tot = tot + c + b
            return tot
        _time(lambda: lls(logits, boxes), "layer-losses x6 fwd")
        g = jax.jit(jax.grad(lambda lg, bx: lls(lg, bx), argnums=(0, 1)))
        _time(lambda: g(logits, boxes)[0], "layer-losses x6 grad")

    if "full" in parts:
        @jax.jit
        def full(lg, bx):
            d = srfdet_losses(lg, bx, gt, gl, gm, cfg.loss, cfg.ota,
                              decoder_num_heads=cfg.head.num_heads)
            return sum(jnp.sum(v) for v in jax.tree.leaves(d))
        _time(lambda: full(logits, boxes), "srfdet_losses fwd")
        gf = jax.jit(jax.grad(full, argnums=(0, 1)))
        _time(lambda: gf(logits, boxes)[0], "srfdet_losses grad")

    if "iou" in parts:
        @jax.jit
        def iou6(bx):
            tot = 0.0
            for layer in range(L):
                tot = tot + jnp.sum(iou_3d(bx[layer, 0, :, :7], gt[0, :, :7]))
            return tot
        _time(lambda: iou6(boxes), "iou_3d x6")

    if "sort" in parts:
        cost = jnp.asarray(rng.normal(size=(L, n_p, G)), jnp.float32)

        @jax.jit
        def sorts(c):
            tot = 0.0
            for layer in range(L):
                order = jnp.argsort(c[layer], axis=0)
                ranks = jnp.argsort(order, axis=0)
                tot = tot + jnp.sum(ranks)
            return tot
        _time(lambda: sorts(cost), "double argsort x6")

    if "loop" in parts:
        cost = jnp.abs(jnp.asarray(rng.normal(size=(n_p, G)), jnp.float32))
        m0 = jnp.zeros((n_p, G), jnp.float32)

        @jax.jit
        def loop6(c):
            tot = 0.0
            for _ in range(L):
                def unm(m):
                    return gm[0] & (jnp.sum(m, axis=0) == 0)

                def cond(s):
                    m, _, it = s
                    return jnp.any(unm(m)) & (it < G + n_p)

                def body(s):
                    m, cc, it = s
                    mp = jnp.sum(m, axis=1) > 0
                    cc = cc + 1e5 * mp[:, None].astype(jnp.float32)
                    un = unm(m)
                    bp = jnp.argmin(cc, axis=0)
                    add = jax.nn.one_hot(bp, n_p, dtype=m.dtype).T
                    m = jnp.where(un[None, :], jnp.maximum(m, add), m)
                    m = ota._dedup_rows(m, cc)
                    return m, cc, it + 1
                m, _, _ = jax.lax.while_loop(cond, body, (m0, c, jnp.int32(0)))
                tot = tot + jnp.sum(m)
            return tot
        _time(lambda: loop6(cost), "guarantee loop x6")


if __name__ == "__main__" and "worst" not in sys.argv[1:]:
    main()


def worst_case():
    """Adversarial assignment inputs mimicking head-at-init: all proposals
    at the same point, many valid GTs -> the guarantee loop must match
    them one-ish at a time.  Run with `python ... worst`."""
    cfg = srfdet_voxel_nusc_L()
    n_p, n_cls = cfg.head.num_proposals, cfg.head.num_classes
    L, B, G = cfg.head.num_heads + 1, 1, cfg.gt_cap
    rng = np.random.default_rng(1)
    logits = jnp.zeros((L, B, n_p, n_cls), jnp.float32)
    boxes = np.zeros((L, B, n_p, 10), np.float32)
    boxes[..., :3] = 0.5          # every proposal identical
    boxes[..., 7] = 1.0
    boxes = jnp.asarray(boxes)
    gt = np.zeros((B, G, 9), np.float32)
    gt[..., :2] = rng.uniform(-50, 50, (B, G, 2))
    gt[..., 3:6] = rng.uniform(0.5, 4, (B, G, 3))
    gt = jnp.asarray(gt)
    gl = jnp.zeros((B, G), jnp.int32)
    gm = jnp.zeros((B, G), bool).at[:, :64].set(True)

    @jax.jit
    def assign_all(bx, lg):
        outs = []
        for layer in range(L):
            hi = L if layer == L - 1 else layer + 1
            outs.append(ota.ota_assign_batch(
                bx[layer], lg[layer], gt, gl, gm, hi, cfg.ota))
        return sum(jnp.sum(o) for o in outs)
    _time(lambda: assign_all(boxes, logits), "assign 6 layers WORST")


if "worst" in sys.argv[1:]:
    worst_case()


def worst_full():
    """srfdet_losses (layer-vmapped assignments) on the adversarial
    inputs; compare against `worst`'s sequential per-layer figure."""
    cfg = srfdet_voxel_nusc_L()
    n_p, n_cls = cfg.head.num_proposals, cfg.head.num_classes
    L, B, G = cfg.head.num_heads + 1, 1, cfg.gt_cap
    rng = np.random.default_rng(1)
    logits = jnp.zeros((L, B, n_p, n_cls), jnp.float32)
    boxes = np.zeros((L, B, n_p, 10), np.float32)
    boxes[..., :3] = 0.5
    boxes[..., 7] = 1.0
    boxes = jnp.asarray(boxes)
    gt = np.zeros((B, G, 9), np.float32)
    gt[..., :2] = rng.uniform(-50, 50, (B, G, 2))
    gt[..., 3:6] = rng.uniform(0.5, 4, (B, G, 3))
    gt = jnp.asarray(gt)
    gl = jnp.zeros((B, G), jnp.int32)
    gm = jnp.zeros((B, G), bool).at[:, :64].set(True)

    @jax.jit
    def full(lg, bx):
        d = srfdet_losses(lg, bx, gt, gl, gm, cfg.loss, cfg.ota,
                          decoder_num_heads=cfg.head.num_heads)
        return sum(jnp.sum(v) for v in jax.tree.leaves(d))
    _time(lambda: full(logits, boxes), "srfdet_losses WORST (vmapped)")
    gf = jax.jit(jax.grad(full, argnums=(0, 1)))
    _time(lambda: gf(logits, boxes)[0], "srfdet_losses WORST grad")


if "worstfull" in sys.argv[1:]:
    worst_full()
