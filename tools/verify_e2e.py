"""End-to-end verify drive (see .claude/skills/verify/SKILL.md).

Canonical slice through the public package boundary: SRFDetHead on
synthetic BEV features -> OTA srfdet_losses -> ~60 adamw steps -> decode;
the top decoded box must converge to a planted GT center.  Also sweeps
the eval surface (waymo/kitti/nuscenes) on the decoded output.

Run CPU-only:  env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
    PYTHONPATH=/root/repo python tools/verify_e2e.py
"""
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax
import jax.numpy as jnp
import numpy as np
import optax

from srfdet3d_tpu.assign import OTAConfig
from srfdet3d_tpu.models.head import SRFDetHead, decode_boxes
from srfdet3d_tpu.models.losses import LossConfig, srfdet_losses

PC = (-10.0, -10.0, -5.0, 10.0, 10.0, 3.0)
VS = (0.125, 0.125, 0.2)
B, NP, NCLS, C, NH = 2, 24, 4, 32, 2


def main():
    head = SRFDetHead(
        num_classes=NCLS, feat_channels_lidar=C, feat_channels_img=C * 2,
        hidden_dim=C, num_proposals=NP, num_heads=NH, num_dpg_exp=2,
        dim_feedforward=64, num_attn_heads=4, dynamic_dim=8,
        pc_range=PC, voxel_size=VS, use_img=False, dropout=0.1)
    rng = np.random.default_rng(0)
    sizes = [(20, 20), (10, 10), (5, 5), (3, 3)]
    feats = [jnp.asarray(rng.normal(size=(B, h, w, C)).astype(np.float32))
             for h, w in sizes]

    gt = np.zeros((B, 8, 9), np.float32)
    gt[:, 0, :7] = [-4.0, -3.0, -1.0, 1.8, 4.2, 1.6, 0.3]
    gt[:, 1, :7] = [5.0, 4.0, -0.5, 0.6, 0.8, 1.7, -1.1]
    gt = jnp.asarray(gt)
    labels = jnp.zeros((B, 8), jnp.int32)
    mask = jnp.zeros((B, 8), bool).at[:, :2].set(True)
    lcfg, ocfg = LossConfig(), OTAConfig()

    params = jax.jit(lambda r, f: head.init(r, f, train=False))(
        jax.random.PRNGKey(0), feats)
    tx = optax.adamw(2e-3)
    opt = tx.init(params)

    @jax.jit
    def step(params, opt, key):
        def loss_fn(p):
            (lg, bx), _ = head.apply(p, feats, train=True,
                                     mutable=["batch_stats"],
                                     rngs={"dropout": key})
            losses = srfdet_losses(lg, bx, gt, labels, mask, lcfg, ocfg,
                                   decoder_num_heads=NH)
            total = sum(v for k, v in losses.items() if "loss" in k)
            return total, losses
        (l, aux), g = jax.value_and_grad(loss_fn, has_aux=True)(params)
        up, opt = tx.update(g, opt, params)
        return optax.apply_updates(params, up), opt, l

    l0 = None
    key = jax.random.PRNGKey(1)
    for i in range(60):
        params, opt, l = step(params, opt, jax.random.fold_in(key, i))
        if l0 is None:
            l0 = float(l)
    print(f"loss {l0:.3f} -> {float(l):.3f}")
    assert np.isfinite(float(l)), "loss not finite"
    assert float(l) < 0.7 * l0, "loss did not drop below 70% of step 0"

    lg, bx = jax.jit(lambda p, f: head.apply(p, f, train=False))(
        params, feats)
    dec = decode_boxes(lg[-1], bx[-1], use_nms=True,
                       post_center_range=(-12, -12, -6, 12, 12, 4))
    boxes = np.asarray(dec["boxes"][0])
    scores = np.asarray(dec["scores"][0])
    top = boxes[int(np.argmax(scores))]
    d0 = float(np.hypot(top[0] + 4.0, top[1] + 3.0))
    d1 = float(np.hypot(top[0] - 5.0, top[1] - 4.0))
    print(f"top box {top[:2]} dist-to-GT {min(d0, d1):.3f} m")
    assert min(d0, d1) < 0.5, "top decoded box not near a planted GT"

    # all-masked GT batch: losses finite, bbox loss exactly 0
    losses0 = srfdet_losses(lg, bx, gt, labels,
                            jnp.zeros_like(mask), lcfg, ocfg,
                            decoder_num_heads=NH)
    assert all(np.isfinite(float(v)) for v in losses0.values())
    assert float(losses0["loss_bbox"]) == 0.0

    # eval surface on the decoded output (gravity-center z for iou_3d)
    from srfdet3d_tpu.evals import waymo_eval, kitti_eval
    k = np.argsort(-scores)[:10]
    gboxes = np.asarray(gt[0, :2, :7]).copy()
    pboxes = boxes[k][:, :7].copy()
    pboxes[:, 2] += 0.5 * pboxes[:, 5]   # bottom -> gravity center
    gtd = {"boxes": gboxes, "labels_name": np.array(["Car", "Car"]),
           "num_points": np.array([20, 20]),
           "velocity": np.array([[0.0, 0.0], [5.0, 0.0]])}
    pd = {"boxes": pboxes, "labels_name": np.array(["Car"] * len(k)),
          "scores": scores[k]}
    w = waymo_eval([gtd], [pd], ("Car",), range_breakdown=True,
                   velocity_breakdown=True)
    ke = kitti_eval([gtd], [pd], ("Car",))
    print(f"waymo AP_L1 {w['Car_AP_L1']:.3f} "
          f"stationary {w['Car_AP_L1_stationary']:.3f} "
          f"kitti easy {ke['Car_3d_easy']:.3f}")
    assert w["Car_AP_L1"] > 0.0
    print("VERIFY OK")


if __name__ == "__main__":
    main()
