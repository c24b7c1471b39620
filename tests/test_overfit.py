"""End-to-end learning test: the head overfits planted GTs and decode
recovers them (mirrors the reference's only quality gate — dataset-level
eval — at miniature scale)."""
import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from srfdet3d_tpu.assign import OTAConfig
from srfdet3d_tpu.models.head import SRFDetHead, decode_boxes
from srfdet3d_tpu.models.losses import LossConfig, srfdet_losses

PC = (-10.0, -10.0, -5.0, 10.0, 10.0, 3.0)
VS = (0.125, 0.125, 0.2)
B, NP, NCLS, C = 2, 24, 3, 32


@pytest.mark.slow
def test_head_overfits_and_decodes_planted_boxes():
    rng = np.random.default_rng(0)
    sizes = [(20, 20), (10, 10), (5, 5), (3, 3)]
    feats = [jnp.asarray(rng.normal(size=(B, h, w, C)).astype(np.float32))
             for h, w in sizes]

    gt = np.zeros((B, 4, 9), np.float32)
    gt[:, 0, :7] = [3.0, 2.0, -1.0, 1.8, 4.2, 1.6, 0.3]
    gt[:, 1, :7] = [-4.0, -3.0, -0.5, 0.6, 0.8, 1.7, -1.2]
    labels = np.zeros((B, 4), np.int32)
    labels[:, 1] = 2
    mask = np.zeros((B, 4), bool)
    mask[:, :2] = True
    gt_j, labels_j, mask_j = map(jnp.asarray, (gt, labels, mask))

    head = SRFDetHead(num_classes=NCLS, feat_channels_lidar=C, hidden_dim=C,
                      num_proposals=NP, num_heads=2, num_dpg_exp=2,
                      dim_feedforward=64, num_attn_heads=4, dynamic_dim=8,
                      pc_range=PC, voxel_size=VS, dropout=0.0)
    variables = head.init(jax.random.PRNGKey(0), feats, train=False)
    params, batch_stats = variables["params"], variables["batch_stats"]
    lcfg, ocfg = LossConfig(num_classes=NCLS), OTAConfig(pc_range=PC)
    tx = optax.adamw(2e-3)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, batch_stats, opt_state):
        def loss_fn(p):
            (lg, bx), upd = head.apply(
                {"params": p, "batch_stats": batch_stats}, feats,
                train=True, rngs={"dropout": jax.random.PRNGKey(1)},
                mutable=["batch_stats"])
            losses = srfdet_losses(lg, bx, gt_j, labels_j, mask_j, lcfg,
                                   ocfg)
            return sum(losses.values()), upd["batch_stats"]
        (total, bs), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), bs, opt_state, total

    first = None
    for i in range(60):
        params, batch_stats, opt_state, total = step(
            params, batch_stats, opt_state)
        if i == 0:
            first = float(total)
    last = float(total)
    assert last < first * 0.5, f"loss {first} -> {last}"

    lg, bx = head.apply({"params": params, "batch_stats": batch_stats},
                        feats, train=False)
    out = decode_boxes(lg[-1], bx[-1], max_per_img=6, score_thr=0.05)
    v = np.asarray(out["valid"][0])
    assert v.any(), "no detections after overfit"
    boxes = np.asarray(out["boxes"][0])[v]
    # top box lands within 1 m BEV of a planted GT center
    err = min(np.linalg.norm(boxes[0][:2] - gt[0, g, :2]) for g in range(2))
    assert err < 1.0, f"top box {boxes[0][:2]} vs GTs {gt[0, :2, :2]}"
