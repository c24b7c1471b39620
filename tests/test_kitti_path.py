"""Code-size-8 path (KITTI/Waymo): dynamic VFE, conv_module encoder,
8-d box code through forward, loss and decode."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from srfdet3d_tpu.configs import tiny_kitti_test_config
from srfdet3d_tpu.models.detector import SRFDet
from srfdet3d_tpu.models.losses import srfdet_losses

import __graft_entry__ as graft

B = 2


def test_kitti_style_forward_loss_decode():
    cfg = tiny_kitti_test_config()
    rng = np.random.default_rng(0)
    batch = graft._synthetic_batch(cfg, B, with_gt=True)
    assert batch["gt_boxes"].shape[-1] == 7        # no velocity

    model = SRFDet(cfg)
    variables = jax.jit(lambda r, b: model.init(r, b, train=False))(
        jax.random.PRNGKey(0), batch)
    logits, boxes = jax.jit(
        lambda v, b: model.apply(v, b, train=False))(variables, batch)
    assert boxes.shape == (2, B, cfg.head.num_proposals, 8)
    assert np.isfinite(np.asarray(boxes)).all()

    losses = jax.jit(lambda lg, bx: srfdet_losses(
        lg, bx, batch["gt_boxes"], batch["gt_labels"],
        batch["gt_mask"], cfg.loss, cfg.ota))(logits, boxes)
    for k, v in losses.items():
        assert np.isfinite(float(v)), k

    out = jax.jit(lambda v, b: model.apply(v, b, method=SRFDet.predict))(
        variables, batch)
    assert out["boxes"].shape == (B, cfg.test.max_per_img, 7)
    assert np.isfinite(np.asarray(out["boxes"])).all()


@pytest.mark.slow
def test_kitti_style_train_grads():
    cfg = tiny_kitti_test_config()
    batch = graft._synthetic_batch(cfg, B, with_gt=True)
    model = SRFDet(cfg)
    variables = model.init(jax.random.PRNGKey(0), batch, train=False)

    def loss_fn(params):
        (lg, bx), _ = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            batch, train=True, mutable=["batch_stats"],
            rngs={"dropout": jax.random.PRNGKey(1)})
        losses = srfdet_losses(lg, bx, batch["gt_boxes"],
                               batch["gt_labels"], batch["gt_mask"],
                               cfg.loss, cfg.ota)
        return sum(losses.values())

    total, grads = jax.value_and_grad(loss_fn)(variables["params"])
    assert np.isfinite(float(total))
    assert all(np.isfinite(np.asarray(g)).all()
               for g in jax.tree_util.tree_leaves(grads))
