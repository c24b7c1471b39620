"""Pillar-family end-to-end: PillarFeatureNet -> scatter -> SECOND ->
pool-extras FPN -> head, on the tiny pillar config (mirrors the
srfdet_pillar_nusc_L path, reference srfdet_pillar_nusc_L.py)."""
import numpy as np
import jax

from srfdet3d_tpu.configs import tiny_pillar_test_config
from srfdet3d_tpu.models.detector import SRFDet
from srfdet3d_tpu.models.losses import srfdet_losses

import __graft_entry__ as graft

B = 1


def test_pillar_style_forward_loss_decode():
    cfg = tiny_pillar_test_config()
    batch = graft._synthetic_batch(cfg, B, with_gt=True)

    model = SRFDet(cfg)
    variables = jax.jit(lambda r, b: model.init(r, b, train=False))(
        jax.random.PRNGKey(0), batch)
    # pillar pts_neck uses max-pool extras: no extra conv params exist
    assert not any(k.startswith("extra")
                   for k in variables["params"]["pts_neck"])
    logits, boxes = jax.jit(
        lambda v, b: model.apply(v, b, train=False))(variables, batch)
    assert boxes.shape == (2, B, cfg.head.num_proposals, 10)
    assert np.isfinite(np.asarray(boxes)).all()

    losses = jax.jit(lambda lg, bx: srfdet_losses(
        lg, bx, batch["gt_boxes"], batch["gt_labels"],
        batch["gt_mask"], cfg.loss, cfg.ota))(logits, boxes)
    for k, v in losses.items():
        assert np.isfinite(float(v)), k

    out = jax.jit(lambda v, b: model.apply(v, b, method=SRFDet.predict))(
        variables, batch)
    assert out["boxes"].shape == (B, cfg.test.max_per_img, 9)
    assert np.isfinite(np.asarray(out["boxes"])).all()
