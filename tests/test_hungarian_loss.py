"""Hungarian/auction loss paths produce finite matched losses."""
import numpy as np
import jax.numpy as jnp
import pytest

from srfdet3d_tpu.assign import OTAConfig
from srfdet3d_tpu.models.losses import LossConfig, srfdet_losses


def _outputs(rng, layers=2, b=2, n_p=16, ncls=3):
    logits = jnp.asarray(
        rng.normal(-2, 1, (layers, b, n_p, ncls)).astype(np.float32))
    boxes = np.zeros((layers, b, n_p, 10), np.float32)
    boxes[..., 0:2] = rng.uniform(-8, 8, (layers, b, n_p, 2))
    boxes[..., 2] = rng.uniform(-2, 0, (layers, b, n_p))
    boxes[..., 3:6] = np.log(rng.uniform(0.5, 3, (layers, b, n_p, 3)))
    yaw = rng.uniform(-np.pi, np.pi, (layers, b, n_p))
    boxes[..., 6], boxes[..., 7] = np.sin(yaw), np.cos(yaw)
    gt = np.zeros((b, 4, 9), np.float32)
    gt[..., 0:2] = rng.uniform(-8, 8, (b, 4, 2))
    gt[..., 3:6] = rng.uniform(0.5, 3, (b, 4, 3))
    labels = rng.integers(0, ncls, (b, 4)).astype(np.int32)
    mask = np.zeros((b, 4), bool)
    mask[:, :2] = True
    return logits, jnp.asarray(boxes), jnp.asarray(gt), \
        jnp.asarray(labels), jnp.asarray(mask)


@pytest.mark.parametrize("assigner", ["hungarian", "auction"])
def test_hungarian_style_losses(assigner):
    rng = np.random.default_rng(0)
    logits, boxes, gt, labels, mask = _outputs(rng)
    losses = srfdet_losses(
        logits, boxes, gt, labels, mask,
        LossConfig(num_classes=3, assigner=assigner),
        OTAConfig(pc_range=(-10, -10, -5, 10, 10, 3)))
    for k, v in losses.items():
        assert np.isfinite(float(v)), (k, float(v))
    assert float(losses["loss_bbox"]) > 0
