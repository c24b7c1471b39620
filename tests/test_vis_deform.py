"""Visualizer output files + deformable BEV encoder shapes/grads."""
import os
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from srfdet3d_tpu.vis import (show_bev_result, show_multi_modality_result,
                              write_obj, write_ply)
from srfdet3d_tpu.models.deform_attn import (LidarBEVEncoder,
                                             MSDeformAttention)
from srfdet3d_tpu.configs import tiny_test_config
from srfdet3d_tpu.models.head import SRFDetHead


def _boxes(n=3):
    rng = np.random.default_rng(0)
    b = np.zeros((n, 7), np.float32)
    b[:, 0:2] = rng.uniform(-8, 8, (n, 2))
    b[:, 2] = -1.5
    b[:, 3:6] = rng.uniform(1, 3, (n, 3))
    b[:, 6] = rng.uniform(-np.pi, np.pi, n)
    return b


def test_bev_and_projection_render(tmp_path):
    rng = np.random.default_rng(1)
    pts = rng.uniform(-10, 10, (500, 3)).astype(np.float32)
    gt, pred = _boxes(), _boxes(4)
    out = show_bev_result(pts, gt, pred, str(tmp_path / "bev.png"),
                          pc_range=(-10, -10, -5, 10, 10, 3),
                          pred_labels=np.array([0, 1, 2, 3]))
    assert os.path.exists(tmp_path / "bev.png")
    assert out.sum() > 0                       # something was drawn

    img = np.zeros((120, 160, 3), np.uint8)
    l2i = np.array([[100, 0, 80, 0], [0, 100, 60, 0],
                    [0, 0, 1, 0], [0, 0, 0, 1]], np.float32)
    b = _boxes(2)
    b[:, 0] = 0.5
    b[:, 1] = 0.2
    b[:, 2] = 5.0                              # in front of the camera (+z)
    out2 = show_multi_modality_result(img, b, l2i,
                                      str(tmp_path / "cam.png"))
    assert os.path.exists(tmp_path / "cam.png")

    write_obj(np.concatenate([pts, np.full((500, 3), 128)], 1),
              str(tmp_path / "p.obj"))
    write_ply(gt, str(tmp_path / "b.ply"))
    assert os.path.getsize(tmp_path / "p.obj") > 0
    assert os.path.getsize(tmp_path / "b.ply") > 0


@pytest.mark.slow
def test_deform_attention_shapes_and_grad():
    rng = np.random.default_rng(2)
    b, q, c = 2, 12, 32
    levels = [jnp.asarray(rng.normal(size=(b, h, w, c)).astype(np.float32))
              for h, w in [(16, 16), (8, 8)]]
    query = jnp.asarray(rng.normal(size=(b, q, c)).astype(np.float32))
    ref = jnp.asarray(rng.uniform(0.1, 0.9, (b, q, 2)).astype(np.float32))
    m = MSDeformAttention(c, num_heads=4, num_points=2)
    params = jax.jit(m.init)(jax.random.PRNGKey(0), query, levels, ref)
    out = jax.jit(m.apply)(params, query, levels, ref)
    assert out.shape == (b, q, c)

    def loss(p):
        return jnp.sum(m.apply(p, query, levels, ref) ** 2)
    g = jax.jit(jax.grad(loss))(params)
    assert all(np.isfinite(np.asarray(x)).all()
               for x in jax.tree_util.tree_leaves(g))
    # sampling offsets zero-init -> output is value at reference points;
    # attention weights see gradient through softmax taps
    assert np.isfinite(float(loss(params)))


@pytest.mark.slow
def test_head_with_lidar_encoder():
    rng = np.random.default_rng(3)
    cfg = tiny_test_config()
    head = SRFDetHead(
        num_classes=3, feat_channels_lidar=32, hidden_dim=32,
        num_proposals=8, num_heads=1, num_dpg_exp=2, dim_feedforward=64,
        num_attn_heads=4, dynamic_dim=8, dropout=0.0,
        with_lidar_encoder=True, pc_range=cfg.pc_range,
        voxel_size=cfg.voxel_size)
    feats = [jnp.asarray(rng.normal(size=(1, h, w, 32)).astype(np.float32))
             for h, w in [(10, 10), (5, 5), (3, 3), (2, 2)]]
    variables = jax.jit(lambda r, f: head.init(r, f, train=False))(
        jax.random.PRNGKey(0), feats)
    assert "lidar_encoder" in variables["params"]
    logits, boxes = jax.jit(
        lambda v, f: head.apply(v, f, train=False))(variables, feats)
    assert np.isfinite(np.asarray(logits)).all()
    assert np.isfinite(np.asarray(boxes)).all()
