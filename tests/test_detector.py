"""End-to-end detector tests on the tiny config (synthetic scenes)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from srfdet3d_tpu.configs import tiny_test_config, get_config, CONFIGS
from srfdet3d_tpu.config import ImgBranchConfig
from srfdet3d_tpu.models.detector import SRFDet
from srfdet3d_tpu.models.losses import srfdet_losses

B = 2


def _batch(cfg, rng, with_img=False):
    p = cfg.points_cap
    pts = np.zeros((B, p, cfg.points_dim), np.float32)
    n_real = p // 2
    pts[:, :n_real, 0:2] = rng.uniform(-9, 9, (B, n_real, 2))
    pts[:, :n_real, 2] = rng.uniform(-3, 1, (B, n_real))
    pts[:, :n_real, 3:] = rng.uniform(0, 1, (B, n_real,
                                             cfg.points_dim - 3))
    mask = np.zeros((B, p), bool)
    mask[:, :n_real] = True
    batch = {"points": jnp.asarray(pts), "points_mask": jnp.asarray(mask)}
    if with_img:
        n_cam, (h, w) = cfg.img.num_cams, (64, 96)
        batch["images"] = jnp.asarray(
            rng.normal(size=(B, n_cam, h, w, 3)).astype(np.float32))
        l2i = np.broadcast_to(np.eye(4, dtype=np.float32),
                              (B, n_cam, 4, 4)).copy()
        batch["lidar2img"] = jnp.asarray(l2i)
    return batch


def test_lidar_detector_forward_and_predict():
    cfg = tiny_test_config()
    rng = np.random.default_rng(0)
    batch = _batch(cfg, rng)
    model = SRFDet(cfg)
    # jit init/apply: eager dispatch of the full detector graph is minutes
    # on CPU; one jitted program compiles once and hits the persistent cache
    variables = jax.jit(lambda r, b: model.init(r, b, train=False))(
        jax.random.PRNGKey(0), batch)
    logits, boxes = jax.jit(
        lambda v, b: model.apply(v, b, train=False))(variables, batch)
    L = cfg.head.num_heads
    assert logits.shape == (L, B, cfg.head.num_proposals, cfg.num_classes)
    assert boxes.shape == (L, B, cfg.head.num_proposals, cfg.head.code_size)
    assert np.all(np.isfinite(np.asarray(logits)))
    assert np.all(np.isfinite(np.asarray(boxes)))

    out = jax.jit(lambda v, b: model.apply(v, b, method=SRFDet.predict))(
        variables, batch)
    assert out["boxes"].shape == (B, cfg.test.max_per_img, 9)


@pytest.mark.slow
def test_lidar_detector_train_losses():
    cfg = tiny_test_config()
    rng = np.random.default_rng(1)
    batch = _batch(cfg, rng)
    g = cfg.gt_cap
    gt = np.zeros((B, g, 9), np.float32)
    gt[..., 0:2] = rng.uniform(-8, 8, (B, g, 2))
    gt[..., 2] = rng.uniform(-2, 0, (B, g))
    gt[..., 3:6] = rng.uniform(0.5, 3.0, (B, g, 3))
    labels = rng.integers(0, cfg.num_classes, (B, g)).astype(np.int32)
    gmask = np.zeros((B, g), bool)
    gmask[:, :3] = True

    model = SRFDet(cfg)
    variables = model.init(jax.random.PRNGKey(0), batch, train=False)

    def loss_fn(params):
        (lg, bx), _ = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            batch, train=True, mutable=["batch_stats"],
            rngs={"dropout": jax.random.PRNGKey(2),
                  "grid_mask": jax.random.PRNGKey(3)})
        losses = srfdet_losses(lg, bx, jnp.asarray(gt), jnp.asarray(labels),
                               jnp.asarray(gmask), cfg.loss, cfg.ota)
        return sum(losses.values())

    total, grads = jax.value_and_grad(loss_fn)(variables["params"])
    assert np.isfinite(float(total))
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.all(np.isfinite(np.asarray(gr))) for gr in leaves)


def test_fusion_detector_forward():
    import dataclasses
    cfg = tiny_test_config(
        use_img=True,
        img=ImgBranchConfig(backbone="vovnet-19-slim", num_cams=2,
                            neck_out_channels=64, use_grid_mask=True))
    cfg = cfg.replace(
        head=dataclasses.replace(cfg.head, feat_channels_img=64))
    rng = np.random.default_rng(2)
    batch = _batch(cfg, rng, with_img=True)
    model = SRFDet(cfg)
    variables = jax.jit(lambda r, b: model.init(r, b, train=False))(
        jax.random.PRNGKey(0), batch)
    logits, boxes = jax.jit(
        lambda v, b: model.apply(v, b, train=False))(variables, batch)
    assert np.all(np.isfinite(np.asarray(logits)))
    assert np.all(np.isfinite(np.asarray(boxes)))


def test_all_named_configs_construct():
    for name in CONFIGS:
        cfg = get_config(name)
        assert cfg.name == name
        assert cfg.num_classes == len(cfg.class_names)
        assert len(cfg.grid_size) == 3


def test_fpn_pool_extra_levels_match_mmdet_semantics():
    """extra_convs=False must reproduce mmdet's default
    F.max_pool2d(out[-1], 1, stride=2) extra levels (parameter-free
    subsample) used by the pillar/KITTI pts_necks."""
    from srfdet3d_tpu.models.fpn import FPN
    rng = np.random.default_rng(0)
    ins = [jnp.asarray(rng.normal(size=(2, 16, 16, 8)).astype(np.float32)),
           jnp.asarray(rng.normal(size=(2, 8, 8, 12)).astype(np.float32))]
    fpn = FPN(out_channels=8, num_outs=4, extra_convs=False)
    vars_ = fpn.init(jax.random.PRNGKey(0), ins)
    outs = fpn.apply(vars_, ins)
    assert len(outs) == 4
    # no extra conv params exist
    assert not any(k.startswith("extra") for k in vars_["params"])
    np.testing.assert_array_equal(np.asarray(outs[2]),
                                  np.asarray(outs[1][:, ::2, ::2, :]))
    np.testing.assert_array_equal(np.asarray(outs[3]),
                                  np.asarray(outs[2][:, ::2, ::2, :]))


@pytest.mark.slow
def test_fusion_detector_no_img_reduce_path():
    """waymo_LC-style wiring: feat_channels_img == hidden_dim means NO
    img_convs channel reduce (reference srfdet_head.py:147-158 builds the
    convs only on mismatch); BN+ReLU img neck."""
    import dataclasses
    cfg = tiny_test_config(
        use_img=True,
        img=ImgBranchConfig(backbone="vovnet-19-slim", num_cams=2,
                            neck_out_channels=32, neck_norm=True))
    cfg = cfg.replace(
        head=dataclasses.replace(cfg.head, feat_channels_img=32))
    assert cfg.head.hidden_dim == 32 == cfg.head.feat_channels_img
    rng = np.random.default_rng(5)
    batch = _batch(cfg, rng, with_img=True)
    model = SRFDet(cfg)
    variables = jax.jit(lambda r, b: model.init(r, b, train=False))(
        jax.random.PRNGKey(0), batch)
    assert not any(k.startswith("img_conv_")
                   for k in variables["params"]["bbox_head"])
    logits, boxes = jax.jit(
        lambda v, b: model.apply(v, b, train=False))(variables, batch)
    assert np.all(np.isfinite(np.asarray(logits)))
    assert np.all(np.isfinite(np.asarray(boxes)))
