"""Stage-wise image-backbone freezing (frozen_stages)."""
import dataclasses
import numpy as np
import jax

from srfdet3d_tpu.config import ImgBranchConfig
from srfdet3d_tpu.configs import tiny_test_config
from srfdet3d_tpu.models.detector import SRFDet
from srfdet3d_tpu.train import freeze_mask

import __graft_entry__ as graft


def test_frozen_stages_vovnet():
    cfg = tiny_test_config(
        use_img=True,
        img=ImgBranchConfig(backbone="vovnet-19-slim", num_cams=1,
                            neck_out_channels=64, frozen_stages=2))
    cfg = cfg.replace(
        head=dataclasses.replace(cfg.head, feat_channels_img=64))
    batch = graft._synthetic_batch(cfg, 1)
    rng = np.random.default_rng(0)
    batch["images"] = jax.numpy.asarray(
        rng.normal(size=(1, 1, 64, 96, 3)).astype(np.float32))
    batch["lidar2img"] = jax.numpy.broadcast_to(
        jax.numpy.eye(4), (1, 1, 4, 4)).astype(jax.numpy.float32)

    variables = jax.jit(
        lambda r, b: SRFDet(cfg).init(r, b, train=False))(
        jax.random.PRNGKey(0), batch)
    mask = freeze_mask(variables["params"], cfg)
    flat = jax.tree_util.tree_flatten_with_path(mask)[0]

    def top2(path):
        ks = tuple(p.key for p in path if hasattr(p, "key"))
        return ks[:2]

    frozen = {top2(k) for k, v in flat if not v}
    trained = {top2(k) for k, v in flat if v}
    # fs=2 freezes stem + stages 1..2 = stem, stage2, stage3 (reference
    # vovnet.py:353-364: range(1, frozen_stages + 1) over stage{i+1});
    # stage4+ and everything else trainable
    assert ("img_backbone", "stem1") in frozen
    assert any(t[1].startswith("stage2_") for t in frozen
               if t[0] == "img_backbone")
    assert any(t[1].startswith("stage3_") for t in frozen
               if t[0] == "img_backbone")
    assert any(t[1].startswith("stage4_") for t in trained
               if t[0] == "img_backbone")
    assert ("bbox_head",) == tuple(
        t[:1] for t in trained if t[0] == "bbox_head")[0]


def test_norm_frozen_freezes_all_backbone_bn():
    """img.norm_frozen freezes every BatchNorm scale/bias in the image
    backbone (mmdet norm_cfg requires_grad=False — waymo_LC R101,
    dvoxel_waymo_LC.py:65) while convs stay trainable."""
    cfg = tiny_test_config(
        use_img=True,
        img=ImgBranchConfig(backbone="resnet-18", num_cams=1,
                            neck_out_channels=64, frozen_stages=0,
                            norm_frozen=True))
    cfg = cfg.replace(
        head=dataclasses.replace(cfg.head, feat_channels_img=64))
    batch = graft._synthetic_batch(cfg, 1)
    rng = np.random.default_rng(0)
    batch["images"] = jax.numpy.asarray(
        rng.normal(size=(1, 1, 64, 96, 3)).astype(np.float32))
    batch["lidar2img"] = jax.numpy.broadcast_to(
        jax.numpy.eye(4), (1, 1, 4, 4)).astype(jax.numpy.float32)
    variables = jax.jit(
        lambda r, b: SRFDet(cfg).init(r, b, train=False))(
        jax.random.PRNGKey(0), batch)
    mask = freeze_mask(variables["params"], cfg)
    flat = jax.tree_util.tree_flatten_with_path(mask)[0]
    bn_flags = []
    conv_flags = []
    for path, v in flat:
        keys = tuple(p.key for p in path if hasattr(p, "key"))
        if keys[0] != "img_backbone":
            continue
        if any(k.startswith("BatchNorm") for k in keys):
            bn_flags.append(v)
        elif any(k.startswith("Conv") for k in keys):
            conv_flags.append(v)
    assert bn_flags and not any(bn_flags)      # every BN frozen
    assert conv_flags and all(conv_flags)      # convs still train
