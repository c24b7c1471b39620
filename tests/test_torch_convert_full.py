"""Full-model torch->JAX conversion round trip (VERDICT r1 item 3).

Builds a synthetic state_dict with the REFERENCE's torch module naming and
tensor layouts for the flagship srfdet_voxel_nusc_L tree (derived from
/root/reference: srfdet.py:44-75 attr names, sparse_encoder_custom.py:74-215
encoder layout, second_custom.py blocks, mmdet FPN conv/bn naming,
srfdet_head.py:120-296,1348-1434 head naming), converts it with
convert_reference_state_dict, asserts the result is STRUCTURE-IDENTICAL to
the model's own init tree (every path + shape), loads it, and runs a
finite forward.
"""
import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from srfdet3d_tpu.configs import srfdet_voxel_nusc_L
from srfdet3d_tpu.models.detector import SRFDet
from srfdet3d_tpu.utils.torch_convert import convert_reference_state_dict

import __graft_entry__ as graft


def _shrunk_flagship():
    """Flagship architecture at test capacities (param tree unchanged)."""
    cfg = srfdet_voxel_nusc_L()
    return cfg.replace(
        points_cap=1024, voxels_cap=512,
        middle=dataclasses.replace(cfg.middle,
                                   capacities=(256, 128, 64, 64)))


def _synthetic_torch_state(cfg, rng):
    """Reference-named state_dict: torch layouts, random values."""
    st = {}

    def t(key, *shape):
        st[key] = rng.normal(size=shape).astype(np.float32) * 0.05

    def bn1d(prefix, c):
        t(f"{prefix}.weight", c)
        t(f"{prefix}.bias", c)
        st[f"{prefix}.running_mean"] = np.zeros(c, np.float32)
        st[f"{prefix}.running_var"] = np.ones(c, np.float32)
        st[f"{prefix}.num_batches_tracked"] = np.asarray(1)

    # ---- pts_voxel_encoder (DynamicVFECustom vfe_layers.{i}.linear/.norm;
    # HardSimpleVFE has no parameters)
    if cfg.vfe.kind == "dynamic":
        in_dim = cfg.vfe.in_channels
        if cfg.vfe.with_cluster_center:
            in_dim += 32 if cfg.vfe.with_centroid_aware else 3
        if cfg.vfe.with_voxel_center:
            in_dim += 3
        if cfg.vfe.with_distance:
            in_dim += 1
        for i, out_c in enumerate(cfg.vfe.feat_channels):
            t(f"pts_voxel_encoder.vfe_layers.{i}.linear.weight",
              out_c, in_dim)
            bn1d(f"pts_voxel_encoder.vfe_layers.{i}.norm", out_c)
            in_dim = 2 * out_c          # [x, gathered-back] concat

    # ---- pts_middle_encoder (both block layouts; mmcv.ops sparse convs
    # store (kz, ky, kx, in, out))
    mc = cfg.middle
    te = "pts_middle_encoder"
    t(f"{te}.conv_input.0.weight", 3, 3, 3, mc.in_channels, mc.base_channels)
    bn1d(f"{te}.conv_input.1", mc.base_channels)
    in_ch = mc.base_channels
    n_stages = len(mc.encoder_channels)
    for i, blocks in enumerate(mc.encoder_channels):
        for j, out_ch in enumerate(blocks):
            tm = f"{te}.encoder_layers.encoder_layer{i + 1}.{j}"
            if mc.block_type == "conv_module":
                # every block is SparseSequential(conv .0, BN .1)
                t(f"{tm}.0.weight", 3, 3, 3, in_ch, out_ch)
                bn1d(f"{tm}.1", out_ch)
            elif j == len(blocks) - 1 and i != n_stages - 1:  # downsample
                t(f"{tm}.0.weight", 3, 3, 3, in_ch, out_ch)
                bn1d(f"{tm}.1", out_ch)
            else:                                            # SparseBasicBlock
                t(f"{tm}.conv1.weight", 3, 3, 3, out_ch, out_ch)
                bn1d(f"{tm}.bn1", out_ch)
                t(f"{tm}.conv2.weight", 3, 3, 3, out_ch, out_ch)
                bn1d(f"{tm}.bn2", out_ch)
            in_ch = out_ch
    t(f"{te}.conv_out.0.weight", 3, 1, 1, in_ch, mc.output_channels)
    bn1d(f"{te}.conv_out.1", mc.output_channels)

    # ---- pts_backbone (SECOND: blocks.{i} Sequential of Conv,BN,ReLU)
    bb_in = mc.output_channels * 2        # (C * D) BEV channels
    for i, (n_layers, out_c) in enumerate(
            zip(cfg.backbone.layer_nums, cfg.backbone.out_channels)):
        c_in = bb_in if i == 0 else cfg.backbone.out_channels[i - 1]
        for j in range(n_layers + 1):
            t(f"pts_backbone.blocks.{i}.{3 * j}.weight",
              out_c, c_in if j == 0 else out_c, 3, 3)
            bn1d(f"pts_backbone.blocks.{i}.{3 * j + 1}", out_c)

    # ---- pts_neck (mmdet FPN with BN: conv no bias)
    oc = cfg.neck_out_channels
    for i, c_in in enumerate(cfg.backbone.out_channels):
        t(f"pts_neck.lateral_convs.{i}.conv.weight", oc, c_in, 1, 1)
        bn1d(f"pts_neck.lateral_convs.{i}.bn", oc)
        t(f"pts_neck.fpn_convs.{i}.conv.weight", oc, oc, 3, 3)
        bn1d(f"pts_neck.fpn_convs.{i}.bn", oc)
    if cfg.neck_extra_convs:
        for e in range(cfg.neck_num_outs - len(cfg.backbone.out_channels)):
            i = len(cfg.backbone.out_channels) + e
            t(f"pts_neck.fpn_convs.{i}.conv.weight", oc, oc, 3, 3)
            bn1d(f"pts_neck.fpn_convs.{i}.bn", oc)

    # ---- bbox_head
    hc = cfg.head
    c = hc.feat_channels_lidar
    n_exp = hc.num_dpg_exp * hc.num_proposals
    t("bbox_head.init_proposal_boxes.weight", n_exp, hc.code_size)
    t("bbox_head.init_proposal_feats.weight", n_exp, c)
    for lvl in range(hc.lidar_feat_lvls - 1):
        ch = c * (lvl + 1)
        t(f"bbox_head.dpg_dw_convs_lidar.{lvl}.conv.weight", ch, 1, 3, 3)
        bn1d(f"bbox_head.dpg_dw_convs_lidar.{lvl}.bn", ch)
    gx = int(round((cfg.pc_range[3] - cfg.pc_range[0]) / cfg.voxel_size[0]))
    gy = int(round((cfg.pc_range[4] - cfg.pc_range[1]) / cfg.voxel_size[1]))
    div = cfg.out_size_factor * 2 ** (hc.lidar_feat_lvls - 1)
    t("bbox_head.dpg_fc1_lidar.weight", 1024, (gy // div) * (gx // div))
    t("bbox_head.dpg_fc1_lidar.bias", 1024)
    t("bbox_head.dpg_fc2_lidar.weight", n_exp, 1024)
    t("bbox_head.dpg_fc2_lidar.bias", n_exp)
    for it in range(hc.num_heads):
        m = f"bbox_head.head_series_lidar.{it}"
        t(f"{m}.self_attn_lidar.in_proj_weight", 3 * c, c)
        t(f"{m}.self_attn_lidar.in_proj_bias", 3 * c)
        t(f"{m}.self_attn_lidar.out_proj.weight", c, c)
        t(f"{m}.self_attn_lidar.out_proj.bias", c)
        d = hc.dynamic_dim
        t(f"{m}.inst_interact_lidar.dynamic_layer.weight", 2 * c * d, c)
        t(f"{m}.inst_interact_lidar.dynamic_layer.bias", 2 * c * d)
        t(f"{m}.inst_interact_lidar.out_layer.weight", c, 49 * c)
        t(f"{m}.inst_interact_lidar.out_layer.bias", c)
        for norm, dim in (("norm1", d), ("norm2", c), ("norm3", c)):
            t(f"{m}.inst_interact_lidar.{norm}.weight", dim)
            t(f"{m}.inst_interact_lidar.{norm}.bias", dim)
        t(f"{m}.linear1_lidar.weight", hc.dim_feedforward, c)
        t(f"{m}.linear1_lidar.bias", hc.dim_feedforward)
        t(f"{m}.linear2_lidar.weight", c, hc.dim_feedforward)
        t(f"{m}.linear2_lidar.bias", c)
        for norm in ("norm1", "norm2", "norm3"):
            t(f"{m}.{norm}_lidar.weight", c)
            t(f"{m}.{norm}_lidar.bias", c)
        for k in range(hc.num_cls_convs):
            t(f"{m}.cls_module_lidar.{3 * k}.weight", c, c)
            t(f"{m}.cls_module_lidar.{3 * k + 1}.weight", c)
            t(f"{m}.cls_module_lidar.{3 * k + 1}.bias", c)
        for k in range(hc.num_reg_convs):
            t(f"{m}.reg_module_lidar.{3 * k}.weight", c, c)
            t(f"{m}.reg_module_lidar.{3 * k + 1}.weight", c)
            t(f"{m}.reg_module_lidar.{3 * k + 1}.bias", c)
        t(f"{m}.class_logits_lidar.weight", cfg.num_classes, c)
        t(f"{m}.class_logits_lidar.bias", cfg.num_classes)
        t(f"{m}.bboxes_delta_lidar.weight", hc.code_size, c)
        t(f"{m}.bboxes_delta_lidar.bias", hc.code_size)
    st["bbox_head.code_weights"] = np.ones(hc.code_size, np.float32)
    return st


def _paths(tree, prefix=()):
    out = {}
    for k, v in tree.items():
        if isinstance(v, dict):
            out.update(_paths(v, prefix + (k,)))
        else:
            out[prefix + (k,)] = tuple(np.shape(v))
    return out


def test_torch_convert_full_model():
    cfg = _shrunk_flagship()
    rng = np.random.default_rng(0)
    state = _synthetic_torch_state(cfg, rng)
    converted = convert_reference_state_dict(state, cfg)

    batch = graft._synthetic_batch(cfg, 1)
    model = SRFDet(cfg)
    ref_tree = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), batch, train=False))

    for col in ("params", "batch_stats"):
        want = _paths(jax.tree_util.tree_map(lambda x: x, dict(ref_tree[col])))
        got = _paths(converted[col])
        missing = sorted(set(want) - set(got))
        extra = sorted(set(got) - set(want))
        assert not missing, f"{col}: converter missed {missing[:8]}"
        assert not extra, f"{col}: converter invented {extra[:8]}"
        for p in want:
            assert want[p] == got[p], f"{col} {p}: {want[p]} vs {got[p]}"

    # load + forward: finite outputs
    variables = jax.tree_util.tree_map(jnp.asarray, converted)
    logits, boxes = jax.jit(
        lambda v, b: model.apply(v, b, train=False))(variables, batch)
    assert np.all(np.isfinite(np.asarray(logits)))
    assert np.all(np.isfinite(np.asarray(boxes)))


def test_spconv_layout_kio_numeric():
    """KIO conversion places offset (dz,dy,dx) weights at z-major K index."""
    from srfdet3d_tpu.utils.torch_convert import spconv_w
    w = np.zeros((3, 3, 3, 2, 4), np.float32)      # (kz, ky, kx, in, out)
    w[1, 2, 0, 1, 3] = 7.0
    out = spconv_w(w, layout="KIO")
    k = (1 * 3 + 2) * 3 + 0
    assert out.shape == (27, 2, 4)
    assert out[k, 1, 3] == 7.0
    assert np.count_nonzero(out) == 1


def _synthetic_torch_img_state(cfg, rng, st):
    """Add the LC image-branch entries (reference naming): VoVNet
    (vovnet.py OrderedDict names), plain img FPN, bbox_head img extras
    (srfdet_head.py:147-158,298-320) and per-iteration fused projections
    (:2192-2194)."""
    from srfdet3d_tpu.models.vovnet import VOVNET_SPECS

    def t(key, *shape):
        st[key] = rng.normal(size=shape).astype(np.float32) * 0.05

    def bn2(prefix, c):
        t(f"{prefix}.weight", c)
        t(f"{prefix}.bias", c)
        st[f"{prefix}.running_mean"] = np.zeros(c, np.float32)
        st[f"{prefix}.running_var"] = np.ones(c, np.float32)

    def convbn(key, cout, cin, k=3):
        t(f"{key}/conv.weight", cout, cin, k, k)
        bn2(f"{key}/norm", cout)

    spec = VOVNET_SPECS[cfg.img.backbone]
    s1, s2, s3 = spec["stem"]
    convbn("img_backbone.stem.stem_1", s1, 3)
    convbn("img_backbone.stem.stem_2", s2, s1)
    convbn("img_backbone.stem.stem_3", s3, s2)
    in_ch = s3
    for si, nb in enumerate(spec["block_per_stage"]):
        s = si + 2
        cc, oc = spec["conv_ch"][si], spec["out_ch"][si]
        for b in range(nb):
            tm = f"img_backbone.stage{s}.OSA{s}_{b + 1}"
            ic = in_ch if b == 0 else oc
            for i in range(spec["layer_per_block"]):
                convbn(f"{tm}.layers.{i}.OSA{s}_{b + 1}_{i}",
                       cc, ic if i == 0 else cc)
            convbn(f"{tm}.concat.OSA{s}_{b + 1}_concat",
                   oc, ic + spec["layer_per_block"] * cc, k=1)
            t(f"{tm}.ese.fc.weight", oc, oc, 1, 1)
            t(f"{tm}.ese.fc.bias", oc)
        in_ch = oc

    noc = cfg.img.neck_out_channels
    for i, cin in enumerate(spec["out_ch"]):
        t(f"img_neck.lateral_convs.{i}.conv.weight", noc, cin, 1, 1)
        t(f"img_neck.lateral_convs.{i}.conv.bias", noc)
        t(f"img_neck.fpn_convs.{i}.conv.weight", noc, noc, 3, 3)
        t(f"img_neck.fpn_convs.{i}.conv.bias", noc)

    hc = cfg.head
    hid, c = hc.hidden_dim, hc.feat_channels_lidar
    if hid != hc.feat_channels_img:
        for i in range(hc.img_feat_lvls):
            t(f"bbox_head.img_convs.{i}.weight", hid, hc.feat_channels_img,
              3, 3)
            t(f"bbox_head.img_convs.{i}.bias", hid)
    for lvl in range(hc.img_feat_lvls - 1):
        ch = hid * (lvl + 1)
        t(f"bbox_head.dpg_dw_convs_img.{lvl}.conv.weight", ch, 1, 3, 3)
        bn2(f"bbox_head.dpg_dw_convs_img.{lvl}.bn", ch)
    t("bbox_head.dpg_fc1_img.weight", 1500, 30 * 30)
    t("bbox_head.dpg_fc1_img.bias", 1500)
    t("bbox_head.dpg_fc2_img.weight", hc.num_dpg_exp * hc.num_proposals,
      1500)
    t("bbox_head.dpg_fc2_img.bias", hc.num_dpg_exp * hc.num_proposals)
    for it in range(hc.num_heads):
        m = f"bbox_head.head_series_lidar.{it}"
        t(f"{m}.output_fused_proj.weight", c, hid + c)
        t(f"{m}.output_fused_proj.bias", c)
    return st


@pytest.mark.slow
def test_torch_convert_full_model_lc():
    """Full LC tree: lidar flagship + VoVNet image branch + fusion heads.
    Converter output must be structure-identical to the model's own init
    tree, then load + forward finite."""
    import dataclasses as dc
    from srfdet3d_tpu.config import ImgBranchConfig
    cfg = _shrunk_flagship()
    cfg = cfg.replace(
        use_img=True,
        img=ImgBranchConfig(backbone="vovnet-19-slim", num_cams=2,
                            neck_out_channels=64, img_shape=(64, 96)),
        head=dc.replace(cfg.head, feat_channels_img=64))
    rng = np.random.default_rng(1)
    state = _synthetic_torch_state(cfg, rng)
    state = _synthetic_torch_img_state(cfg, rng, state)
    converted = convert_reference_state_dict(state, cfg)

    batch = graft._synthetic_batch(cfg, 1)
    batch["images"] = jnp.asarray(
        rng.normal(size=(1, 2, 64, 96, 3)).astype(np.float32))
    batch["lidar2img"] = jnp.broadcast_to(
        jnp.eye(4), (1, 2, 4, 4)).astype(jnp.float32)
    model = SRFDet(cfg)
    ref_tree = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), batch, train=False))

    for col in ("params", "batch_stats"):
        want = _paths(jax.tree_util.tree_map(lambda x: x, dict(ref_tree[col])))
        got = _paths(converted[col])
        missing = sorted(set(want) - set(got))
        extra = sorted(set(got) - set(want))
        assert not missing, f"{col}: converter missed {missing[:8]}"
        assert not extra, f"{col}: converter invented {extra[:8]}"
        for p in want:
            assert want[p] == got[p], f"{col} {p}: {want[p]} vs {got[p]}"

    variables = jax.tree_util.tree_map(jnp.asarray, converted)
    logits, boxes = jax.jit(
        lambda v, b: model.apply(v, b, train=False))(variables, batch)
    assert np.all(np.isfinite(np.asarray(logits)))
    assert np.all(np.isfinite(np.asarray(boxes)))


def test_resnet_dcn_conversion_structure():
    """mmdet ResNet (caffe + DCN stages) conversion is structure-identical
    to our flax init tree, incl. dcn2 kernels and conv_offset."""
    from srfdet3d_tpu.models.resnet import ResNet, RESNET_DEPTHS
    from srfdet3d_tpu.utils.torch_convert import convert_resnet
    rng = np.random.default_rng(2)
    st = {}

    def t(key, *shape):
        st[key] = rng.normal(size=shape).astype(np.float32) * 0.05

    def bn2(prefix, c):
        t(f"{prefix}.weight", c)
        t(f"{prefix}.bias", c)
        st[f"{prefix}.running_mean"] = np.zeros(c, np.float32)
        st[f"{prefix}.running_var"] = np.ones(c, np.float32)

    depth = 50
    dcn_stages = (False, False, True, True)
    _, layers = RESNET_DEPTHS[depth]
    t("r.conv1.weight", 64, 3, 7, 7)
    bn2("r.bn1", 64)
    planes, in_ch = 64, 64
    for l, n in enumerate(layers, start=1):
        for i in range(n):
            tm = f"r.layer{l}.{i}"
            t(f"{tm}.conv1.weight", planes, in_ch, 1, 1)
            bn2(f"{tm}.bn1", planes)
            t(f"{tm}.conv2.weight", planes, planes, 3, 3)
            bn2(f"{tm}.bn2", planes)
            if dcn_stages[l - 1]:
                t(f"{tm}.conv2.conv_offset.weight", 27, planes, 3, 3)
                t(f"{tm}.conv2.conv_offset.bias", 27)
            t(f"{tm}.conv3.weight", planes * 4, planes, 1, 1)
            bn2(f"{tm}.bn3", planes * 4)
            if i == 0:
                t(f"{tm}.downsample.0.weight", planes * 4, in_ch, 1, 1)
                bn2(f"{tm}.downsample.1", planes * 4)
            in_ch = planes * 4
        planes *= 2

    params, stats = {}, {}
    convert_resnet(st, "r", depth, params, stats,
                   stage_with_dcn=dcn_stages)
    net = ResNet(depth, style="caffe", stage_with_dcn=dcn_stages)
    ref = jax.eval_shape(lambda: net.init(jax.random.PRNGKey(0),
                                          jnp.zeros((1, 64, 96, 3))))
    for col, tree in (("params", params), ("batch_stats", stats)):
        want = _paths(jax.tree_util.tree_map(lambda x: x, dict(ref[col])))
        got = _paths(tree)
        assert sorted(want) == sorted(got), (
            sorted(set(want) ^ set(got))[:8])
        for p in want:
            assert want[p] == got[p], f"{col} {p}: {want[p]} vs {got[p]}"


@pytest.mark.slow
def test_torch_convert_full_model_kitti():
    """KITTI flagship tree (conv_module encoder, code_size 8, 1024/64 head
    dims, pool-extras FPN, non-square grid): converter output is
    structure-identical to the model's own init, loads, runs finite."""
    import dataclasses as dc
    from srfdet3d_tpu.configs import srfdet_voxel_kitti_L
    cfg = srfdet_voxel_kitti_L()
    cfg = cfg.replace(
        points_cap=1024, voxels_cap=512,
        middle=dc.replace(cfg.middle, capacities=(256, 128, 64, 64)),
        head=dc.replace(cfg.head, num_proposals=32))
    rng = np.random.default_rng(2)
    state = _synthetic_torch_state(cfg, rng)
    converted = convert_reference_state_dict(state, cfg)

    batch = graft._synthetic_batch(cfg, 1)
    model = SRFDet(cfg)
    ref_tree = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), batch, train=False))
    for col in ("params", "batch_stats"):
        want = _paths(jax.tree_util.tree_map(lambda x: x, dict(ref_tree[col])))
        got = _paths(converted[col])
        missing = sorted(set(want) - set(got))
        extra = sorted(set(got) - set(want))
        assert not missing, f"{col}: converter missed {missing[:8]}"
        assert not extra, f"{col}: converter invented {extra[:8]}"
        for p in want:
            assert want[p] == got[p], f"{col} {p}: {want[p]} vs {got[p]}"

    variables = jax.tree_util.tree_map(jnp.asarray, converted)
    logits, boxes = jax.jit(
        lambda v, b: model.apply(v, b, train=False))(variables, batch)
    assert boxes.shape[-1] == 8
    assert np.all(np.isfinite(np.asarray(logits)))
    assert np.all(np.isfinite(np.asarray(boxes)))


def test_torch_convert_full_model_pillar():
    """Pillar tree: PFNLayer VFE + (parameter-free) pillar scatter +
    stride-2 SECOND + pool-extras FPN."""
    import dataclasses as dc
    from srfdet3d_tpu.configs import srfdet_pillar_nusc_L
    cfg = srfdet_pillar_nusc_L()
    cfg = cfg.replace(
        points_cap=1024, voxels_cap=256,
        head=dc.replace(cfg.head, num_proposals=32))
    rng = np.random.default_rng(3)
    state = _synthetic_torch_state_pillar(cfg, rng)
    converted = convert_reference_state_dict(state, cfg)

    batch = graft._synthetic_batch(cfg, 1)
    model = SRFDet(cfg)
    ref_tree = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), batch, train=False))
    for col in ("params", "batch_stats"):
        want = _paths(jax.tree_util.tree_map(lambda x: x, dict(ref_tree[col])))
        got = _paths(converted[col])
        missing = sorted(set(want) - set(got))
        extra = sorted(set(got) - set(want))
        assert not missing, f"{col}: converter missed {missing[:8]}"
        assert not extra, f"{col}: converter invented {extra[:8]}"
        for p in want:
            assert want[p] == got[p], f"{col} {p}: {want[p]} vs {got[p]}"

    variables = jax.tree_util.tree_map(jnp.asarray, converted)
    logits, boxes = jax.jit(
        lambda v, b: model.apply(v, b, train=False))(variables, batch)
    assert np.all(np.isfinite(np.asarray(logits)))
    assert np.all(np.isfinite(np.asarray(boxes)))


def _synthetic_torch_state_pillar(cfg, rng):
    """Pillar variant: pfn_layers VFE, NO middle encoder params, SECOND
    fed by the 64-ch pillar canvas."""
    st = {}

    def t(key, *shape):
        st[key] = rng.normal(size=shape).astype(np.float32) * 0.05

    def bn1d(prefix, c):
        t(f"{prefix}.weight", c)
        t(f"{prefix}.bias", c)
        st[f"{prefix}.running_mean"] = np.zeros(c, np.float32)
        st[f"{prefix}.running_var"] = np.ones(c, np.float32)

    in_dim = cfg.vfe.in_channels + 3 + 3      # cluster + center decorations
    for i, out_c in enumerate(cfg.vfe.feat_channels):
        last = i == len(cfg.vfe.feat_channels) - 1
        units = out_c if last else out_c // 2
        t(f"pts_voxel_encoder.pfn_layers.{i}.linear.weight", units, in_dim)
        bn1d(f"pts_voxel_encoder.pfn_layers.{i}.norm", units)
        in_dim = 2 * units

    bb_in = cfg.middle.in_channels
    for i, (n_layers, out_c) in enumerate(
            zip(cfg.backbone.layer_nums, cfg.backbone.out_channels)):
        c_in = bb_in if i == 0 else cfg.backbone.out_channels[i - 1]
        for j in range(n_layers + 1):
            t(f"pts_backbone.blocks.{i}.{3 * j}.weight",
              out_c, c_in if j == 0 else out_c, 3, 3)
            bn1d(f"pts_backbone.blocks.{i}.{3 * j + 1}", out_c)

    oc = cfg.neck_out_channels
    for i, c_in in enumerate(cfg.backbone.out_channels):
        t(f"pts_neck.lateral_convs.{i}.conv.weight", oc, c_in, 1, 1)
        bn1d(f"pts_neck.lateral_convs.{i}.bn", oc)
        t(f"pts_neck.fpn_convs.{i}.conv.weight", oc, oc, 3, 3)
        bn1d(f"pts_neck.fpn_convs.{i}.bn", oc)
    # pillar pts_neck: pool extras, no extra conv weights

    # head: reuse the shared builder by cloning its bbox_head entries
    full = _synthetic_torch_state(
        cfg.replace(middle=cfg.middle), rng)
    for k, v in full.items():
        if k.startswith("bbox_head."):
            st[k] = v
    return st
