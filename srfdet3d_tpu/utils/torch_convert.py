"""PyTorch -> JAX checkpoint conversion for reference released weights.

SURVEY §5: parity testing against the reference's released checkpoints needs
a converter from the mm-stack state_dict naming to this framework's flax
param tree.  The mapping below covers the LiDAR-only flagship layout
(srfdet_voxel_nusc_L): SECOND backbone, FPN neck, sparse middle encoder,
and the decoder head (whose per-iteration weights stack along axis 0 for
the scanned head series).

Layout translations:
  - Conv2d  OIHW            -> HWIO
  - Linear  (out, in)       -> (in, out)
  - spconv SubM/SparseConv3d (out, kz, ky, kx, in) or (kz, ky, kx, in, out)
    -> our (K, in, out) with K = kz*ky*kx in z-major offset order
  - BatchNorm weight/bias   -> scale/bias; running stats -> batch_stats
  - torch MultiheadAttention in_proj (3C, C) + out_proj
    -> flax MultiHeadDotProductAttention query/key/value/out kernels

Use :func:`convert_reference_state_dict` for a full model, or
:func:`convert_entry` piecewise.
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np


def conv2d_w(w) -> np.ndarray:
    return np.transpose(np.asarray(w), (2, 3, 1, 0))


def linear_w(w) -> np.ndarray:
    return np.asarray(w).T


def spconv_w(w, layout: str = "OKI") -> np.ndarray:
    """spconv kernel -> (K, in, out), K in z-major (kz, ky, kx) order.

    layout must be given explicitly: 'OKI' = spconv 2.x native
    (out, kz, ky, kx, in); 'KIO' = older exports (kz, ky, kx, in, out).
    Shape-based auto-detection is impossible — a real 3x3x3 kernel has
    small middle dims in BOTH layouts.
    """
    w = np.asarray(w)
    if w.ndim != 5:
        raise ValueError(f"expected 5D spconv weight, got {w.shape}")
    if layout not in ("OKI", "KIO"):
        raise ValueError(f"layout must be 'OKI' or 'KIO', got {layout!r}")
    if layout == "OKI":                     # (out, kz, ky, kx, in)
        w = np.transpose(w, (1, 2, 3, 4, 0))
    k = w.shape[0] * w.shape[1] * w.shape[2]
    return w.reshape(k, w.shape[3], w.shape[4])


def mha_w(in_proj_w, in_proj_b, out_w, out_b, num_heads: int
          ) -> Dict[str, Dict[str, np.ndarray]]:
    """torch MultiheadAttention -> flax MultiHeadDotProductAttention."""
    in_proj_w = np.asarray(in_proj_w)
    in_proj_b = np.asarray(in_proj_b)
    c = in_proj_w.shape[1]
    hd = c // num_heads
    out = {}
    for i, name in enumerate(("query", "key", "value")):
        w = in_proj_w[i * c:(i + 1) * c]            # (C, C) torch (out,in)
        b = in_proj_b[i * c:(i + 1) * c]
        out[name] = {"kernel": w.T.reshape(c, num_heads, hd),
                     "bias": b.reshape(num_heads, hd)}
    out["out"] = {"kernel": np.asarray(out_w).T.reshape(num_heads, hd, c),
                  "bias": np.asarray(out_b)}
    return out


def bn(state: Dict, prefix: str) -> Tuple[Dict, Dict]:
    """-> ({'scale','bias'}, {'mean','var'})."""
    return ({"scale": np.asarray(state[prefix + ".weight"]),
             "bias": np.asarray(state[prefix + ".bias"])},
            {"mean": np.asarray(state[prefix + ".running_mean"]),
             "var": np.asarray(state[prefix + ".running_var"])})


def convert_entry(state: Dict, key: str, kind: str, **kw):
    """Convert one torch entry by kind: conv2d|linear|spconv|raw."""
    if kind == "conv2d":
        return conv2d_w(state[key])
    if kind == "linear":
        return linear_w(state[key])
    if kind == "spconv":
        return spconv_w(state[key], **kw)
    return np.asarray(state[key])


def stack_layers(entries) -> np.ndarray:
    """Stack per-iteration head weights for the scanned head series."""
    return np.stack([np.asarray(e) for e in entries], axis=0)


def bev_in_perm(depth: int, channels: int) -> np.ndarray:
    """Input-channel permutation for the FIRST SECOND conv after a sparse
    middle encoder.

    The reference's SparseConvTensor.dense() reshapes (N, C, D, H, W) ->
    (N, C*D, H, W), i.e. BEV channel index = c*D + d; our encoder emits
    z-major d*C + c (models/sparse_encoder.py:284-287).  A converted
    torch conv must therefore read its input axis through this
    permutation: new_in[d*C + c] = old_in[c*D + d]."""
    c_idx = np.arange(channels)[None, :]
    d_idx = np.arange(depth)[:, None]
    return (c_idx * depth + d_idx).reshape(-1)


def convert_second_backbone(state: Dict, torch_prefix: str,
                            layer_nums, params: Dict,
                            batch_stats: Dict,
                            in_perm: "np.ndarray | None" = None) -> None:
    """SECONDCustom blocks.{i} sequential (Conv2d, BN, ReLU)* -> our
    ConvBNReLU modules (flax auto-names ConvBNReLU_0..).

    in_perm: optional permutation applied to the FIRST conv's input axis
    (see bev_in_perm — needed whenever the backbone follows the sparse
    middle encoder)."""
    mod = 0
    for stage, n_layers in enumerate(layer_nums):
        # torch Sequential indices: conv at 3*j, bn at 3*j+1 (Conv,BN,ReLU)
        for j in range(n_layers + 1):
            conv_key = f"{torch_prefix}.blocks.{stage}.{3 * j}.weight"
            bn_prefix = f"{torch_prefix}.blocks.{stage}.{3 * j + 1}"
            name = f"ConvBNReLU_{mod}"
            kernel = conv2d_w(state[conv_key])        # (kh, kw, in, out)
            if mod == 0 and in_perm is not None:
                kernel = kernel[:, :, in_perm, :]
            params.setdefault(name, {})["Conv_0"] = {"kernel": kernel}
            s, st = bn(state, bn_prefix)
            params[name]["BatchNorm_0"] = s
            batch_stats.setdefault(name, {})["BatchNorm_0"] = st
            mod += 1


def _set(tree: Dict, path, value) -> None:
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


def convert_sparse_encoder(state: Dict, cfg, params: Dict, stats: Dict,
                           layout: str = "KIO") -> None:
    """pts_middle_encoder -> our SparseEncoder module names.

    Reference SparseEncoderCustom (sparse_encoder_custom.py:74-215) builds:
      conv_input            SparseSequential(conv .0, BN .1, ReLU)
      encoder_layers.encoder_layer{i+1}.{j}   per stage i, block j:
        - conv_module:   SparseSequential(conv .0, BN .1) everywhere
          (downsample when i != 0 and j == 0)
        - basicblock:    SparseBasicBlock (conv1/bn1/conv2/bn2) except the
          last block of non-final stages = downsample SparseSequential
      conv_out              SparseSequential(conv .0, BN .1, ReLU)

    Ours (models/sparse_encoder.py): conv_input, subm{i}_{j} / down{i} /
    bb{i}_{j}_conv{1,2}, conv_out — each {kernel, MaskedBatchNorm_0}.
    mmcv.ops sparse convs store weights (kz, ky, kx, in, out) = 'KIO'.
    """
    tp = "pts_middle_encoder"

    def spconv_pair(torch_mod: str, our_name: str) -> None:
        _set(params, (tp, our_name, "kernel"),
             spconv_w(state[f"{torch_mod}.0.weight"], layout=layout))
        s, st = bn(state, f"{torch_mod}.1")
        _set(params, (tp, our_name, "MaskedBatchNorm_0"), s)
        _set(stats, (tp, our_name, "MaskedBatchNorm_0"), st)

    spconv_pair(f"{tp}.conv_input", "conv_input")
    mc = cfg.middle
    n_stages = len(mc.encoder_channels)
    for i, blocks in enumerate(mc.encoder_channels):
        for j in range(len(blocks)):
            tmod = f"{tp}.encoder_layers.encoder_layer{i + 1}.{j}"
            if mc.block_type == "conv_module":
                if i != 0 and j == 0:
                    spconv_pair(tmod, f"down{i}")
                else:
                    spconv_pair(tmod, f"subm{i}_{j}")
            else:  # basicblock
                if j == len(blocks) - 1 and i != n_stages - 1:
                    spconv_pair(tmod, f"down{i}")
                else:
                    for ci in (1, 2):
                        _set(params, (tp, f"bb{i}_{j}_conv{ci}", "kernel"),
                             spconv_w(state[f"{tmod}.conv{ci}.weight"],
                                      layout=layout))
                        s, st = bn(state, f"{tmod}.bn{ci}")
                        _set(params, (tp, f"bb{i}_{j}_conv{ci}",
                                      "MaskedBatchNorm_0"), s)
                        _set(stats, (tp, f"bb{i}_{j}_conv{ci}",
                                     "MaskedBatchNorm_0"), st)
    spconv_pair(f"{tp}.conv_out", "conv_out")


def convert_fpn(state: Dict, torch_prefix: str, our_prefix: str,
                num_ins: int, num_outs: int, params: Dict, stats: Dict,
                with_bn: bool = True, extra_convs: bool = True) -> None:
    """mmdet FPN -> our FPN naming.

    torch: lateral_convs.{i}.conv/.bn, fpn_convs.{i}.conv/.bn with the
    extra 'on_output' convs APPENDED to fpn_convs (indices num_ins..).
    ours: lateral_{i}, fpn_{i}, extra_{i} ConvBNReLU modules.
    extra_convs=False (pillar/KITTI pts_necks): the extra levels are
    parameter-free max-pools — nothing to convert past num_ins.
    """
    def one(tmod: str, our_name: str) -> None:
        p = {"Conv_0": {"kernel": conv2d_w(state[f"{tmod}.conv.weight"])}}
        if f"{tmod}.conv.bias" in state:
            p["Conv_0"]["bias"] = np.asarray(state[f"{tmod}.conv.bias"])
        if with_bn:
            s, st = bn(state, f"{tmod}.bn")
            p["BatchNorm_0"] = s
            _set(stats, (our_prefix, our_name, "BatchNorm_0"), st)
        _set(params, (our_prefix, our_name), p)

    for i in range(num_ins):
        one(f"{torch_prefix}.lateral_convs.{i}", f"lateral_{i}")
        one(f"{torch_prefix}.fpn_convs.{i}", f"fpn_{i}")
    if extra_convs:
        for e in range(num_outs - num_ins):
            one(f"{torch_prefix}.fpn_convs.{num_ins + e}", f"extra_{e}")


def convert_vfe(state: Dict, cfg, params: Dict, stats: Dict) -> None:
    """pts_voxel_encoder -> our VFE module names.

    torch (mmdet3d): DynamicVFECustom stores vfe_layers.{i}.linear/.norm
    (voxel_encoder.py:92-97) plus the optional centroid pos-enc Sequential
    cen2point_pos_enc.{0,1,3,4} (:108-116); PillarFeatureNetCustom stores
    pfn_layers.{i}.linear/.norm.  HardSimpleVFE has no parameters.
    ours: DynamicVFELayer_{i}/PFNLayer_{i} with Dense_0 +
    MaskedBatchNorm_0; the pos-enc is Dense_0/1 + MaskedBatchNorm_0/1 at
    the VFE top level (models/vfe.py DynamicVFE)."""
    tp = "pts_voxel_encoder"
    if not any(k.startswith(tp + ".") for k in state):
        return
    vp: Dict = {}
    vs_: Dict = {}

    def layer(tmod: str, our: str) -> None:
        _set(vp, (our, "Dense_0"),
             {"kernel": linear_w(state[f"{tmod}.linear.weight"])})
        s, st = bn(state, f"{tmod}.norm")
        _set(vp, (our, "MaskedBatchNorm_0"), s)
        _set(vs_, (our, "MaskedBatchNorm_0"), st)

    kind = cfg.vfe.kind
    if kind == "dynamic":
        for i in range(len(cfg.vfe.feat_channels)):
            layer(f"{tp}.vfe_layers.{i}", f"DynamicVFELayer_{i}")
        if cfg.vfe.with_centroid_aware:
            for k, (li, bi) in enumerate(((0, 1), (3, 4))):
                vp[f"Dense_{k}"] = {"kernel": linear_w(
                    state[f"{tp}.cen2point_pos_enc.{li}.weight"])}
                s, st = bn(state, f"{tp}.cen2point_pos_enc.{bi}")
                vp[f"MaskedBatchNorm_{k}"] = s
                vs_[f"MaskedBatchNorm_{k}"] = st
    elif kind == "pillar":
        for i in range(len(cfg.vfe.feat_channels)):
            layer(f"{tp}.pfn_layers.{i}", f"PFNLayer_{i}")
    if vp:
        params[tp] = vp
        stats[tp] = vs_


def convert_vovnet(state: Dict, torch_prefix: str, spec_name: str,
                   params: Dict, stats: Dict) -> None:
    """VoVNet -> our flax names.

    torch (reference vovnet.py OrderedDict naming): stem.stem_{k}/conv|norm,
    stage{S}.OSA{S}_{B}.layers.{i}.OSA{S}_{B}_{i}/conv|norm,
    .concat.OSA{S}_{B}_concat/conv|norm, .ese.fc.
    ours (models/vovnet.py): stem{k}, stage{S}_block{B-1} with
    conv{i}/concat/ese submodules."""
    from ..models.vovnet import VOVNET_SPECS
    spec = VOVNET_SPECS[spec_name]

    def convbn(tkey, opath):
        _set(params, opath + ("Conv_0",),
             {"kernel": conv2d_w(state[f"{tkey}/conv.weight"])})
        s, st = bn(state, f"{tkey}/norm")
        _set(params, opath + ("BatchNorm_0",), s)
        _set(stats, opath + ("BatchNorm_0",), st)

    for k in (1, 2, 3):
        convbn(f"{torch_prefix}.stem.stem_{k}", (f"stem{k}",))
    for si, nblocks in enumerate(spec["block_per_stage"]):
        s = si + 2
        for b in range(nblocks):
            tm = f"{torch_prefix}.stage{s}.OSA{s}_{b + 1}"
            om = f"stage{s}_block{b}"
            for i in range(spec["layer_per_block"]):
                convbn(f"{tm}.layers.{i}.OSA{s}_{b + 1}_{i}",
                       (om, f"conv{i}"))
            convbn(f"{tm}.concat.OSA{s}_{b + 1}_concat", (om, "concat"))
            _set(params, (om, "ese", "Conv_0"), {
                "kernel": conv2d_w(state[f"{tm}.ese.fc.weight"]),
                "bias": np.asarray(state[f"{tm}.ese.fc.bias"])})


def dcn_w(w) -> np.ndarray:
    """mmcv ModulatedDeformConv2d weight (Cout, Cin, kh, kw) -> our
    tap-major (kh*kw*Cin, Cout) (models/deform_conv.py layout)."""
    w = np.asarray(w)
    cout, cin, kh, kw = w.shape
    return np.transpose(w, (2, 3, 1, 0)).reshape(kh * kw * cin, cout)


def convert_resnet(state: Dict, torch_prefix: str, depth: int,
                   params: Dict, stats: Dict,
                   stage_with_dcn=(False, False, False, False)) -> None:
    """mmdet ResNet -> our flax names.

    torch: conv1/bn1 stem, layer{l}.{i}.conv{1,2,3}|bn{1,2,3},
    downsample.0|1; DCN bottlenecks store the deformable weight at conv2
    plus conv2.conv_offset.  ours (models/resnet.py): Conv_0/BatchNorm_0
    stem, layer{l}_{i} blocks whose flax auto-names are _ConvBN_0/1/2
    (plain bottleneck), or _ConvBN_0 + dcn2 + BatchNorm_0 + _ConvBN_1
    (DCN bottleneck), plus 'down'."""
    from ..models.resnet import RESNET_DEPTHS
    kind, layers = RESNET_DEPTHS[depth]

    def convbn(ckey, bkey, opath):
        _set(params, opath + ("Conv_0",),
             {"kernel": conv2d_w(state[f"{ckey}.weight"])})
        s, st = bn(state, bkey)
        _set(params, opath + ("BatchNorm_0",), s)
        _set(stats, opath + ("BatchNorm_0",), st)

    params["Conv_0"] = {
        "kernel": conv2d_w(state[f"{torch_prefix}.conv1.weight"])}
    s, st = bn(state, f"{torch_prefix}.bn1")
    params["BatchNorm_0"] = s
    stats["BatchNorm_0"] = st
    for l, n in enumerate(layers, start=1):
        dcn = stage_with_dcn[l - 1] and kind == "bottleneck"
        for i in range(n):
            tm = f"{torch_prefix}.layer{l}.{i}"
            om = f"layer{l}_{i}"
            if kind == "basic":
                pairs = [("conv1", "bn1", "_ConvBN_0"),
                         ("conv2", "bn2", "_ConvBN_1")]
            elif dcn:
                pairs = [("conv1", "bn1", "_ConvBN_0"),
                         ("conv3", "bn3", "_ConvBN_1")]
                _set(params, (om, "dcn2"), {
                    "kernel": dcn_w(state[f"{tm}.conv2.weight"]),
                    "conv_offset": {
                        "kernel": conv2d_w(
                            state[f"{tm}.conv2.conv_offset.weight"]),
                        "bias": np.asarray(
                            state[f"{tm}.conv2.conv_offset.bias"])}})
                s, st = bn(state, f"{tm}.bn2")
                _set(params, (om, "BatchNorm_0"), s)
                _set(stats, (om, "BatchNorm_0"), st)
            else:
                pairs = [("conv1", "bn1", "_ConvBN_0"),
                         ("conv2", "bn2", "_ConvBN_1"),
                         ("conv3", "bn3", "_ConvBN_2")]
            for c, b_, o in pairs:
                convbn(f"{tm}.{c}", f"{tm}.{b_}", (om, o))
            if f"{tm}.downsample.0.weight" in state:
                convbn(f"{tm}.downsample.0", f"{tm}.downsample.1",
                       (om, "down"))


def convert_single_head(state: Dict, t: int, modality: str = "lidar",
                        num_attn_heads: int = 8) -> Tuple[Dict, Dict]:
    """One head_series iteration -> our SingleSRFDetHead param subtree.

    Reference SingleSRFDetHeadLiDAR (srfdet_head.py:1348-1434): module
    attrs are suffixed by modality (`self_attn_lidar`, `norm1_lidar`, ...).
    Our flax call order (models/head.py SingleSRFDetHead.__call__) numbers
    the anonymous modules: LayerNorm_0/1/2 = norm1/2/3, LayerNorm_3..4 =
    cls LNs, LayerNorm_5..7 = reg LNs, Dense_0/1 = linear1/linear2.
    """
    mm = f"bbox_head.head_series_{modality}.{t}" if modality else \
        f"bbox_head.head_series.{t}"
    sfx = f"_{modality}" if modality else ""
    p: Dict = {}

    p["self_attn"] = mha_w(state[f"{mm}.self_attn{sfx}.in_proj_weight"],
                           state[f"{mm}.self_attn{sfx}.in_proj_bias"],
                           state[f"{mm}.self_attn{sfx}.out_proj.weight"],
                           state[f"{mm}.self_attn{sfx}.out_proj.bias"],
                           num_heads=num_attn_heads)
    ii = f"{mm}.inst_interact{sfx}"
    p["inst_interact"] = {
        "Dense_0": {"kernel": linear_w(state[f"{ii}.dynamic_layer.weight"]),
                    "bias": np.asarray(state[f"{ii}.dynamic_layer.bias"])},
        "Dense_1": {"kernel": linear_w(state[f"{ii}.out_layer.weight"]),
                    "bias": np.asarray(state[f"{ii}.out_layer.bias"])},
    }
    for k, norm in (("LayerNorm_0", "norm1"), ("LayerNorm_1", "norm2"),
                    ("LayerNorm_2", "norm3")):
        p["inst_interact"][k] = {
            "scale": np.asarray(state[f"{ii}.{norm}.weight"]),
            "bias": np.asarray(state[f"{ii}.{norm}.bias"])}
    p["Dense_0"] = {"kernel": linear_w(state[f"{mm}.linear1{sfx}.weight"]),
                    "bias": np.asarray(state[f"{mm}.linear1{sfx}.bias"])}
    p["Dense_1"] = {"kernel": linear_w(state[f"{mm}.linear2{sfx}.weight"]),
                    "bias": np.asarray(state[f"{mm}.linear2{sfx}.bias"])}
    for i, norm in enumerate(("norm1", "norm2", "norm3")):
        p[f"LayerNorm_{i}"] = {
            "scale": np.asarray(state[f"{mm}.{norm}{sfx}.weight"]),
            "bias": np.asarray(state[f"{mm}.{norm}{sfx}.bias"])}
    # cls/reg towers: ModuleList [Linear, LN, ReLU]* -> Linear at 3k,
    # LN at 3k+1; our LN numbering continues 3.. after the three above
    ln = 3
    for k in range(2):
        p[f"cls_{k}"] = {"kernel": linear_w(
            state[f"{mm}.cls_module{sfx}.{3 * k}.weight"])}
        p[f"LayerNorm_{ln}"] = {
            "scale": np.asarray(state[f"{mm}.cls_module{sfx}.{3 * k + 1}.weight"]),
            "bias": np.asarray(state[f"{mm}.cls_module{sfx}.{3 * k + 1}.bias"])}
        ln += 1
    for k in range(3):
        p[f"reg_{k}"] = {"kernel": linear_w(
            state[f"{mm}.reg_module{sfx}.{3 * k}.weight"])}
        p[f"LayerNorm_{ln}"] = {
            "scale": np.asarray(state[f"{mm}.reg_module{sfx}.{3 * k + 1}.weight"]),
            "bias": np.asarray(state[f"{mm}.reg_module{sfx}.{3 * k + 1}.bias"])}
        ln += 1
    p["class_logits"] = {
        "kernel": linear_w(state[f"{mm}.class_logits{sfx}.weight"]),
        "bias": np.asarray(state[f"{mm}.class_logits{sfx}.bias"])}
    p["bboxes_delta"] = {
        "kernel": linear_w(state[f"{mm}.bboxes_delta{sfx}.weight"]),
        "bias": np.asarray(state[f"{mm}.bboxes_delta{sfx}.bias"])}
    # fusion iterations (SingleSRFDetHead, srfdet_head.py:2192-2194) carry
    # the 2C->C fused projection
    if f"{mm}.output_fused_proj.weight" in state:
        p["output_fused_proj"] = {
            "kernel": linear_w(state[f"{mm}.output_fused_proj.weight"]),
            "bias": np.asarray(state[f"{mm}.output_fused_proj.bias"])}
    return p, {}


def convert_head(state: Dict, cfg, params: Dict, stats: Dict) -> None:
    """bbox_head (SRFDetHead) -> our decoder tree.

    DPG staircase (srfdet_head.py:265-296): dpg_dw_convs_lidar.{lvl}
    (depthwise ConvModule .conv/.bn), dpg_fc1_lidar, dpg_fc2_lidar,
    init_proposal_boxes/feats embeddings.  head_series_lidar.{t} stacks
    along axis 0 for our scanned `head_series/single_head`.
    """
    hc = cfg.head
    hp: Dict = {}
    hs: Dict = {}
    if f"bbox_head.init_proposal_boxes.weight" in state:
        hp["init_proposal_boxes"] = np.asarray(
            state["bbox_head.init_proposal_boxes.weight"])
        hp["init_proposal_feats"] = np.asarray(
            state["bbox_head.init_proposal_feats.weight"])
    if hc.with_dpg:
        for lvl in range(hc.lidar_feat_lvls - 1):
            tmod = f"bbox_head.dpg_dw_convs_lidar.{lvl}"
            hp[f"dpg_dw_lidar_{lvl}"] = {
                "Conv_0": {"kernel": conv2d_w(state[f"{tmod}.conv.weight"])}}
            s, st = bn(state, f"{tmod}.bn")
            hp[f"dpg_dw_lidar_{lvl}"]["BatchNorm_0"] = s
            hs[f"dpg_dw_lidar_{lvl}"] = {"BatchNorm_0": st}
        for fc in ("dpg_fc1_lidar", "dpg_fc2_lidar"):
            hp[fc] = {
                "kernel": linear_w(state[f"bbox_head.{fc}.weight"]),
                "bias": np.asarray(state[f"bbox_head.{fc}.bias"])}
    # LC extras: img channel-reduce convs (srfdet_head.py:147-158, present
    # only when hidden_dim != feat_channels_img) + the image DPG staircase
    # (srfdet_head.py:298-320)
    if any(k.startswith("bbox_head.img_convs.") for k in state):
        for i in range(hc.img_feat_lvls):
            hp[f"img_conv_{i}"] = {
                "kernel": conv2d_w(state[f"bbox_head.img_convs.{i}.weight"]),
                "bias": np.asarray(state[f"bbox_head.img_convs.{i}.bias"])}
    if any(k.startswith("bbox_head.dpg_dw_convs_img.") for k in state):
        for lvl in range(hc.img_feat_lvls - 1):
            tmod = f"bbox_head.dpg_dw_convs_img.{lvl}"
            hp[f"dpg_dw_img_{lvl}"] = {
                "Conv_0": {"kernel": conv2d_w(state[f"{tmod}.conv.weight"])}}
            s, st = bn(state, f"{tmod}.bn")
            hp[f"dpg_dw_img_{lvl}"]["BatchNorm_0"] = s
            hs[f"dpg_dw_img_{lvl}"] = {"BatchNorm_0": st}
        for fc in ("dpg_fc1_img", "dpg_fc2_img"):
            hp[fc] = {
                "kernel": linear_w(state[f"bbox_head.{fc}.weight"]),
                "bias": np.asarray(state[f"bbox_head.{fc}.bias"])}
    # scanned head series: stack each leaf across iterations
    per_t = [convert_single_head(state, t, "lidar", hc.num_attn_heads)[0]
             for t in range(hc.num_heads)]

    def stack_tree(trees):
        out = {}
        for k in trees[0]:
            if isinstance(trees[0][k], dict):
                out[k] = stack_tree([t[k] for t in trees])
            else:
                out[k] = stack_layers([t[k] for t in trees])
        return out

    hp["head_series"] = {"single_head": stack_tree(per_t)}
    params["bbox_head"] = hp
    if hs:
        stats["bbox_head"] = hs


def _encoder_out_depth(cfg) -> int:
    """z depth of the sparse encoder's dense BEV output (e.g. nuScenes
    41 -> 21 -> 11 -> 5 -> conv_out -> 2): the strided z chain over the
    encoder's own downsample-padding list."""
    from ..models.sparse_encoder import down_pads
    mc = cfg.middle
    d = cfg.voxelization.sparse_shape[0]
    for pad in down_pads(mc.block_type, mc.encoder_channels,
                         mc.encoder_paddings):
        pz = pad[0] if isinstance(pad, (tuple, list)) else pad
        d = (d + 2 * pz - 3) // 2 + 1
    return (d - 3) // 2 + 1


def convert_reference_state_dict(state: Dict, cfg,
                                 spconv_layout: str = "KIO") -> Dict:
    """Full conversion of a reference checkpoint to our variable tree.

    Covers the LiDAR flagship tree (srfdet_voxel_nusc_L / kitti / waymo):
    pts_middle_encoder (both block layouts), pts_backbone (SECOND),
    pts_neck (FPN), bbox_head (DPG + embeddings + scanned head series).
    HardSimpleVFE has no parameters.  `spconv_layout`: mmcv.ops sparse
    convs store (kz, ky, kx, in, out) = 'KIO' (the reference's import);
    pass 'OKI' for spconv-2.x native exports.

    Returns {"params": ..., "batch_stats": ...} ready for load_partial /
    direct apply (missing modalities are simply absent from the tree).
    """
    params: Dict = {}
    batch_stats: Dict = {}
    convert_vfe(state, cfg, params, batch_stats)
    if any(k.startswith("pts_middle_encoder.") for k in state):
        convert_sparse_encoder(state, cfg, params, batch_stats,
                               layout=spconv_layout)
    if any(k.startswith("pts_backbone.") for k in state):
        bb_p: Dict = {}
        bb_s: Dict = {}
        perm = None
        if cfg.middle.kind == "sparse":
            perm = bev_in_perm(_encoder_out_depth(cfg),
                               cfg.middle.output_channels)
        convert_second_backbone(state, "pts_backbone",
                                cfg.backbone.layer_nums, bb_p, bb_s,
                                in_perm=perm)
        params["pts_backbone"] = bb_p
        batch_stats["pts_backbone"] = bb_s
    if any(k.startswith("pts_neck.") for k in state):
        convert_fpn(state, "pts_neck", "pts_neck", len(cfg.backbone.out_channels),
                    cfg.neck_num_outs, params, batch_stats,
                    extra_convs=cfg.neck_extra_convs)
    if any(k.startswith("img_backbone.") for k in state):
        bp: Dict = {}
        bs_: Dict = {}
        if cfg.img.backbone.startswith("vovnet"):
            convert_vovnet(state, "img_backbone", cfg.img.backbone, bp, bs_)
        else:
            depth = int(cfg.img.backbone.split("-")[1])
            convert_resnet(state, "img_backbone", depth, bp, bs_,
                           stage_with_dcn=tuple(cfg.img.stage_with_dcn))
        params["img_backbone"] = bp
        batch_stats["img_backbone"] = bs_
    if any(k.startswith("img_neck.") for k in state):
        convert_fpn(state, "img_neck", "img_neck", 4,
                    cfg.img.neck_num_outs, params, batch_stats,
                    with_bn=cfg.img.neck_norm)
    if any(k.startswith("bbox_head.") for k in state):
        convert_head(state, cfg, params, batch_stats)
    return {"params": params, "batch_stats": batch_stats}
