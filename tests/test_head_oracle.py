"""FULL-DECODER numeric oracle: the reference's own SRFDetHead torch code
vs our flax SRFDetHead on converter-mapped weights.

`/root/reference/mmdet3d_plugin/models/sparse_heads/srfdet_head.py` is
executed directly (torch CPU) with minimal stubs for the mm registries
and a test-local `SingleRoIExtractor` that implements mmdet's level
mapping + mmcv's aligned RoIAlign exactly (same algorithm as the numpy
oracle in test_roi_align.py).  A tiny LiDAR-only SRFDetHead (DPG + 2
refinement iterations) is built, its state_dict converted with
`convert_head`, and our scanned flax head must reproduce EVERY
iteration's logits and boxes on the same BEV inputs.

This covers, numerically and end-to-end: DPG staircase (depthwise
ConvModule + BN eps=1e-3), proposal mixing softmax, center sigmoid, the
in-place center-denormalization contract of the reference samplers,
RoIAlign level mapping/sampling, MultiheadAttention conversion,
DynamicConv, FFN/LayerNorm stacks, cls/reg towers, apply_deltas
(clamped log-size updates, center renormalization), deep-supervision
stacking and final center denormalization (srfdet_head.py:379-505,
1348-1692, 2633-2693).

Skipped when the reference checkout is absent.
"""

import importlib.util
import math
import os
import sys
import types

import numpy as np
import pytest

REF_ROOT = "/root/reference/mmdet3d_plugin"
REF_HEAD = f"{REF_ROOT}/models/sparse_heads/srfdet_head.py"
REF_UTIL = f"{REF_ROOT}/core/bbox/util.py"

pytestmark = pytest.mark.skipif(
    not os.path.exists(REF_HEAD), reason="reference checkout not mounted")

PC_RANGE = [-4.8, -4.8, -5.0, 4.8, 4.8, 3.0]
VOXEL_SIZE = [0.075, 0.075, 0.2]
GRID = [128, 128, 40]          # -> BEV feats 16/8/4/2 at strides 8-64
STRIDES = [8, 16, 32, 64]
N_CLASSES, N_PROP, N_ITER, CH = 4, 8, 2, 64


def _np_roi_align(feat_hwc, roi, stride, out_size=7, sr=2):
    """mmcv aligned RoIAlign, one level / one roi (same algorithm as
    tests/test_roi_align.py::_np_roi_align_single)."""
    h, w, _ = feat_hwc.shape
    scale = 1.0 / stride
    x1, y1, x2, y2 = [float(v) for v in roi]
    rx1, ry1 = x1 * scale - 0.5, y1 * scale - 0.5
    bin_w = (x2 - x1) * scale / out_size
    bin_h = (y2 - y1) * scale / out_size
    out = np.zeros((out_size, out_size, feat_hwc.shape[2]), np.float64)
    for ph in range(out_size):
        for pw in range(out_size):
            acc = np.zeros(feat_hwc.shape[2])
            for iy in range(sr):
                for ix in range(sr):
                    y = ry1 + bin_h * (ph + (iy + 0.5) / sr)
                    x = rx1 + bin_w * (pw + (ix + 0.5) / sr)
                    if y < -1.0 or y > h or x < -1.0 or x > w:
                        continue
                    y_ = min(max(y, 0.0), h - 1.0)
                    x_ = min(max(x, 0.0), w - 1.0)
                    y0, x0 = int(np.floor(y_)), int(np.floor(x_))
                    y1c, x1c = min(y0 + 1, h - 1), min(x0 + 1, w - 1)
                    ly, lx = y_ - y0, x_ - x0
                    acc += (feat_hwc[y0, x0] * (1 - ly) * (1 - lx) +
                            feat_hwc[y0, x1c] * (1 - ly) * lx +
                            feat_hwc[y1c, x0] * ly * (1 - lx) +
                            feat_hwc[y1c, x1c] * ly * lx)
            out[ph, pw] = acc / (sr * sr)
    return out


def _make_stubs(torch):
    """sys.modules stubs for the mm* imports of srfdet_head.py."""
    nn = torch.nn

    class BaseModule(nn.Module):
        def __init__(self, init_cfg=None):
            super().__init__()
            self.init_cfg = init_cfg

        def init_weights(self):
            pass

    class ConvModule(nn.Module):
        """mmcv ConvModule, conv->norm->act order, bias='auto' rules."""

        def __init__(self, in_channels, out_channels, kernel_size,
                     stride=1, padding=0, groups=1, norm_cfg=None,
                     act_cfg=None, bias="auto"):
            super().__init__()
            with_norm = norm_cfg is not None
            if bias == "auto":
                bias = not with_norm
            self.conv = nn.Conv2d(in_channels, out_channels, kernel_size,
                                  stride, padding, groups=groups, bias=bias)
            if with_norm:
                self.bn = nn.BatchNorm2d(
                    out_channels, eps=norm_cfg.get("eps", 1e-5),
                    momentum=norm_cfg.get("momentum", 0.1))
            self.with_norm = with_norm
            self.act = nn.ReLU(inplace=True)   # mmcv default act ReLU

        def forward(self, x):
            x = self.conv(x)
            if self.with_norm:
                x = self.bn(x)
            return self.act(x)

    def build_conv_layer(cfg, *args, **kwargs):
        kwargs.pop("bias", None)
        return nn.Conv2d(*args, **kwargs)

    def build_activation_layer(cfg):
        assert cfg["type"] == "ReLU"
        return nn.ReLU(inplace=cfg.get("inplace", False))

    def bbox2roi(bbox_list):
        rois = []
        for img_id, bboxes in enumerate(bbox_list):
            inds = bboxes.new_full((bboxes.size(0), 1), img_id)
            rois.append(torch.cat([inds, bboxes], dim=-1))
        return torch.cat(rois, 0)

    class SingleRoIExtractor(nn.Module):
        """mmdet SingleRoIExtractor: finest_scale level map + RoIAlign."""

        def __init__(self, cfg):
            super().__init__()
            self.out_size = cfg["roi_layer"]["output_size"]
            self.sr = cfg["roi_layer"]["sampling_ratio"]
            self.strides = cfg["featmap_strides"]
            self.finest_scale = cfg.get("finest_scale", 56)

        @property
        def num_inputs(self):
            return len(self.strides)

        def forward(self, feats, rois):
            n = rois.shape[0]
            c = feats[0].shape[1]
            r = rois.detach().numpy()
            scale = np.sqrt((r[:, 3] - r[:, 1]) * (r[:, 4] - r[:, 2]))
            lvl = np.floor(np.log2(scale / self.finest_scale + 1e-6))
            lvl = np.clip(lvl, 0, len(feats) - 1).astype(int)
            out = np.zeros((n, self.out_size, self.out_size, c))
            fnp = [f.detach().numpy().transpose(0, 2, 3, 1) for f in feats]
            for i in range(n):
                b = int(r[i, 0])
                out[i] = _np_roi_align(fnp[lvl[i]][b], r[i, 1:5],
                                       self.strides[lvl[i]],
                                       self.out_size, self.sr)
            return torch.from_numpy(
                out.transpose(0, 3, 1, 2).astype(np.float32))

    class MiniRegistry:
        def __init__(self):
            self.map = {}

        def register_module(self, *a, **k):
            def deco(cls):
                self.map[cls.__name__] = cls
                return cls
            return deco

    heads = MiniRegistry()

    def build_head(cfg):
        cfg = dict(cfg)
        return heads.map[cfg.pop("type")](**cfg)

    def force_fp32(*a, **k):
        return lambda fn: fn

    mods = {}
    for name in ("mmcv", "mmcv.runner", "mmcv.cnn", "mmcv.cnn.bricks",
                 "mmcv.cnn.bricks.transformer", "mmcv.ops",
                 "mmdet", "mmdet.core", "mmdet.core.utils",
                 "mmdet.models", "mmdet.models.dense_heads",
                 "mmdet.models.dense_heads.base_dense_head",
                 "mmdet3d", "mmdet3d.core", "mmdet3d.models"):
        mods[name] = types.ModuleType(name)
    mods["mmcv.runner"].force_fp32 = force_fp32
    mods["mmcv.runner"].BaseModule = BaseModule
    mods["mmcv.runner"].ModuleList = nn.ModuleList
    mods["mmcv.cnn"].build_activation_layer = build_activation_layer
    mods["mmcv.cnn"].ConvModule = ConvModule
    mods["mmcv.cnn"].build_conv_layer = build_conv_layer
    mods["mmcv.cnn.bricks.transformer"].build_transformer_layer_sequence = \
        lambda cfg: (_ for _ in ()).throw(AssertionError("encoder off"))
    mods["mmcv.ops"].MultiScaleDeformableAttention = type(
        "MultiScaleDeformableAttention", (nn.Module,), {})
    mods["mmdet.core"].build_assigner = lambda cfg: None
    mods["mmdet.core"].build_sampler = lambda cfg, **k: None
    mods["mmdet.core"].bbox2roi = bbox2roi
    mods["mmdet.core"].multi_apply = lambda f, *a, **k: tuple(
        map(list, zip(*(f(*x, **k) for x in zip(*a)))))
    mods["mmdet.core.utils"].reduce_mean = lambda t: t
    mods["mmdet.models.dense_heads.base_dense_head"].BaseDenseHead = \
        BaseModule
    mods["mmdet3d.core"].box3d_multiclass_nms = lambda *a, **k: None
    mods["mmdet3d.core"].xywhr2xyxyr = lambda x: x
    mods["mmdet3d.models"].HEADS = heads
    mods["mmdet3d.models"].build_loss = lambda cfg: None
    mods["mmdet3d.models"].build_head = build_head
    mods["mmdet3d.models"].build_roi_extractor = SingleRoIExtractor
    return mods


@pytest.fixture(scope="module")
def ref_head_mod():
    torch = pytest.importorskip("torch")
    mods = _make_stubs(torch)
    # package chain so `from ...core.bbox.util import ...` resolves
    for name in ("refsrf", "refsrf.core", "refsrf.core.bbox",
                 "refsrf.models", "refsrf.models.sparse_heads"):
        pkg = types.ModuleType(name)
        pkg.__path__ = []
        mods[name] = pkg
    saved = {k: sys.modules.get(k) for k in
             list(mods) + ["refsrf.core.bbox.util",
                           "refsrf.models.sparse_heads.srfdet_head"]}
    sys.modules.update(mods)
    orig_cuda = torch.Tensor.cuda
    torch.Tensor.cuda = lambda self, *a, **kw: self
    try:
        uspec = importlib.util.spec_from_file_location(
            "refsrf.core.bbox.util", REF_UTIL)
        util = importlib.util.module_from_spec(uspec)
        sys.modules["refsrf.core.bbox.util"] = util
        uspec.loader.exec_module(util)
        hspec = importlib.util.spec_from_file_location(
            "refsrf.models.sparse_heads.srfdet_head", REF_HEAD)
        mod = importlib.util.module_from_spec(hspec)
        sys.modules["refsrf.models.sparse_heads.srfdet_head"] = mod
        hspec.loader.exec_module(mod)
        yield mod, torch
    finally:
        torch.Tensor.cuda = orig_cuda
        for k, v in saved.items():
            if v is None:
                sys.modules.pop(k, None)
            else:
                sys.modules[k] = v


def _build_ref_head(mod, torch):
    torch.manual_seed(0)
    head = mod.SRFDetHead(
        use_img=False,
        num_classes=N_CLASSES,
        feat_channels_lidar=CH,
        feat_channels_img=CH,
        hidden_dim=CH,
        lidar_feat_lvls=4,
        img_feat_lvls=4,
        num_proposals=N_PROP,
        num_heads=N_ITER,
        deep_supervision=True,
        prior_prob=0.01,
        is_kitti=False,
        with_lidar_encoder=False,
        grid_size=GRID,
        out_size_factor=8,
        code_weights=[1.0] * 8 + [0.2, 0.2],
        with_dpg=True,
        num_dpg_exp=2,
        single_head_lidar=dict(
            type="SingleSRFDetHeadLiDAR",
            num_cls_convs=2, num_reg_convs=3,
            dim_feedforward=96, num_heads=4, dropout=0.0,
            dynamic_conv=dict(dynamic_dim=16, dynamic_num=2),
            pc_range=PC_RANGE, voxel_size=VOXEL_SIZE),
        single_head_img=None,
        roi_extractor_lidar=dict(
            type="SingleRoIExtractor",
            roi_layer=dict(type="RoIAlign", output_size=7,
                           sampling_ratio=2),
            out_channels=CH, featmap_strides=STRIDES),
        roi_extractor_img=None,
        loss_cls=None, loss_bbox=None,
        train_cfg=None, test_cfg=dict(use_nms=True))
    head.eval()
    with torch.no_grad():
        # shrink embeddings so init boxes stay mostly inside pc_range
        head.init_proposal_boxes.weight.mul_(0.3)
        for m in head.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.normal_(0, 0.1)
                m.running_var.uniform_(0.5, 1.5)
    return head


def test_full_head_numeric_oracle(ref_head_mod):
    """Reference SRFDetHead forward == our converted flax head, all
    iterations, logits and boxes (srfdet_head.py:379-505)."""
    mod, torch = ref_head_mod
    import jax.numpy as jnp
    from srfdet3d_tpu.models.head import SRFDetHead
    from srfdet3d_tpu.utils.torch_convert import convert_head

    head_t = _build_ref_head(mod, torch)

    bs = 2
    rng = np.random.default_rng(0)
    sizes = [GRID[0] // s for s in STRIDES]
    feats_np = [rng.normal(size=(bs, CH, s, s)).astype(np.float32) * 0.5
                for s in sizes]
    with torch.no_grad():
        want_logits, want_boxes = head_t(
            None, [torch.from_numpy(f) for f in feats_np],
            img_metas=[{} for _ in range(bs)])
    want_logits = want_logits.numpy()          # (L, bs, n_p, cls)
    want_boxes = want_boxes.numpy()            # (L, bs, n_p, 10) abs ctr

    state = {f"bbox_head.{k}": v.detach().numpy()
             for k, v in head_t.state_dict().items()}
    cfg = types.SimpleNamespace(head=types.SimpleNamespace(
        with_dpg=True, lidar_feat_lvls=4, img_feat_lvls=4,
        num_heads=N_ITER, num_attn_heads=4))
    params, stats = {}, {}
    convert_head(state, cfg, params, stats)

    ours = SRFDetHead(
        num_classes=N_CLASSES, feat_channels_lidar=CH, hidden_dim=CH,
        num_proposals=N_PROP, num_heads=N_ITER, with_dpg=True,
        num_dpg_exp=2, pc_range=tuple(PC_RANGE),
        voxel_size=tuple(VOXEL_SIZE), dim_feedforward=96,
        num_cls_convs=2, num_reg_convs=3, num_attn_heads=4, dropout=0.0,
        dynamic_dim=16, lidar_strides=tuple(STRIDES), code_size=10)
    point_feats = [jnp.asarray(np.transpose(f, (0, 2, 3, 1)))
                   for f in feats_np]
    got_logits, got_boxes = ours.apply(
        {"params": params["bbox_head"],
         "batch_stats": stats["bbox_head"]},
        point_feats, train=False)
    got_logits = np.asarray(got_logits)
    got_boxes = np.asarray(got_boxes)

    assert got_logits.shape == want_logits.shape
    assert got_boxes.shape == want_boxes.shape
    np.testing.assert_allclose(got_logits, want_logits,
                               rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(got_boxes, want_boxes,
                               rtol=2e-3, atol=2e-3)


def test_apply_deltas_matches_reference(ref_head_mod):
    """Unit pin: SingleSRFDetHeadLiDAR.apply_deltas_lidar == our
    SingleSRFDetHead.apply_deltas on the same (deltas, abs boxes),
    including the scale clamp and center clipping
    (srfdet_head.py:1534-1626)."""
    mod, torch = ref_head_mod
    import jax.numpy as jnp
    from srfdet3d_tpu.models.head import SingleSRFDetHead

    single_t = mod.SingleSRFDetHeadLiDAR(
        num_classes=N_CLASSES, feat_channels=CH, dim_feedforward=96,
        num_heads=4, dropout=0.0,
        dynamic_conv=dict(dynamic_dim=16, dynamic_num=2),
        pc_range=PC_RANGE, voxel_size=VOXEL_SIZE)
    rng = np.random.default_rng(1)
    n = 16
    deltas = rng.normal(size=(n, 10)).astype(np.float32)
    deltas[3, 3] = 20.0                      # exercise the scale clamp
    boxes = np.zeros((n, 10), np.float32)
    boxes[:, 0:2] = rng.uniform(-4.0, 4.0, (n, 2))
    boxes[:, 2] = rng.uniform(-4.0, 2.0, n)
    boxes[:, 3:6] = rng.normal(size=(n, 3))  # log sizes
    boxes[:, 6:10] = rng.normal(size=(n, 4))
    want = single_t.apply_deltas_lidar(
        torch.from_numpy(deltas), torch.from_numpy(boxes)).numpy()

    ours = SingleSRFDetHead(num_classes=N_CLASSES, feat_channels=CH,
                            pc_range=tuple(PC_RANGE),
                            voxel_size=tuple(VOXEL_SIZE), code_size=10)
    got = np.asarray(ours.apply_deltas(jnp.asarray(deltas),
                                       jnp.asarray(boxes)))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


# ---------------------------------------------------------------------------
# LC fusion path: reference SRFDetHead(use_img=True) with the fusion
# SingleSRFDetHead (srfdet_head.py:2104-2632) vs our flax head.
# ---------------------------------------------------------------------------

N_CAM = 2
CH_IMG = 48            # feat_channels_img != hidden_dim -> img_convs built
# W/32 = 4 does NOT divide the DPG's 30x30 resize target: torch's legacy
# floor(i*in/out) 'nearest' and half-pixel nearest disagree there (they
# coincide when out % in == 0), so this sizing pins the resize convention
IMG_H, IMG_W = 64, 128
IMG_STRIDES = [4, 8, 16, 32]


def _lidar2img(n_cam: int) -> np.ndarray:
    """Two pinhole cameras at +-x looking at the origin from 3 m away."""
    f, cx, cy = 40.0, IMG_W / 2.0, IMG_H / 2.0
    k = np.array([[f, 0, cx, 0], [0, f, cy, 0],
                  [0, 0, 1, 0], [0, 0, 0, 1]], np.float64)
    mats = []
    for cam in range(n_cam):
        sign = 1.0 if cam % 2 == 0 else -1.0
        # cam axes: x_cam = -sign*y, y_cam = -z, z_cam = sign*x + 3
        e = np.array([[0, -sign, 0, 0],
                      [0, 0, -1, 0],
                      [sign, 0, 0, 3.0],
                      [0, 0, 0, 1]], np.float64)
        mats.append(k @ e)
    return np.stack(mats).astype(np.float32)


def _build_ref_head_lc(mod, torch):
    torch.manual_seed(1)
    head = mod.SRFDetHead(
        use_img=True,
        num_classes=N_CLASSES,
        feat_channels_lidar=CH,
        feat_channels_img=CH_IMG,
        hidden_dim=CH,
        lidar_feat_lvls=4,
        img_feat_lvls=4,
        num_proposals=N_PROP,
        num_heads=N_ITER,
        deep_supervision=True,
        prior_prob=0.01,
        is_kitti=False,
        with_lidar_encoder=False,
        grid_size=GRID,
        out_size_factor=8,
        code_weights=[1.0] * 8 + [0.2, 0.2],
        with_dpg=True,
        num_dpg_exp=2,
        single_head_lidar=dict(
            type="SingleSRFDetHead",
            num_cls_convs=2, num_reg_convs=3,
            dim_feedforward=96, num_heads=4, dropout=0.0,
            dynamic_conv=dict(dynamic_dim=16, dynamic_num=2),
            pc_range=PC_RANGE, voxel_size=VOXEL_SIZE,
            use_fusion=True),
        single_head_img=None,
        roi_extractor_lidar=dict(
            type="SingleRoIExtractor",
            roi_layer=dict(type="RoIAlign", output_size=7,
                           sampling_ratio=2),
            out_channels=CH, featmap_strides=STRIDES),
        roi_extractor_img=dict(
            type="SingleRoIExtractor",
            roi_layer=dict(type="RoIAlign", output_size=7,
                           sampling_ratio=2),
            out_channels=CH, featmap_strides=IMG_STRIDES),
        loss_cls=None, loss_bbox=None,
        train_cfg=None, test_cfg=dict(use_nms=True))
    head.eval()
    with torch.no_grad():
        head.init_proposal_boxes.weight.mul_(0.3)
        for m in head.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.normal_(0, 0.1)
                m.running_var.uniform_(0.5, 1.5)
    return head


def test_full_head_fusion_numeric_oracle(ref_head_mod):
    """LC FUSION decoder oracle: reference SRFDetHead(use_img=True) ==
    our flax head with converted weights, all iterations.

    Covers numerically: img_convs channel reduction (srfdet_head.py:147-158),
    the image DPG staircase + F.interpolate + camera sum (:555-596, 30x30
    fc1500), mixed DPG weight averaging (:602), the fusion single head
    (:2104): corner projection through lidar2img with the 1e-5 z clamp
    (:2424-2529), per-camera RoIAlign + camera sum, the img-then-points
    sampler order (img sampler CLONES at :2435, points sampler
    denormalizes in place at :2587 so apply_deltas sees absolute centers
    exactly once), concat order [img, pts] into output_fused_proj
    (:2257-2263).

    bs=1 deliberately: the reference orders image RoIs cam-major
    (`temp_roi[:, 0] += cam_id * bs`, :2056) but flattens features
    batch-major (`feat.reshape(bs*n_cam, ...)`, :2081) — for bs > 1 the
    two indexings disagree (latent upstream bug; every shipped LC config
    trains with samples_per_gpu=1).  At bs=1 both reduce to the camera
    index and the semantics are well-defined."""
    mod, torch = ref_head_mod
    import jax.numpy as jnp
    from srfdet3d_tpu.models.head import SRFDetHead
    from srfdet3d_tpu.utils.torch_convert import convert_head

    head_t = _build_ref_head_lc(mod, torch)

    bs = 1
    rng = np.random.default_rng(7)
    bev_sizes = [GRID[0] // s for s in STRIDES]
    pts_np = [rng.normal(size=(bs, CH, s, s)).astype(np.float32) * 0.5
              for s in bev_sizes]
    img_np = [rng.normal(size=(bs, N_CAM, CH_IMG, IMG_H // s, IMG_W // s)
                         ).astype(np.float32) * 0.5
              for s in IMG_STRIDES]
    l2i = np.tile(_lidar2img(N_CAM)[None], (bs, 1, 1, 1))
    img_metas = [{"lidar2img": l2i[b]} for b in range(bs)]

    with torch.no_grad():
        want_logits, want_boxes = head_t(
            [torch.from_numpy(f) for f in img_np],
            [torch.from_numpy(f) for f in pts_np],
            img_metas=img_metas)
    want_logits = want_logits.numpy()
    want_boxes = want_boxes.numpy()

    state = {f"bbox_head.{k}": v.detach().numpy()
             for k, v in head_t.state_dict().items()}
    cfg = types.SimpleNamespace(head=types.SimpleNamespace(
        with_dpg=True, lidar_feat_lvls=4, img_feat_lvls=4,
        num_heads=N_ITER, num_attn_heads=4))
    params, stats = {}, {}
    convert_head(state, cfg, params, stats)

    ours = SRFDetHead(
        num_classes=N_CLASSES, feat_channels_lidar=CH,
        feat_channels_img=CH_IMG, hidden_dim=CH, use_img=True,
        num_proposals=N_PROP, num_heads=N_ITER, with_dpg=True,
        num_dpg_exp=2, pc_range=tuple(PC_RANGE),
        voxel_size=tuple(VOXEL_SIZE), dim_feedforward=96,
        num_cls_convs=2, num_reg_convs=3, num_attn_heads=4, dropout=0.0,
        dynamic_dim=16, lidar_strides=tuple(STRIDES),
        img_strides=tuple(IMG_STRIDES), code_size=10)
    point_feats = [jnp.asarray(np.transpose(f, (0, 2, 3, 1)))
                   for f in pts_np]
    img_feats = [jnp.asarray(np.transpose(f, (0, 1, 3, 4, 2)))
                 for f in img_np]
    got_logits, got_boxes = ours.apply(
        {"params": params["bbox_head"],
         "batch_stats": stats["bbox_head"]},
        point_feats, img_feats, jnp.asarray(l2i), train=False)
    got_logits = np.asarray(got_logits)
    got_boxes = np.asarray(got_boxes)

    assert got_logits.shape == want_logits.shape
    assert got_boxes.shape == want_boxes.shape
    np.testing.assert_allclose(got_logits, want_logits,
                               rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(got_boxes, want_boxes,
                               rtol=2e-3, atol=2e-3)
