"""Parity oracles against the REFERENCE's own torch code.

`/root/reference/mmdet3d_plugin/core/bbox/util.py` imports only torch, so
it can run directly as a numerical oracle (its hardcoded `.cuda()` calls
are patched to no-ops for CPU).  These tests pin our geometry codecs to
the reference implementation bit-for-bit (float32 tolerance), which is a
stronger guarantee than the hand-derived fixtures elsewhere.

Skipped automatically when the reference checkout is absent.
"""

import importlib.util
import os

import numpy as np
import pytest

REF_UTIL = "/root/reference/mmdet3d_plugin/core/bbox/util.py"

pytestmark = pytest.mark.skipif(
    not os.path.exists(REF_UTIL), reason="reference checkout not mounted")


@pytest.fixture(scope="module")
def ref_util():
    torch = pytest.importorskip("torch")
    spec = importlib.util.spec_from_file_location("ref_bbox_util", REF_UTIL)
    mod = importlib.util.module_from_spec(spec)
    # util.py:134,143-145 call .cuda() unconditionally; run it on CPU
    orig_cuda = torch.Tensor.cuda
    torch.Tensor.cuda = lambda self, *a, **kw: self
    try:
        spec.loader.exec_module(mod)
        yield mod, torch
    finally:
        torch.Tensor.cuda = orig_cuda


PC_RANGE = [-55.2, -55.2, -5.0, 55.2, 55.2, 3.0]


def _rand_boxes(rng, shape, dim):
    b = np.zeros(shape + (dim,), np.float32)
    b[..., 0:2] = rng.uniform(-50, 50, shape + (2,))
    b[..., 2] = rng.uniform(-4, 2, shape)
    b[..., 3:6] = rng.uniform(0.3, 6.0, shape + (3,))
    b[..., 6] = rng.uniform(-np.pi, np.pi, shape)
    if dim > 7:
        b[..., 7:9] = rng.normal(size=shape + (2,))
    return b


@pytest.mark.parametrize("dim", [7, 9])
def test_normalize_bbox_matches_reference(ref_util, dim):
    mod, torch = ref_util
    from srfdet3d_tpu.geometry.boxes import normalize_bbox
    rng = np.random.default_rng(0)
    boxes = _rand_boxes(rng, (2, 5), dim)
    want = mod.normalize_bbox(torch.from_numpy(boxes), PC_RANGE).numpy()
    got = np.asarray(normalize_bbox(boxes))
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


@pytest.mark.parametrize("dim", [8, 10])
def test_denormalize_bbox_matches_reference(ref_util, dim):
    mod, torch = ref_util
    from srfdet3d_tpu.geometry.boxes import denormalize_bbox
    rng = np.random.default_rng(1)
    n = np.zeros((3, 4, dim), np.float32)
    n[..., 0:3] = rng.uniform(-50, 50, (3, 4, 3))
    n[..., 3:6] = rng.uniform(-1.0, 2.0, (3, 4, 3))     # log sizes
    ang = rng.uniform(-np.pi, np.pi, (3, 4))
    n[..., 6] = np.sin(ang)
    n[..., 7] = np.cos(ang)
    if dim > 8:
        n[..., 8:10] = rng.normal(size=(3, 4, 2))
    want = mod.denormalize_bbox(torch.from_numpy(n), PC_RANGE).numpy()
    got = np.asarray(denormalize_bbox(n))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("bottom_center", [True, False])
@pytest.mark.parametrize("sincos", [True, False])
def test_corners_match_reference(ref_util, bottom_center, sincos):
    """Pins the corner layout AND the row-vector rotation convention
    (x' = x cos + y sin) the reference uses (util.py:146-159), including
    the always-exp of size fields."""
    mod, torch = ref_util
    from srfdet3d_tpu.geometry.boxes import boxes3d_to_corners3d
    rng = np.random.default_rng(2)
    raw = _rand_boxes(rng, (2, 6), 7)
    logged = raw.copy()
    logged[..., 3:6] = np.log(raw[..., 3:6])
    if sincos:
        ours_in = np.concatenate(
            [logged[..., :6], np.sin(logged[..., 6:7]),
             np.cos(logged[..., 6:7])], axis=-1)
        ref_in, ref_ry = ours_in, False        # 8-col sincos input
    else:
        ours_in, ref_in, ref_ry = logged, logged, True
    want = mod.boxes3d_to_corners3d(
        torch.from_numpy(ref_in), bottom_center=bottom_center,
        ry=ref_ry).numpy()
    got = np.asarray(boxes3d_to_corners3d(
        ours_in, bottom_center=bottom_center, yaw_as_sincos=sincos,
        log_size=True))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


REF_COST = ("/root/reference/mmdet3d_plugin/core/bbox/match_costs/"
            "match_cost.py")


def test_bbox3d_l1_cost_matches_reference():
    """Our OTA reg-cost term equals the reference BBox3DL1Cost
    (torch.cdist p=1, match_cost.py:26) on identical normalized codes.
    The mmdet registry import is stubbed — the module only needs the
    decorator."""
    torch = pytest.importorskip("torch")
    import sys
    import types
    mods = {}
    for name in ("mmdet", "mmdet.core", "mmdet.core.bbox",
                 "mmdet.core.bbox.match_costs",
                 "mmdet.core.bbox.match_costs.builder"):
        mods[name] = types.ModuleType(name)
    reg = types.SimpleNamespace(register_module=lambda *a, **k: (
        lambda cls=None: cls if cls is not None else (lambda c: c)))
    mods["mmdet.core.bbox.match_costs.builder"].MATCH_COST = reg
    saved = {k: sys.modules.get(k) for k in mods}
    sys.modules.update(mods)
    try:
        spec = importlib.util.spec_from_file_location("ref_cost", REF_COST)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
    finally:
        for k, v in saved.items():
            if v is None:
                sys.modules.pop(k, None)
            else:
                sys.modules[k] = v
    import jax.numpy as jnp
    rng = np.random.default_rng(3)
    pred = rng.normal(size=(9, 8)).astype(np.float32)
    gt = rng.normal(size=(4, 8)).astype(np.float32)
    want = mod.BBox3DL1Cost(weight=0.25)(
        torch.from_numpy(pred), torch.from_numpy(gt)).numpy()
    got = 0.25 * np.asarray(jnp.sum(
        jnp.abs(jnp.asarray(pred)[:, None] - jnp.asarray(gt)[None]),
        axis=-1))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


REF_VOVNET = "/root/reference/mmdet3d_plugin/models/backbones/vovnet.py"


def test_vovnet_conversion_numeric_oracle():
    """NUMERIC backbone parity: run the reference's own torch VoVNet
    (V-19-slim-eSE, eval mode), convert its state_dict with
    convert_vovnet, and assert our flax VoVNet reproduces every stage
    output on the same input.  Validates both the conversion mapping and
    the architecture (stem strides, OSA wiring, eSE hsigmoid, ceil-mode
    pooling) end-to-end."""
    torch = pytest.importorskip("torch")
    import sys
    import types
    import jax
    import jax.numpy as jnp
    from srfdet3d_tpu.models.vovnet import VoVNet
    from srfdet3d_tpu.utils.torch_convert import convert_vovnet

    mods = {}
    for name in ("mmcv", "mmcv.runner", "mmdet", "mmdet.models",
                 "mmdet.models.builder"):
        mods[name] = types.ModuleType(name)

    class BaseModule(torch.nn.Module):
        def __init__(self, init_cfg=None):
            super().__init__()

    mods["mmcv.runner"].BaseModule = BaseModule
    mods["mmdet.models.builder"].BACKBONES = types.SimpleNamespace(
        register_module=lambda *a, **k: (
            lambda cls=None: cls if cls is not None else (lambda c: c)))
    saved = {k: sys.modules.get(k) for k in mods}
    sys.modules.update(mods)
    try:
        spec = importlib.util.spec_from_file_location("ref_vovnet",
                                                      REF_VOVNET)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
    finally:
        for k, v in saved.items():
            if v is None:
                sys.modules.pop(k, None)
            else:
                sys.modules[k] = v

    torch.manual_seed(0)
    net_t = mod.VoVNet("V-19-slim-eSE",
                       out_features=["stage2", "stage3", "stage4", "stage5"])
    net_t.eval()
    # randomize BN stats so the conversion of running stats is exercised
    with torch.no_grad():
        for m in net_t.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.normal_(0, 0.1)
                m.running_var.uniform_(0.5, 1.5)

    state = {f"img_backbone.{k}": v.detach().numpy()
             for k, v in net_t.state_dict().items()}
    params, stats = {}, {}
    convert_vovnet(state, "img_backbone", "vovnet-19-slim", params, stats)

    rng = np.random.default_rng(0)
    x = rng.normal(size=(1, 3, 64, 96)).astype(np.float32)
    with torch.no_grad():
        want = net_t(torch.from_numpy(x))

    ours = VoVNet("vovnet-19-slim")
    outs = ours.apply({"params": params, "batch_stats": stats},
                      jnp.asarray(np.transpose(x, (0, 2, 3, 1))))
    for i, name in enumerate(["stage2", "stage3", "stage4", "stage5"]):
        got = np.transpose(np.asarray(outs[i]), (0, 3, 1, 2))
        np.testing.assert_allclose(got, want[name].numpy(),
                                   rtol=2e-3, atol=2e-4,
                                   err_msg=name)


REF_SECOND = ("/root/reference/mmdet3d_plugin/models/backbones/"
              "second_custom.py")


def test_second_conversion_numeric_oracle():
    """NUMERIC BEV-backbone parity: run the reference's own torch
    SECONDCustom (eval mode, randomized BN stats), convert its
    state_dict with convert_second_backbone, and assert our flax SECOND
    reproduces every stage output (second_custom.py:24-91: stride-2
    entry conv + N 3x3 convs per stage, BN eps=1e-3)."""
    torch = pytest.importorskip("torch")
    import sys
    import types
    import jax.numpy as jnp
    from srfdet3d_tpu.models.second import SECOND
    from srfdet3d_tpu.utils.torch_convert import convert_second_backbone

    nn = torch.nn
    mods = {}
    for name in ("mmcv", "mmcv.cnn", "mmcv.runner",
                 "mmdet", "mmdet.models"):
        mods[name] = types.ModuleType(name)

    def build_conv_layer(cfg, in_c, out_c, k, stride=1, padding=0):
        return nn.Conv2d(in_c, out_c, k, stride=stride, padding=padding,
                         bias=cfg.get("bias", True))

    def build_norm_layer(cfg, c):
        return "bn", nn.BatchNorm2d(c, eps=cfg["eps"],
                                    momentum=cfg["momentum"])

    class BaseModule(nn.Module):
        def __init__(self, init_cfg=None):
            super().__init__()

    mods["mmcv.cnn"].build_conv_layer = build_conv_layer
    mods["mmcv.cnn"].build_norm_layer = build_norm_layer
    mods["mmcv.runner"].BaseModule = BaseModule
    mods["mmdet.models"].BACKBONES = types.SimpleNamespace(
        register_module=lambda *a, **k: (lambda cls: cls))
    saved = {k: sys.modules.get(k) for k in mods}
    sys.modules.update(mods)
    try:
        spec = importlib.util.spec_from_file_location("ref_second",
                                                      REF_SECOND)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
    finally:
        for k, v in saved.items():
            if v is None:
                sys.modules.pop(k, None)
            else:
                sys.modules[k] = v

    torch.manual_seed(0)
    layer_nums = [2, 3, 3]
    out_channels = [16, 32, 64]
    net_t = mod.SECONDCustom(in_channels=8, out_channels=out_channels,
                             layer_nums=layer_nums,
                             layer_strides=[2, 2, 2])
    net_t.eval()
    with torch.no_grad():
        for m in net_t.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.normal_(0, 0.1)
                m.running_var.uniform_(0.5, 1.5)

    state = {f"pts_backbone.{k}": v.detach().numpy()
             for k, v in net_t.state_dict().items()}
    params, stats = {}, {}
    convert_second_backbone(state, "pts_backbone", layer_nums, params,
                            stats)

    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 8, 32, 32)).astype(np.float32)
    with torch.no_grad():
        want = net_t(torch.from_numpy(x))

    ours = SECOND(out_channels=tuple(out_channels),
                  layer_nums=tuple(layer_nums), layer_strides=(2, 2, 2))
    outs = ours.apply({"params": params, "batch_stats": stats},
                      jnp.asarray(np.transpose(x, (0, 2, 3, 1))),
                      train=False)
    for i in range(3):
        got = np.transpose(np.asarray(outs[i]), (0, 3, 1, 2))
        np.testing.assert_allclose(got, want[i].numpy(),
                                   rtol=1e-4, atol=1e-4,
                                   err_msg=f"stage{i}")
