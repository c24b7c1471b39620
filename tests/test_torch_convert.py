"""Torch->JAX conversion: layout translations verified against torch ops."""
import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp
from flax import linen as nn

from srfdet3d_tpu.utils.torch_convert import (bn, conv2d_w, linear_w, mha_w,
                                              spconv_w, stack_layers,
                                              convert_second_backbone)


def test_conv2d_numerics():
    tconv = torch.nn.Conv2d(3, 8, 3, padding=1, bias=False)
    x = torch.randn(1, 3, 16, 16)
    want = tconv(x).detach().numpy().transpose(0, 2, 3, 1)

    fconv = nn.Conv(8, (3, 3), padding=1, use_bias=False)
    params = {"params": {"kernel": jnp.asarray(conv2d_w(
        tconv.weight.detach().numpy()))}}
    got = fconv.apply(params, jnp.asarray(
        x.numpy().transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)


def test_linear_numerics():
    tl = torch.nn.Linear(6, 4)
    x = torch.randn(5, 6)
    want = tl(x).detach().numpy()
    fl = nn.Dense(4)
    params = {"params": {
        "kernel": jnp.asarray(linear_w(tl.weight.detach().numpy())),
        "bias": jnp.asarray(tl.bias.detach().numpy())}}
    got = fl.apply(params, jnp.asarray(x.numpy()))
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)


def test_mha_numerics():
    c, nh = 16, 4
    tm = torch.nn.MultiheadAttention(c, nh, batch_first=True)
    x = torch.randn(2, 7, c)
    want = tm(x, x, x)[0].detach().numpy()

    conv = mha_w(tm.in_proj_weight.detach().numpy(),
                 tm.in_proj_bias.detach().numpy(),
                 tm.out_proj.weight.detach().numpy(),
                 tm.out_proj.bias.detach().numpy(), nh)
    fm = nn.MultiHeadDotProductAttention(num_heads=nh, qkv_features=c,
                                         out_features=c)
    got = fm.apply({"params": jax.tree_util.tree_map(jnp.asarray, conv)},
                   jnp.asarray(x.numpy()), jnp.asarray(x.numpy()),
                   deterministic=True)
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-4)


def test_spconv_layouts():
    w = np.arange(2 * 3 * 3 * 3 * 4, dtype=np.float32).reshape(
        4, 3, 3, 3, 2)                         # (out=4, k, k, k, in=2)
    out = spconv_w(w, layout="OKI")
    assert out.shape == (27, 2, 4)
    # z-major order: entry (kz, ky, kx) = flat kz*9+ky*3+kx
    np.testing.assert_array_equal(out[0], w[:, 0, 0, 0, :].T)
    np.testing.assert_array_equal(out[26], w[:, 2, 2, 2, :].T)

    w2 = np.transpose(w, (1, 2, 3, 4, 0))     # (k,k,k,in,out)
    out2 = spconv_w(w2, layout="KIO")
    np.testing.assert_array_equal(out, out2)


def test_bn_and_stack():
    state = {"m.weight": np.ones(4), "m.bias": np.zeros(4),
             "m.running_mean": np.full(4, 0.5),
             "m.running_var": np.full(4, 2.0)}
    s, st = bn(state, "m")
    assert s["scale"].shape == (4,) and st["var"][0] == 2.0
    stacked = stack_layers([np.ones((3, 3)), np.zeros((3, 3))])
    assert stacked.shape == (2, 3, 3)


def test_second_backbone_mapping():
    # build a torch-style SECOND state dict: 2 stages x (1+n) conv-bn units
    layer_nums = (1, 1)
    state = {}
    chans = [(4, 8), (8, 8), (8, 16), (16, 16)]
    idx = 0
    for stage in range(2):
        for j in range(2):
            cin, cout = chans[idx]
            state[f"pts_backbone.blocks.{stage}.{3*j}.weight"] = \
                np.random.rand(cout, cin, 3, 3).astype(np.float32)
            for suffix, shape in (("weight", cout), ("bias", cout),
                                  ("running_mean", cout),
                                  ("running_var", cout)):
                state[f"pts_backbone.blocks.{stage}.{3*j+1}.{suffix}"] = \
                    np.random.rand(shape).astype(np.float32)
            idx += 1
    params, stats = {}, {}
    convert_second_backbone(state, "pts_backbone", layer_nums, params,
                            stats)
    assert set(params) == {f"ConvBNReLU_{i}" for i in range(4)}
    assert params["ConvBNReLU_0"]["Conv_0"]["kernel"].shape == (3, 3, 4, 8)
    assert stats["ConvBNReLU_3"]["BatchNorm_0"]["var"].shape == (16,)


def test_convert_fpn_pool_mode_structure():
    """extra_convs=False conversion: no extra_{i} entries are produced and
    the result matches a pool-mode FPN's init tree exactly."""
    import jax
    import jax.numpy as jnp
    from srfdet3d_tpu.models.fpn import FPN
    from srfdet3d_tpu.utils.torch_convert import convert_fpn
    rng = np.random.default_rng(0)
    st = {}
    for i, cin in enumerate((16, 32)):
        st[f"pts_neck.lateral_convs.{i}.conv.weight"] = rng.normal(
            size=(8, cin, 1, 1)).astype(np.float32)
        st[f"pts_neck.fpn_convs.{i}.conv.weight"] = rng.normal(
            size=(8, 8, 3, 3)).astype(np.float32)
        for stat, val in (("weight", 1.0), ("bias", 0.0),
                          ("running_mean", 0.0), ("running_var", 1.0)):
            st[f"pts_neck.lateral_convs.{i}.bn.{stat}"] = np.full(
                8, val, np.float32)
            st[f"pts_neck.fpn_convs.{i}.bn.{stat}"] = np.full(
                8, val, np.float32)
    params, stats = {}, {}
    convert_fpn(st, "pts_neck", "pts_neck", 2, 4, params, stats,
                extra_convs=False)
    fpn = FPN(out_channels=8, num_outs=4, use_norm=True, use_act=True,
              extra_convs=False)
    ins = [jnp.zeros((1, 8, 8, 16)), jnp.zeros((1, 4, 4, 32))]
    ref = jax.eval_shape(lambda: fpn.init(jax.random.PRNGKey(0), ins))

    def paths(tree, p=()):
        out = set()
        for k, v in tree.items():
            if isinstance(v, dict):
                out |= paths(v, p + (k,))
            else:
                out.add(p + (k, np.shape(v)))
        return out

    assert paths(params["pts_neck"]) == paths(dict(ref["params"]))
    assert paths(stats["pts_neck"]) == paths(dict(ref["batch_stats"]))


def test_bev_in_perm_numeric():
    """A torch conv reading the reference's (C*D)-grouped BEV channels and
    our converted conv reading the z-major (D*C) grouping must produce the
    same output once bev_in_perm reorders the kernel's input axis."""
    import jax
    import jax.numpy as jnp
    from srfdet3d_tpu.utils.torch_convert import bev_in_perm, conv2d_w
    rng = np.random.default_rng(0)
    D, C, H, W, OUT = 2, 3, 5, 6, 4
    x = rng.normal(size=(1, D, H, W, C)).astype(np.float32)  # our dense
    # our BEV: (B, H, W, D*C) z-major (sparse_encoder.py:284-287)
    bev_ours = np.transpose(x, (0, 2, 3, 1, 4)).reshape(1, H, W, D * C)
    # reference BEV: (N, C, D, H, W) -> (N, C*D, H, W) -> NHWC
    bev_ref = np.transpose(x, (0, 4, 1, 2, 3)).reshape(1, C * D, H, W)
    bev_ref = np.transpose(bev_ref, (0, 2, 3, 1))

    w_torch = rng.normal(size=(OUT, C * D, 3, 3)).astype(np.float32)

    def conv(inp, hwio):
        return jax.lax.conv_general_dilated(
            inp, hwio, (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    want = conv(bev_ref, conv2d_w(w_torch))
    perm = bev_in_perm(D, C)
    got = conv(bev_ours, conv2d_w(w_torch)[:, :, perm, :])
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_encoder_out_depth_matches_reference_second_in_channels():
    """The computed BEV depth must reproduce the reference's SECOND
    in_channels=256 (= output_channels * D) for every sparse config
    (e.g. srfdet_voxel_nusc_L.py:45,57: C=128, z chain 41->...->2)."""
    from srfdet3d_tpu.configs import get_config
    from srfdet3d_tpu.utils.torch_convert import _encoder_out_depth
    for name in ("srfdet_voxel_nusc_L", "srfdet_voxel_kitti_L",
                 "srfdet_dvoxel_waymo_L", "srfdet_dvoxel_nusc_L"):
        cfg = get_config(name)
        d = _encoder_out_depth(cfg)
        assert d * cfg.middle.output_channels == 256, (name, d)
