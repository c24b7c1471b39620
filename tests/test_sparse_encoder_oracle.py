"""SparseEncoderCustom oracle: the reference's own middle-encoder torch
code vs our flax SparseEncoder on converter-mapped weights.

spconv is CUDA-only, so the reference file
(`/root/reference/mmdet3d_plugin/models/middle_encoders/sparse_encoder_custom.py`)
is executed with a DENSE torch stand-in for the spconv API that
implements exact sparse-conv semantics on small grids:

  - SubMConv3d: output active set == input active set; features = dense
    conv3d sampled at the active sites (inactive neighbors contribute 0,
    like missing rulebook entries);
  - SparseConv3d (strided): output active set = every output cell whose
    receptive field covers >= 1 active input (occupancy conv > 0);
  - BN1d / ReLU apply to the (N, C) feature rows only.

This pins, numerically and end-to-end: the layer STACK the reference
builds (conv_input subm1, per-stage downsample/subm wiring for BOTH
block_type layouts incl. the tuple (0, 1, 1) padding, SparseBasicBlock
residual order, conv_out k(3,1,1) s(2,1,1) p0) and the final
`.dense()` -> (N, C*D, H, W) BEV reshape, against our flat-batched
rulebook encoder + convert_sparse_encoder weight mapping
(sparse_encoder_custom.py:74-216, 110-140).

Our encoder emits (B, H, W, D*C) z-major channels; the comparison goes
through the same c*D + d permutation the converter applies to the first
SECOND conv (torch_convert.bev_in_perm).

Skipped when the reference checkout is absent.
"""

import importlib.util
import os
import sys
import types

import numpy as np
import pytest

REF_ENC = ("/root/reference/mmdet3d_plugin/models/middle_encoders/"
           "sparse_encoder_custom.py")

pytestmark = pytest.mark.skipif(
    not os.path.exists(REF_ENC), reason="reference checkout not mounted")


def _make_spconv_stub(torch):
    """Dense-grid stand-in for the spconv / mmdet3d.ops API."""
    nn = torch.nn
    F = torch.nn.functional

    class SparseConvTensor:
        def __init__(self, features, indices, spatial_shape, batch_size):
            self.features = features            # (N, C)
            self.indices = indices              # (N, 4) int (b, z, y, x)
            self.spatial_shape = list(spatial_shape)
            self.batch_size = batch_size

        def dense(self):
            d, h, w = self.spatial_shape
            c = self.features.shape[1]
            out = self.features.new_zeros(self.batch_size, c, d, h, w)
            i = self.indices.long()
            out[i[:, 0], :, i[:, 1], i[:, 2], i[:, 3]] = self.features
            return out

    def _t3(v):
        return (v, v, v) if isinstance(v, int) else tuple(v)

    class _SparseConv3d(nn.Module):
        """Weight layout (kz, ky, kx, in, out) = mmcv.ops 'KIO'."""

        def __init__(self, in_c, out_c, kernel, stride, padding, subm):
            super().__init__()
            k = _t3(kernel)
            self.kernel, self.stride, self.padding = k, _t3(stride), \
                _t3(padding)
            self.subm = subm
            self.weight = nn.Parameter(torch.empty(*k, in_c, out_c))
            nn.init.normal_(self.weight, 0, 0.1)

        def forward(self, x):
            w = self.weight.permute(4, 3, 0, 1, 2)     # (out,in,kz,ky,kx)
            dense = x.dense()
            if self.subm:
                y = F.conv3d(dense, w, stride=1, padding=self.padding)
                i = x.indices.long()
                feats = y[i[:, 0], :, i[:, 1], i[:, 2], i[:, 3]]
                return SparseConvTensor(feats, x.indices, x.spatial_shape,
                                        x.batch_size)
            y = F.conv3d(dense, w, stride=self.stride, padding=self.padding)
            occ = dense.new_zeros(x.batch_size, 1, *x.spatial_shape)
            i = x.indices.long()
            occ[i[:, 0], 0, i[:, 1], i[:, 2], i[:, 3]] = 1.0
            ones = dense.new_ones(1, 1, *self.kernel)
            occ_out = F.conv3d(occ, ones, stride=self.stride,
                               padding=self.padding) > 0
            nz = occ_out[:, 0].nonzero()               # (M, 4) b,z,y,x
            feats = y[nz[:, 0], :, nz[:, 1], nz[:, 2], nz[:, 3]]
            return SparseConvTensor(feats, nz.int(), list(y.shape[2:]),
                                    x.batch_size)

    class SparseSequential(nn.Sequential):
        def forward(self, x):
            for m in self:
                if isinstance(m, (_SparseConv3d, SparseSequential,
                                  SparseBasicBlock)):
                    x = m(x)
                else:                                   # BN1d / ReLU
                    x = SparseConvTensor(m(x.features), x.indices,
                                         x.spatial_shape, x.batch_size)
            return x

    def make_sparse_convmodule(in_c, out_c, kernel_size, norm_cfg,
                               stride=1, padding=0, indice_key=None,
                               conv_type="SubMConv3d",
                               order=("conv", "norm", "act")):
        conv = _SparseConv3d(in_c, out_c, kernel_size, stride, padding,
                             subm=(conv_type == "SubMConv3d"))
        mods = []
        for o in order:
            if o == "conv":
                mods.append(conv)
            elif o == "norm":
                mods.append(nn.BatchNorm1d(out_c, eps=norm_cfg["eps"],
                                           momentum=norm_cfg["momentum"]))
            elif o == "act":
                mods.append(nn.ReLU(inplace=True))
        return SparseSequential(*mods)

    class SparseBasicBlock(nn.Module):
        """mmdet3d SparseBasicBlock: subm3x3 bn relu subm3x3 bn + id, relu."""

        def __init__(self, in_c, out_c, norm_cfg=None, conv_cfg=None):
            super().__init__()
            self.conv1 = _SparseConv3d(in_c, out_c, 3, 1, 1, subm=True)
            self.bn1 = nn.BatchNorm1d(out_c, eps=norm_cfg["eps"],
                                      momentum=norm_cfg["momentum"])
            self.conv2 = _SparseConv3d(out_c, out_c, 3, 1, 1, subm=True)
            self.bn2 = nn.BatchNorm1d(out_c, eps=norm_cfg["eps"],
                                      momentum=norm_cfg["momentum"])
            self.relu = nn.ReLU(inplace=True)

        def forward(self, x):
            identity = x.features
            out = self.conv1(x)
            f = self.relu(self.bn1(out.features))
            out = self.conv2(SparseConvTensor(f, out.indices,
                                              out.spatial_shape,
                                              out.batch_size))
            f = self.relu(self.bn2(out.features) + identity)
            return SparseConvTensor(f, out.indices, out.spatial_shape,
                                    out.batch_size)

    return (SparseConvTensor, SparseSequential, make_sparse_convmodule,
            SparseBasicBlock)


@pytest.fixture(scope="module")
def ref_encoder_mod():
    torch = pytest.importorskip("torch")
    nn = torch.nn
    (SparseConvTensor, SparseSequential, make_sparse_convmodule,
     SparseBasicBlock) = _make_spconv_stub(torch)

    class BaseModule(nn.Module):
        def __init__(self, init_cfg=None):
            super().__init__()

    def auto_fp16(*a, **k):
        return lambda fn: fn

    mods = {}
    for name in ("mmcv", "mmcv.ops", "mmcv.runner",
                 "mmdet", "mmdet.models", "mmdet.models.losses",
                 "mmdet3d", "mmdet3d.ops", "mmdet3d.ops.spconv",
                 "mmdet3d.models", "mmdet3d.models.builder"):
        mods[name] = types.ModuleType(name)
    mods["mmcv.ops"].points_in_boxes_all = None
    mods["mmcv.ops"].three_interpolate = None
    mods["mmcv.ops"].three_nn = None
    mods["mmcv.ops"].SparseConvTensor = SparseConvTensor
    mods["mmcv.ops"].SparseSequential = SparseSequential
    mods["mmcv.runner"].auto_fp16 = auto_fp16
    mods["mmcv.runner"].BaseModule = BaseModule
    mods["mmdet3d.ops"].SparseBasicBlock = SparseBasicBlock
    mods["mmdet3d.ops"].make_sparse_convmodule = make_sparse_convmodule
    mods["mmdet3d.ops.spconv"].IS_SPCONV2_AVAILABLE = False
    mods["mmdet.models.losses"].sigmoid_focal_loss = None
    mods["mmdet.models.losses"].smooth_l1_loss = None
    mods["mmdet3d.models.builder"].MIDDLE_ENCODERS = types.SimpleNamespace(
        register_module=lambda *a, **k: (lambda cls: cls))
    saved = {k: sys.modules.get(k) for k in mods}
    sys.modules.update(mods)
    try:
        spec = importlib.util.spec_from_file_location("ref_sparse_enc",
                                                      REF_ENC)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        yield mod, torch, SparseConvTensor
    finally:
        for k, v in saved.items():
            if v is None:
                sys.modules.pop(k, None)
            else:
                sys.modules[k] = v


def _random_voxels(rng, b, v, shape):
    """Distinct (z, y, x) sites per sample + capacity mask."""
    d, h, w = shape
    coords = np.zeros((b, v, 3), np.int32)
    mask = np.zeros((b, v), bool)
    for s in range(b):
        n = rng.integers(v // 2, v - 4)
        flat = rng.choice(d * h * w, size=n, replace=False)
        coords[s, :n, 0] = flat // (h * w)
        coords[s, :n, 1] = (flat // w) % h
        coords[s, :n, 2] = flat % w
        mask[s, :n] = True
    return coords, mask


def _run_oracle(ref_encoder_mod, block_type, shape, channels, paddings,
                capacities, seed):
    mod, torch, SparseConvTensor = ref_encoder_mod
    import jax
    import jax.numpy as jnp
    from srfdet3d_tpu.models.sparse_encoder import SparseEncoder
    from srfdet3d_tpu.utils.torch_convert import (bev_in_perm,
                                                  convert_sparse_encoder)

    in_c, base_c, out_c = 4, 8, 16
    torch.manual_seed(seed)
    enc_t = mod.SparseEncoderCustom(
        in_channels=in_c, sparse_shape=list(shape),
        base_channels=base_c, output_channels=out_c,
        encoder_channels=channels, encoder_paddings=paddings,
        block_type=block_type)
    enc_t.eval()
    with torch.no_grad():
        for m in enc_t.modules():
            if isinstance(m, torch.nn.BatchNorm1d):
                m.running_mean.normal_(0, 0.1)
                m.running_var.uniform_(0.5, 1.5)

    rng = np.random.default_rng(seed)
    b, v = 2, 256
    coords, mask = _random_voxels(rng, b, v, shape)
    feats = (rng.normal(size=(b, v, in_c)).astype(np.float32) *
             mask[..., None])

    # reference input: flat (N, 4) coors (b, z, y, x)
    flat_feats, flat_coors = [], []
    for s in range(b):
        n = int(mask[s].sum())
        flat_feats.append(feats[s, :n])
        flat_coors.append(np.concatenate(
            [np.full((n, 1), s, np.int32), coords[s, :n]], axis=1))
    with torch.no_grad():
        want = enc_t(torch.from_numpy(np.concatenate(flat_feats)),
                     torch.from_numpy(np.concatenate(flat_coors)),
                     b).numpy()                      # (B, C*D, H, W)

    state = {f"pts_middle_encoder.{k}": v_.detach().numpy()
             for k, v_ in enc_t.state_dict().items()}
    cfg = types.SimpleNamespace(middle=types.SimpleNamespace(
        encoder_channels=channels, block_type=block_type))
    params, stats = {}, {}
    convert_sparse_encoder(state, cfg, params, stats, layout="KIO")

    ours = SparseEncoder(
        in_channels=in_c, sparse_shape=shape, base_channels=base_c,
        output_channels=out_c, encoder_channels=channels,
        encoder_paddings=paddings, block_type=block_type,
        capacities=capacities)
    run = jax.jit(lambda fe, co, ma: ours.apply(
        {"params": params["pts_middle_encoder"],
         "batch_stats": stats["pts_middle_encoder"]},
        fe, co, ma, train=False))
    got = np.asarray(run(jnp.asarray(feats), jnp.asarray(coords),
                         jnp.asarray(mask)))         # (B, H, W, D*C)

    d_out = want.shape[1] // out_c
    perm = bev_in_perm(d_out, out_c)                 # ours[k] = ref[perm[k]]
    got_cdhw = np.transpose(got, (0, 3, 1, 2))       # (B, D*C, H, W) z-major
    want_zmajor = want[:, perm]
    np.testing.assert_allclose(got_cdhw, want_zmajor, rtol=2e-4, atol=2e-4)


def test_sparse_encoder_oracle_conv_module(ref_encoder_mod):
    """KITTI-style conv_module layout, incl. the (0, 1, 1) tuple padding
    on the final stage's downsample (sparse_encoder_custom.py:53-55)."""
    _run_oracle(ref_encoder_mod, "conv_module",
                shape=(41, 16, 16),
                channels=((8,), (16, 16), (16, 16), (16, 16)),
                paddings=((1,), (1, 1), (1, 1), ((0, 1, 1), 1)),
                capacities=(4096, 4096, 4096, 4096),
                seed=0)


def test_sparse_encoder_oracle_basicblock(ref_encoder_mod):
    """nuScenes/Waymo-style basicblock layout: residual SparseBasicBlocks
    with an end-of-stage strided downsample (sparse_encoder_custom.py:
    186-203)."""
    _run_oracle(ref_encoder_mod, "basicblock",
                shape=(11, 16, 16),
                channels=((8, 8, 16), (16, 16)),
                paddings=((1, 1, 1), (1, 1)),
                capacities=(4096, 4096),
                seed=1)
