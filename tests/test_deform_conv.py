"""Modulated deformable conv (DCNv2) — numeric oracle + init identity."""

import numpy as np
import jax
import jax.numpy as jnp

from srfdet3d_tpu.models.deform_conv import (ModulatedDeformConv,
                                             modulated_deform_conv)


def _np_mdconv(x, w, offset, mask, kernel=3, stride=1, padding=1):
    """Independent loop-based oracle: bilinear taps with zero OOB."""
    b, h, wd, c = x.shape
    kk = kernel * kernel
    ho, wo = offset.shape[1], offset.shape[2]
    cout = w.shape[1]
    out = np.zeros((b, ho, wo, cout), np.float64)
    for bi in range(b):
        for oy in range(ho):
            for ox in range(wo):
                taps = np.zeros((kk, c), np.float64)
                for t in range(kk):
                    ty, tx = divmod(t, kernel)
                    py = oy * stride - padding + ty + offset[bi, oy, ox, t, 0]
                    px = ox * stride - padding + tx + offset[bi, oy, ox, t, 1]
                    y0, x0 = int(np.floor(py)), int(np.floor(px))
                    ly, lx = py - y0, px - x0
                    acc = np.zeros(c, np.float64)
                    for dy, wy in ((0, 1 - ly), (1, ly)):
                        for dx, wx in ((0, 1 - lx), (1, lx)):
                            yy, xx = y0 + dy, x0 + dx
                            if 0 <= yy < h and 0 <= xx < wd:
                                acc += wy * wx * x[bi, yy, xx]
                    taps[t] = acc * mask[bi, oy, ox, t]
                out[bi, oy, ox] = taps.reshape(-1) @ w
    return out


def test_matches_loop_oracle():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 6, 7, 3)).astype(np.float32)
    w = rng.normal(size=(9 * 3, 4)).astype(np.float32)
    off = (rng.normal(size=(2, 6, 7, 9, 2)) * 1.5).astype(np.float32)
    m = rng.uniform(0, 1, (2, 6, 7, 9)).astype(np.float32)
    got = np.asarray(modulated_deform_conv(
        jnp.asarray(x), jnp.asarray(w), jnp.asarray(off), jnp.asarray(m)))
    want = _np_mdconv(x, w, off, m)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_matches_loop_oracle_stride2():
    rng = np.random.default_rng(1)
    x = rng.normal(size=(1, 8, 8, 2)).astype(np.float32)
    w = rng.normal(size=(9 * 2, 5)).astype(np.float32)
    ho = wo = (8 + 2 - 3) // 2 + 1
    off = (rng.normal(size=(1, ho, wo, 9, 2))).astype(np.float32)
    m = rng.uniform(0, 1, (1, ho, wo, 9)).astype(np.float32)
    got = np.asarray(modulated_deform_conv(
        jnp.asarray(x), jnp.asarray(w), jnp.asarray(off), jnp.asarray(m),
        stride=2))
    want = _np_mdconv(x, w, off, m, stride=2)
    assert got.shape == (1, ho, wo, 5)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_zero_init_is_half_conv():
    """mmcv init_offset zeroes the offset conv -> offsets 0, modulation
    sigmoid(0)=0.5: the module must equal 0.5 x a plain 3x3 conv with the
    same kernel."""
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(2, 5, 6, 3)).astype(np.float32))
    mod = ModulatedDeformConv(4)
    vars_ = mod.init(jax.random.PRNGKey(0), x)
    got = np.asarray(mod.apply(vars_, x))
    w = np.asarray(vars_["params"]["kernel"])     # (9*Cin, Cout)
    # plain conv via the same tap machinery with zero offsets, mask 1
    off = jnp.zeros((2, 5, 6, 9, 2), jnp.float32)
    m = jnp.ones((2, 5, 6, 9), jnp.float32)
    plain = np.asarray(modulated_deform_conv(
        x, jnp.asarray(w), off, m))
    np.testing.assert_allclose(got, 0.5 * plain, rtol=1e-5, atol=1e-6)
    # and the zero-offset tap machinery equals an actual XLA conv
    ref = jax.lax.conv_general_dilated(
        np.asarray(x), w.reshape(3, 3, 3, 4), (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    np.testing.assert_allclose(plain, np.asarray(ref), rtol=1e-4, atol=1e-4)


def test_gradients_finite():
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(1, 5, 5, 2)).astype(np.float32))
    mod = ModulatedDeformConv(3, stride=2)
    vars_ = mod.init(jax.random.PRNGKey(0), x)

    def loss(v, xx):
        return jnp.sum(mod.apply(v, xx) ** 2)

    gv, gx = jax.grad(loss, argnums=(0, 1))(vars_, x)
    for leaf in jax.tree_util.tree_leaves((gv, gx)):
        assert np.all(np.isfinite(np.asarray(leaf)))


def test_caffe_dcn_resnet_forward():
    """waymo_LC-style backbone: caffe stride placement + DCN stages 3-4."""
    from srfdet3d_tpu.models.resnet import ResNet
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.normal(size=(1, 64, 96, 3)).astype(np.float32))
    net = ResNet(50, style="caffe",
                 stage_with_dcn=(False, False, True, True))
    vars_ = jax.jit(lambda r, xx: net.init(r, xx))(jax.random.PRNGKey(0), x)
    outs = jax.jit(lambda v, xx: net.apply(v, xx))(vars_, x)
    assert tuple(o.shape for o in outs) == (
        (1, 16, 24, 256), (1, 8, 12, 512), (1, 4, 6, 1024), (1, 2, 3, 2048))
    # DCN layers exist exactly in stages 3-4
    p = vars_["params"]
    assert "dcn2" in p["layer3_0"] and "dcn2" in p["layer4_0"]
    assert "dcn2" not in p["layer1_0"] and "dcn2" not in p["layer2_0"]
    assert all(np.all(np.isfinite(np.asarray(o))) for o in outs)
