import jax
import jax.numpy as jnp
import numpy as np

from srfdet3d_tpu.ops.sparse_conv import (
    SparseTensor, subm_conv3d, sparse_conv3d, generate_output_sites,
    conv_out_shape, sparse_to_dense)
from srfdet3d_tpu.models.sparse_encoder import SparseEncoder
from srfdet3d_tpu.models.middle import PointPillarsScatter
from srfdet3d_tpu.models.second import SECOND
from srfdet3d_tpu.models.fpn import FPN

SHAPE = (5, 8, 8)  # (D, H, W)


def _random_sparse(n_active, v_cap, cin, seed=0):
    rng = np.random.RandomState(seed)
    d, h, w = SHAPE
    lin = rng.choice(d * h * w, size=n_active, replace=False)
    lin = np.sort(lin)
    coords = np.stack([lin // (h * w), (lin // w) % h, lin % w], -1)
    feats = rng.randn(n_active, cin).astype(np.float32)
    pad = v_cap - n_active
    coords = np.concatenate([coords, np.zeros((pad, 3), np.int64)], 0)
    feats_p = np.concatenate([feats, np.zeros((pad, cin), np.float32)], 0)
    mask = np.arange(v_cap) < n_active
    return SparseTensor(jnp.array(feats_p), jnp.array(coords, jnp.int32),
                        jnp.array(mask), SHAPE)


def _dense(st):
    return np.asarray(sparse_to_dense(st))  # (D, H, W, C)


def _dense_conv(x, w_kcio, kernel, stride, pad):
    """Oracle dense conv via lax: x (D,H,W,C), w (K,Cin,Cout) z-major."""
    kz, ky, kx = kernel
    w = jnp.asarray(w_kcio).reshape(kz, ky, kx, w_kcio.shape[1],
                                    w_kcio.shape[2])
    out = jax.lax.conv_general_dilated(
        jnp.asarray(x)[None], w, window_strides=stride,
        padding=[(pad[0], pad[0]), (pad[1], pad[1]), (pad[2], pad[2])],
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
    return np.asarray(out[0])


def test_subm_conv_matches_dense_at_active_sites():
    st = _random_sparse(n_active=40, v_cap=64, cin=4, seed=0)
    rng = np.random.RandomState(1)
    w = rng.randn(27, 4, 6).astype(np.float32) * 0.1
    out = subm_conv3d(st, jnp.array(w))
    dense_in = _dense(st)
    dense_out = _dense_conv(dense_in, w, (3, 3, 3), (1, 1, 1), (1, 1, 1))
    got = _dense(out)
    mask3d = _dense(st.replace(features=jnp.ones_like(st.features[:, :1])))
    active = mask3d[..., 0] > 0
    np.testing.assert_allclose(got[active], dense_out[active], rtol=1e-4,
                               atol=1e-4)
    # inactive sites stay empty (submanifold property)
    assert np.abs(got[~active]).max() == 0.0


def test_strided_conv_matches_dense():
    st = _random_sparse(n_active=30, v_cap=64, cin=4, seed=2)
    rng = np.random.RandomState(3)
    w = rng.randn(27, 4, 5).astype(np.float32) * 0.1
    kernel, stride, pad = (3, 3, 3), (2, 2, 2), (1, 1, 1)
    out = sparse_conv3d(st, jnp.array(w), kernel, stride, pad,
                        out_capacity=128)
    assert out.shape == conv_out_shape(SHAPE, kernel, stride, pad)
    dense_out = _dense_conv(_dense(st), w, kernel, stride, pad)
    got = _dense(out)
    np.testing.assert_allclose(got, dense_out, rtol=1e-4, atol=1e-4)


def test_strided_conv_zpad0():
    st = _random_sparse(n_active=25, v_cap=64, cin=3, seed=4)
    rng = np.random.RandomState(5)
    w = rng.randn(27, 3, 4).astype(np.float32) * 0.1
    kernel, stride, pad = (3, 3, 3), (2, 2, 2), (0, 1, 1)
    out = sparse_conv3d(st, jnp.array(w), kernel, stride, pad,
                        out_capacity=128)
    dense_out = _dense_conv(_dense(st), w, kernel, stride, pad)
    np.testing.assert_allclose(_dense(out), dense_out, rtol=1e-4, atol=1e-4)


def test_conv_out_k311():
    st = _random_sparse(n_active=20, v_cap=32, cin=4, seed=6)
    rng = np.random.RandomState(7)
    w = rng.randn(3, 4, 8).astype(np.float32) * 0.1
    kernel, stride, pad = (3, 1, 1), (2, 1, 1), (0, 0, 0)
    out = sparse_conv3d(st, jnp.array(w), kernel, stride, pad,
                        out_capacity=64)
    dense_out = _dense_conv(_dense(st), w, kernel, stride, pad)
    np.testing.assert_allclose(_dense(out), dense_out, rtol=1e-4, atol=1e-4)


def test_output_sites_cover_receptive_field():
    st = _random_sparse(n_active=15, v_cap=32, cin=1, seed=8)
    kernel, stride, pad = (3, 3, 3), (2, 2, 2), (1, 1, 1)
    oc, om = generate_output_sites(st, kernel, stride, pad, out_capacity=128)
    # oracle: occupancy conv with all-ones kernel > 0
    occ = _dense(st.replace(features=jnp.ones_like(st.features[:, :1])))
    reach = _dense_conv(occ, np.ones((27, 1, 1), np.float32), kernel, stride,
                        pad)[..., 0] > 0
    oc, om = np.asarray(oc), np.asarray(om)
    got = {tuple(oc[i]) for i in range(len(om)) if om[i]}
    want = {tuple(c) for c in np.argwhere(reach)}
    assert got == want


def test_sparse_encoder_basicblock_end_to_end():
    b, v = 2, 64
    rng = np.random.RandomState(9)
    sts = [_random_sparse(40, v, 5, seed=10 + i) for i in range(b)]
    feats = jnp.stack([s.features for s in sts])
    coords = jnp.stack([s.coords for s in sts])
    mask = jnp.stack([s.mask for s in sts])
    enc = SparseEncoder(
        in_channels=5, sparse_shape=SHAPE, base_channels=16,
        output_channels=32,
        encoder_channels=((16, 16, 32), (32, 32, 64), (64, 64, 128),
                          (128, 128)),
        encoder_paddings=((0, 0, 1), (0, 0, 1), (0, 0, (0, 1, 1)), (0, 0)),
        block_type="basicblock", capacities=(64, 64, 64, 64))
    variables = jax.jit(lambda r, f, c, m: enc.init(
        r, f, c, m, train=False))(
        jax.random.PRNGKey(0), feats, coords, mask)
    out = jax.jit(lambda vv, f, c, m: enc.apply(
        vv, f, c, m, train=False))(variables, feats, coords, mask)
    # D: 5 -> 3 -> 2 -> 1(pad0: (2-3+2)/2+1 = 0? -> computed by conv arith)
    assert out.ndim == 4 and out.shape[0] == b
    assert np.isfinite(np.asarray(out)).all()


def test_sparse_encoder_conv_module_kitti_layout():
    b, v = 1, 64
    sts = [_random_sparse(40, v, 4, seed=20)]
    feats = jnp.stack([s.features for s in sts])
    coords = jnp.stack([s.coords for s in sts])
    mask = jnp.stack([s.mask for s in sts])
    shape = (9, 16, 16)
    st0 = sts[0].replace(coords=jnp.minimum(sts[0].coords,
                                            jnp.array([8, 15, 15])))
    enc = SparseEncoder(
        in_channels=4, sparse_shape=shape, block_type="conv_module",
        capacities=(64, 64, 64, 64), output_channels=16)
    variables = jax.jit(lambda r, f, c, m: enc.init(
        r, f, c, m, train=False))(
        jax.random.PRNGKey(0), feats, st0.coords[None], mask)
    out = jax.jit(lambda vv, f, c, m: enc.apply(
        vv, f, c, m, train=False))(variables, feats, st0.coords[None], mask)
    assert out.shape[0] == 1 and np.isfinite(np.asarray(out)).all()


def test_pillar_scatter():
    feats = jnp.array([[1.0, 2.0], [3.0, 4.0], [9.0, 9.0]])
    coords = jnp.array([[0, 1, 2], [0, 3, 0], [0, 0, 0]], jnp.int32)
    mask = jnp.array([True, True, False])
    canvas = PointPillarsScatter(output_shape=(4, 4)).apply(
        {}, feats, coords, mask)
    assert canvas.shape == (4, 4, 2)
    np.testing.assert_allclose(np.asarray(canvas[1, 2]), [1.0, 2.0])
    np.testing.assert_allclose(np.asarray(canvas[3, 0]), [3.0, 4.0])
    assert np.asarray(canvas[0, 0]).max() == 0.0  # masked slot dropped


def test_second_fpn_shapes():
    x = jnp.zeros((2, 64, 64, 32))
    second = SECOND(out_channels=(64, 128), layer_nums=(2, 2),
                    layer_strides=(1, 2))
    v = second.init(jax.random.PRNGKey(0), x, train=False)
    outs = second.apply(v, x, train=False)
    assert outs[0].shape == (2, 64, 64, 64)
    assert outs[1].shape == (2, 32, 32, 128)

    fpn = FPN(out_channels=64, num_outs=4, use_norm=True, use_act=True)
    vf = fpn.init(jax.random.PRNGKey(0), outs, train=False)
    fouts = fpn.apply(vf, outs, train=False)
    assert len(fouts) == 4
    assert fouts[0].shape == (2, 64, 64, 64)
    assert fouts[1].shape == (2, 32, 32, 64)
    assert fouts[2].shape == (2, 16, 16, 64)
    assert fouts[3].shape == (2, 8, 8, 64)


def test_subm_symmetric_bwd_matches_generic():
    """The subm backward's symmetry identities (sparse_conv.SUBM_BWD=sym):
      dfeats = onehot_fwd(g, idx, flip(W).swap)   [gather of g, same idx]
      dW     = flip_j(feats^T @ g[idx[:, j]])
    must reproduce plain-autodiff gradients of the XLA gather forward on
    REAL subm rulebooks (both backends; misses + padded rows included),
    through the real kernel code path (interpret mode — the symmetric
    dfeats runs the FORWARD one-hot kernel on flipped/transposed weights,
    window layout and corrections included).  Rests on
      idx[m, j] = r  <=>  idx[r, K-1-j] = m
    which holds because both backends enumerate offsets z-major
    lexicographically (offset K-1-j is the negation of offset j)."""
    import srfdet3d_tpu.ops.sparse_conv as sc
    from srfdet3d_tpu.ops.bitmap_rulebook import (build_columns,
                                                  sort_plan_major,
                                                  subm_rulebook_bitmap)

    rng = np.random.RandomState(3)
    st = _random_sparse(40, 64, 5, seed=3)
    cin, cout, k = 5, 7, 27
    w = jnp.asarray(rng.randn(k, cin, cout).astype(np.float32) * 0.1)
    g = jnp.asarray(rng.randn(64, cout).astype(np.float32))

    from srfdet3d_tpu.ops.sparse_conv import subm_gather_indices_batched
    idx_table = np.asarray(subm_gather_indices_batched(
        st.coords[None], st.mask[None], SHAPE, 3)).reshape(64, k)
    # the bitmap backend requires plan-major-sorted rows (encoder entry)
    _, pc, pm = sort_plan_major(st.features[None], st.coords[None],
                                st.mask[None], SHAPE)
    cs, vcol, vz = build_columns(pc, pm, SHAPE)
    idx_bitmap = np.asarray(subm_rulebook_bitmap(
        cs, vcol, vz, pm)).reshape(64, k)

    prev = sc.ONEHOT_INTERPRET
    sc.ONEHOT_INTERPRET = True
    try:
        for name, idx in (("table", idx_table), ("bitmap", idx_bitmap)):
            idxj = jnp.asarray(idx.astype(np.int32))

            def xla_fwd(fe, we):
                f0 = jnp.concatenate([fe, jnp.zeros((1, cin))], axis=0)
                return jnp.einsum("mkc,kcd->md", f0[idxj], we)

            ref = jax.grad(lambda fe, we: jnp.sum(xla_fwd(fe, we) * g),
                           argnums=(0, 1))(st.features, w)
            got = jax.grad(
                lambda fe, we: jnp.sum(
                    sc._onehot_conv_subm(fe, idxj, we) * g),
                argnums=(0, 1))(st.features, w)
            for a, b, what in zip(ref, got, ("dfeats", "dW")):
                np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                           rtol=1e-3, atol=1e-3,
                                           err_msg=f"{name} {what}")
    finally:
        sc.ONEHOT_INTERPRET = prev
