"""Bitmap-column rulebook backend (ops/bitmap_rulebook.py) tests.

Oracles: the dense-3D-cell-table backend (ops/sparse_conv.py, itself
oracle-tested against lax dense convs) and direct lax dense convs.
Replaces spconv rulebook construction (reference
sparse_encoder_custom.py:74-140 [dep spconv]).
"""
import jax
import jax.lax as lax
import jax.numpy as jnp
import numpy as np
import pytest

from srfdet3d_tpu.ops.bitmap_rulebook import (
    build_columns, convout_rulebook_bitmap, convout_sites_bitmap,
    decimate_bits, sort_plan_major, strided_rulebook_bitmap,
    strided_sites_bitmap, subm_rulebook_bitmap)
from srfdet3d_tpu.ops.sparse_conv import (
    make_key_table, sparse_to_dense_batched, subm_gather_indices_batched)
from srfdet3d_tpu.models.sparse_encoder import SparseEncoder

SHAPE = (25, 16, 16)  # depth chain 25 -> 13 -> 7 -> 3 -> convout 1
B, V, C = 2, 128, 4


def _random_batch(counts=(90, 70), seed=0):
    rng = np.random.RandomState(seed)
    d, h, w = SHAPE
    coords, masks = [], []
    for i, n in enumerate(counts):
        r = np.random.RandomState(seed + 1 + i)
        lin = np.sort(r.choice(d * h * w, size=n, replace=False))
        c = np.stack([lin // (h * w), (lin // w) % h, lin % w],
                     -1).astype(np.int32)
        c = np.concatenate([c, np.zeros((V - n, 3), np.int32)], 0)
        coords.append(c)
        masks.append(np.arange(V) < n)
    feats = rng.randn(len(counts), V, C).astype(np.float32)
    return (jnp.array(feats), jnp.array(np.stack(coords)),
            jnp.array(np.stack(masks)))


def _columns(seed=0):
    feats, coords, mask = _random_batch(seed=seed)
    f2, c2, m2 = sort_plan_major(feats, coords, mask, SHAPE)
    cs, vcol, vz = build_columns(c2, m2, SHAPE)
    return f2, c2, m2, cs, vcol, vz


def _site_coords(cs, vcol, vz):
    b, m = vcol.shape
    ccflat = jnp.concatenate(
        [cs.ccoords.reshape(-1, 2), jnp.zeros((1, 2), jnp.int32)], 0)
    yx = ccflat[vcol.reshape(-1)].reshape(b, m, 2)
    return jnp.concatenate([vz[..., None], yx], -1)


def _occ(coords, mask, shape):
    b, m = mask.shape
    # masked rows carry placeholder coords (0,0,0); route them out of
    # range so mode="drop" discards them instead of stomping real sites
    z = jnp.where(mask, coords[..., 0], shape[0])
    return jnp.zeros((b,) + shape, bool).at[
        jnp.repeat(jnp.arange(b), m), z.reshape(-1),
        coords[..., 1].reshape(-1), coords[..., 2].reshape(-1)].set(
        True, mode="drop")


def _dense_conv(x, w_kcio, kernel, stride, pad):
    kz, ky, kx = kernel
    w = w_kcio.reshape(kz, ky, kx, w_kcio.shape[1], w_kcio.shape[2])
    return lax.conv_general_dilated(
        x, w, stride, [(pad[0], pad[0]), (pad[1], pad[1]),
                       (pad[2], pad[2])],
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))


def test_decimate_bits_matches_bruteforce():
    rng = np.random.RandomState(3)
    for pz in (0, 1):
        for d in (5, 31, 41, 63 - pz):
            zout = (d + 2 * pz - 3) // 2 + 1
            bits = rng.randint(0, 2, size=(16, d)).astype(bool)
            full = np.zeros((16, 64), bool)
            full[:, :d] = bits
            lo = jnp.array(sum(full[:, i].astype(np.uint64) << i
                               for i in range(32)).astype(np.uint32))
            hi = jnp.array(sum(full[:, i + 32].astype(np.uint64) << i
                               for i in range(32)).astype(np.uint32))
            out = np.asarray(decimate_bits(lo, hi, pz, zout))
            for oz in range(min(zout, 32)):
                want = any(
                    0 <= 2 * oz - pz + dz < d and full[r, 2 * oz - pz + dz]
                    for dz in range(3) for r in [None]) if False else None
            want_mat = np.zeros((16, zout), bool)
            for oz in range(zout):
                for dz in range(3):
                    z = 2 * oz - pz + dz
                    if 0 <= z < d:
                        want_mat[:, oz] |= full[:, z]
            got = np.stack([(out >> np.uint32(oz)) & 1 for oz in
                            range(zout)], -1).astype(bool)
            np.testing.assert_array_equal(got, want_mat)


def test_subm_rulebook_matches_table_backend():
    _, c2, m2, cs, vcol, vz = _columns(seed=0)
    got = subm_rulebook_bitmap(cs, vcol, vz, m2)
    want = subm_gather_indices_batched(
        c2, m2, SHAPE, 3, key_table=make_key_table(c2, m2, SHAPE))
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_plan_neighbor_methods_agree():
    """The bordered-2D-slice plan table must return the same 9 neighbor
    slots as the general 1D 3-slice table, including at grid borders and
    for both subm (base = coord - 1) and strided (base = 2*coord - pad)
    query geometries."""
    from srfdet3d_tpu.ops import bitmap_rulebook as br
    _, c2, m2, cs, vcol, vz = _columns(seed=3)
    b, p, _ = cs.ccoords.shape
    queries = [
        (cs.ccoords[..., 0] - 1, cs.ccoords[..., 1] - 1, cs.cmask, (1, 1)),
        (2 * cs.ccoords[..., 0], 2 * cs.ccoords[..., 1], cs.cmask, (0, 0)),
    ]
    for ybase, xbase, qmask, pads in queries:
        # strided bases query the OUTPUT grid of a downsample; clip to the
        # contract's valid base range for the input grid being tested
        ybase = jnp.clip(ybase, -1, cs.shape[1] - 2)
        xbase = jnp.clip(xbase, -1, cs.shape[2] - 2)
        a = br.plan_neighbors9_2d(br.plan_table2d(cs), ybase, xbase,
                                  qmask, cs.shape[1:], b, p)
        c = br.plan_neighbors9(br.plan_table(cs), ybase, xbase, qmask,
                               cs.shape[1:], b, p)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(c))


def test_strided_bitmap_matches_dense_conv():
    f2, c2, m2, cs, vcol, vz = _columns(seed=5)
    rng = np.random.RandomState(6)
    w27 = jnp.array(rng.randn(27, C, 6).astype(np.float32) * 0.1)
    pad, cap = (1, 1, 1), 1024
    cs_o, vcol_o, vz_o, vm_o = strided_sites_bitmap(cs, pad, cap)
    gidx = strided_rulebook_bitmap(cs, cs_o, vcol_o, vz_o, vm_o, pad)
    fflat = jnp.concatenate([f2.reshape(-1, C), jnp.zeros((1, C))], 0)
    g = fflat[gidx.reshape(-1)].reshape(B, cap, 27 * C)
    out = jnp.where(vm_o[..., None], g @ w27.reshape(27 * C, 6), 0.0)

    oc = _site_coords(cs_o, vcol_o, vz_o)
    d, h, w = SHAPE
    oshape = ((d + 2 - 3) // 2 + 1, (h + 2 - 3) // 2 + 1,
              (w + 2 - 3) // 2 + 1)
    got = sparse_to_dense_batched(out, oc, vm_o, oshape)
    ref = _dense_conv(sparse_to_dense_batched(f2, c2, m2, SHAPE), w27,
                      (3, 3, 3), (2, 2, 2), pad)
    occ = _occ(oc, vm_o, oshape)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(jnp.where(occ[..., None], ref, 0.0)),
        rtol=1e-4, atol=1e-5)
    # site-set completeness vs receptive-field oracle
    reach = _dense_conv(
        sparse_to_dense_batched(jnp.ones_like(f2[..., :1]), c2, m2, SHAPE),
        jnp.ones((27, 1, 1)), (3, 3, 3), (2, 2, 2), pad)[..., 0] > 0
    np.testing.assert_array_equal(np.asarray(occ), np.asarray(reach))


def test_convout_bitmap_matches_dense_conv():
    f2, c2, m2, cs, vcol, vz = _columns(seed=9)
    rng = np.random.RandomState(10)
    pad, cap = (1, 1, 1), 1024
    cs_o, vcol_o, vz_o, vm_o = strided_sites_bitmap(cs, pad, cap)
    gidx = strided_rulebook_bitmap(cs, cs_o, vcol_o, vz_o, vm_o, pad)
    w27 = jnp.array(rng.randn(27, C, 6).astype(np.float32) * 0.1)
    fflat = jnp.concatenate([f2.reshape(-1, C), jnp.zeros((1, C))], 0)
    g = fflat[gidx.reshape(-1)].reshape(B, cap, 27 * C)
    mid = jnp.where(vm_o[..., None], g @ w27.reshape(27 * C, 6), 0.0)
    d, h, w = SHAPE
    mshape = ((d + 2 - 3) // 2 + 1, (h + 2 - 3) // 2 + 1,
              (w + 2 - 3) // 2 + 1)

    w3 = jnp.array(rng.randn(3, 6, 8).astype(np.float32) * 0.1)
    cs2, vcol2, vz2, vm2 = convout_sites_bitmap(cs_o, cap)
    g3 = convout_rulebook_bitmap(cs_o, vcol2, vz2, vm2)
    mflat = jnp.concatenate([mid.reshape(-1, 6), jnp.zeros((1, 6))], 0)
    gg = mflat[g3.reshape(-1)].reshape(B, cap, 3 * 6)
    out2 = jnp.where(vm2[..., None], gg @ w3.reshape(18, 8), 0.0)

    oc_m = _site_coords(cs_o, vcol_o, vz_o)
    occ_m = _occ(oc_m, vm_o, mshape)
    dense_mid = sparse_to_dense_batched(mid, oc_m, vm_o, mshape)
    oc2 = _site_coords(cs2, vcol2, vz2)
    oshape2 = ((mshape[0] - 3) // 2 + 1,) + mshape[1:]
    got2 = sparse_to_dense_batched(out2, oc2, vm2, oshape2)
    ref2 = _dense_conv(dense_mid, w3.reshape(3, 1, 1, 6, 8)[..., 0, :, :]
                       .reshape(3, 6, 8), (3, 1, 1), (2, 1, 1), (0, 0, 0))
    occ2 = _occ(oc2, vm2, oshape2)
    np.testing.assert_allclose(
        np.asarray(got2), np.asarray(jnp.where(occ2[..., None], ref2, 0.0)),
        rtol=1e-4, atol=1e-5)
    reach2 = _dense_conv(occ_m[..., None].astype(jnp.float32),
                         jnp.ones((3, 1, 1)), (3, 1, 1), (2, 1, 1),
                         (0, 0, 0))[..., 0] > 0
    np.testing.assert_array_equal(np.asarray(occ2), np.asarray(reach2))


def _encoder(block_type, rulebook):
    if block_type == "basicblock":
        return SparseEncoder(
            in_channels=C, sparse_shape=SHAPE, base_channels=16,
            output_channels=32,
            encoder_channels=((16, 16, 32), (32, 32, 64), (64, 64, 128),
                              (128, 128)),
            encoder_paddings=((0, 0, 1), (0, 0, 1), (0, 0, (0, 1, 1)),
                              (0, 0)),
            block_type="basicblock", capacities=(512, 512, 512, 512),
            rulebook=rulebook)
    return SparseEncoder(
        in_channels=C, sparse_shape=SHAPE, base_channels=16,
        output_channels=32,
        encoder_channels=((16,), (32, 32, 32), (64, 64, 64), (64, 64, 64)),
        encoder_paddings=((1,), (1, 1, 1), (1, 1, 1), ((0, 1, 1), 1, 1)),
        block_type="conv_module", capacities=(512, 512, 512, 512),
        rulebook=rulebook)


def test_encoder_bitmap_matches_table_backend():
    feats, coords, mask = _random_batch(seed=12)
    for block_type in ("basicblock", "conv_module"):
        enc_t = _encoder(block_type, "table")
        enc_b = _encoder(block_type, "bitmap")
        variables = jax.jit(lambda r, f, c, m, e=enc_t: e.init(
            r, f, c, m, train=False))(
            jax.random.PRNGKey(0), feats, coords, mask)
        out_t = jax.jit(lambda v, f, c, m, e=enc_t: e.apply(
            v, f, c, m, train=False))(variables, feats, coords, mask)
        out_b = jax.jit(lambda v, f, c, m, e=enc_b: e.apply(
            v, f, c, m, train=False))(variables, feats, coords, mask)
        assert out_t.shape == out_b.shape
        np.testing.assert_allclose(np.asarray(out_b), np.asarray(out_t),
                                   rtol=1e-4, atol=1e-4)


def test_encoder_bitmap_grads_match_table_backend():
    feats, coords, mask = _random_batch(seed=17)
    enc_t = _encoder("basicblock", "table")
    enc_b = _encoder("basicblock", "bitmap")
    variables = jax.jit(lambda r, f, c, m: enc_t.init(
        r, f, c, m, train=False))(
        jax.random.PRNGKey(1), feats, coords, mask)

    def loss(params, enc):
        out = enc.apply({"params": params, **{k: v for k, v in
                                              variables.items()
                                              if k != "params"}},
                        feats, coords, mask, train=False)
        return jnp.sum(out ** 2)

    gt = jax.jit(jax.grad(lambda p: loss(p, enc_t)))(variables["params"])
    gb = jax.jit(jax.grad(lambda p: loss(p, enc_b)))(variables["params"])
    flat_t = jax.tree_util.tree_leaves(gt)
    flat_b = jax.tree_util.tree_leaves(gb)
    for a, b_ in zip(flat_t, flat_b):
        np.testing.assert_allclose(np.asarray(b_), np.asarray(a),
                                   rtol=1e-3, atol=1e-3)


def test_encoder_unsupported_depth_falls_back():
    # D=5 chain goes to depth 0 -> bitmap unsupported -> table backend
    rng = np.random.RandomState(20)
    shape = (5, 8, 8)
    n, v = 40, 64
    lin = np.sort(rng.choice(np.prod(shape), size=n, replace=False))
    c = np.stack([lin // 64, (lin // 8) % 8, lin % 8], -1).astype(np.int32)
    c = np.concatenate([c, np.zeros((v - n, 3), np.int32)], 0)
    coords = jnp.array(c)[None]
    mask = jnp.array(np.arange(v) < n)[None]
    feats = jnp.array(rng.randn(1, v, 5).astype(np.float32))
    enc = SparseEncoder(
        in_channels=5, sparse_shape=shape, base_channels=16,
        output_channels=32,
        encoder_channels=((16, 16, 32), (32, 32, 64), (64, 64, 128),
                          (128, 128)),
        encoder_paddings=((0, 0, 1), (0, 0, 1), (0, 0, (0, 1, 1)), (0, 0)),
        block_type="basicblock", capacities=(64, 64, 64, 64),
        rulebook="bitmap")
    variables = jax.jit(lambda r, f, c, m: enc.init(
        r, f, c, m, train=False))(
        jax.random.PRNGKey(0), feats, coords, mask)
    out = jax.jit(lambda v, f, c, m: enc.apply(
        v, f, c, m, train=False))(variables, feats, coords, mask)
    assert np.isfinite(np.asarray(out)).all()


def test_strided_bitmap_capacity_overflow_stays_masked():
    _, _, _, cs, _, _ = _columns(seed=22)
    cap = 64  # way below the ~400 true sites
    cs_o, vcol_o, vz_o, vm_o = strided_sites_bitmap(cs, (1, 1, 1), cap)
    assert vm_o.shape == (B, cap)
    assert int(vm_o.sum()) <= B * cap
    gidx = strided_rulebook_bitmap(cs, cs_o, vcol_o, vz_o, vm_o, (1, 1, 1))
    assert int(jnp.max(gidx)) <= B * cs.row_cap
    assert int(jnp.min(gidx)) >= 0


def test_strided_no_phantom_zero_site_columns():
    """An input column whose only voxel's output taps clip past the output
    depth (e.g. z=9 at d=10, pad 0 -> oz=4 >= od=4) must not emit output
    columns: every cmask column has >= 1 site, so '#columns <= #sites'
    holds exactly and tight caps aren't wasted on phantoms."""
    shape = (10, 8, 8)
    coords = jnp.asarray(np.array(
        [[[9, 3, 3], [2, 5, 5]]], np.int32))       # z=9 clips; z=2 real
    vmask = jnp.asarray(np.array([[True, True]]))
    feats = jnp.zeros((1, 2, 4))
    sf, sc, sm = sort_plan_major(feats, coords, vmask, shape)
    cs, vcol, vz = build_columns(sc, sm, shape)
    cs_o, vcol_o, vz_o, vm_o = strided_sites_bitmap(cs, (0, 1, 1), 64)
    counts = np.asarray(jax.lax.population_count(cs_o.lo))
    cm = np.asarray(cs_o.cmask)
    assert np.all(counts[cm] >= 1), "phantom zero-site output column"
    # the z=2 voxel (oz in {0,1}) still produces its sites
    assert int(vm_o.sum()) > 0


@pytest.mark.slow
def test_strided_bitmap_fuzz_shapes_and_pads():
    """Randomized shapes, paddings and occupancies: the bitmap strided
    conv must equal a dense lax conv masked to the active output sites
    (spconv semantics) for every draw."""
    rng = np.random.RandomState(7)
    for trial in range(9):
        d = int(rng.randint(5, 42))
        if trial < 6:
            h = int(rng.randint(5, 20))
            w = int(rng.randint(5, 20))
        else:
            # multi-word plan widths: the bitmap site generation shifts
            # bits ACROSS word boundaries and masks the tail word — cover
            # w > 64 incl. exact word multiples
            h = int(rng.randint(5, 40))
            w = int(rng.choice([63, 64, 65, 70, 96, 97, 130]))
        pad = tuple(int(p) for p in rng.randint(0, 2, size=3))
        od = (d + 2 * pad[0] - 3) // 2 + 1
        if od <= 0 or od > 32 or (h + 2 * pad[1] - 3) // 2 + 1 <= 0 \
                or (w + 2 * pad[2] - 3) // 2 + 1 <= 0:
            continue
        shape = (d, h, w)
        n = int(rng.randint(1, min(100, d * h * w)))
        lin = np.sort(rng.choice(d * h * w, size=n, replace=False))
        c = np.stack([lin // (h * w), (lin // w) % h, lin % w],
                     -1).astype(np.int32)
        v_cap = 128
        coords = np.zeros((1, v_cap, 3), np.int32)
        coords[0, :n] = c
        mask = np.zeros((1, v_cap), bool)
        mask[0, :n] = True
        feats = rng.randn(1, v_cap, 3).astype(np.float32)
        feats[~mask] = 0.0

        f2, c2, m2 = sort_plan_major(jnp.array(feats), jnp.array(coords),
                                     jnp.array(mask), shape)
        cs, vcol, vz = build_columns(c2, m2, shape)
        cap = 256
        cs_o, vcol_o, vz_o, vm_o = strided_sites_bitmap(cs, pad, cap)
        gidx = strided_rulebook_bitmap(cs, cs_o, vcol_o, vz_o, vm_o, pad)
        wk = rng.randn(27, 3, 2).astype(np.float32)
        from srfdet3d_tpu.ops.sparse_conv import \
            gathered_conv_apply_batched
        out = gathered_conv_apply_batched(f2, gidx, jnp.array(wk))
        out = jnp.where(vm_o[..., None], out, 0.0)
        site_coords = _site_coords(cs_o, vcol_o, vz_o)
        dense_out = sparse_to_dense_batched(out, site_coords, vm_o,
                                            cs_o.shape)

        x = sparse_to_dense_batched(f2, c2, m2, shape)
        want = _dense_conv(x, jnp.array(wk), (3, 3, 3), (2, 2, 2), pad)
        site_occ = _dense_conv(
            _occ(c2, m2, shape)[..., None].astype(jnp.float32),
            jnp.ones((27, 1, 1)), (3, 3, 3), (2, 2, 2), pad)[..., 0] > 0
        want = jnp.where(site_occ[..., None], want, 0.0)
        np.testing.assert_allclose(
            np.asarray(dense_out), np.asarray(want), rtol=1e-4, atol=1e-4,
            err_msg=f"trial {trial}: shape={shape} pad={pad} n={n}")


def test_sites_methods_agree():
    """SITES_METHOD='bitmap' (plan dilate-decimate) and 'candidates'
    (candidate-cell scatter) must emit IDENTICAL output columns — same
    plan-major order, same masks, same z bitmaps — including multi-word
    plan widths and capacity overflow (both drop the highest plan keys)."""
    from srfdet3d_tpu.ops import bitmap_rulebook as br
    rng = np.random.RandomState(11)
    for trial in range(5):
        d = int(rng.randint(5, 42))
        h = int(rng.randint(5, 40))
        w = int(rng.choice([9, 17, 63, 64, 65, 96, 130]))
        pad = tuple(int(p) for p in rng.randint(0, 2, size=3))
        od = (d + 2 * pad[0] - 3) // 2 + 1
        if od <= 0 or od > 32 or (h + 2 * pad[1] - 3) // 2 + 1 <= 0 \
                or (w + 2 * pad[2] - 3) // 2 + 1 <= 0:
            continue
        shape = (d, h, w)
        n = int(rng.randint(1, min(110, d * h * w)))
        lin = np.sort(rng.choice(d * h * w, size=n, replace=False))
        c = np.stack([lin // (h * w), (lin // w) % h, lin % w],
                     -1).astype(np.int32)
        v_cap = 128
        coords = np.zeros((1, v_cap, 3), np.int32)
        coords[0, :n] = c
        mask = np.zeros((1, v_cap), bool)
        mask[0, :n] = True
        _, c2, m2 = sort_plan_major(
            jnp.zeros((1, v_cap, 1)), jnp.array(coords), jnp.array(mask),
            shape)
        cs, vcol, vz = build_columns(c2, m2, shape)
        # cap 16 on one draw exercises the overflow-drop parity
        cap = 16 if trial == 3 else 256
        outs = {}
        prev = br.SITES_METHOD
        try:
            for meth in ("candidates", "bitmap"):
                br.SITES_METHOD = meth
                outs[meth] = strided_sites_bitmap(cs, pad, cap)
        finally:
            br.SITES_METHOD = prev
        for a, b_ in zip(outs["candidates"], outs["bitmap"]):
            if hasattr(a, "ccoords"):
                np.testing.assert_array_equal(np.asarray(a.ccoords),
                                              np.asarray(b_.ccoords))
                np.testing.assert_array_equal(np.asarray(a.cmask),
                                              np.asarray(b_.cmask))
                np.testing.assert_array_equal(np.asarray(a.lo),
                                              np.asarray(b_.lo))
            else:
                np.testing.assert_array_equal(np.asarray(a), np.asarray(b_))
