import jax
import jax.numpy as jnp
import numpy as np

from srfdet3d_tpu.ops.voxelize import VoxelizationSpec, voxelize_points
from srfdet3d_tpu.models.vfe import HardSimpleVFE, PillarFeatureNet, DynamicVFE

SPEC = VoxelizationSpec(
    voxel_size=(0.5, 0.5, 1.0),
    point_cloud_range=(0.0, 0.0, 0.0, 8.0, 8.0, 4.0),
    max_num_points=3,
    max_voxels=64,
)


def _numpy_voxelize(points, valid, spec):
    """Oracle: dict voxel-coord -> list of point indices (capped)."""
    vox = {}
    for i, (p, v) in enumerate(zip(points, valid)):
        if not v:
            continue
        ix = int(np.floor((p[0] - spec.point_cloud_range[0]) / spec.voxel_size[0]))
        iy = int(np.floor((p[1] - spec.point_cloud_range[1]) / spec.voxel_size[1]))
        iz = int(np.floor((p[2] - spec.point_cloud_range[2]) / spec.voxel_size[2]))
        nx, ny, nz = spec.grid_size
        if not (0 <= ix < nx and 0 <= iy < ny and 0 <= iz < nz):
            continue
        vox.setdefault((iz, iy, ix), []).append(i)
    if spec.max_num_points > 0:
        vox = {k: v[:spec.max_num_points] for k, v in vox.items()}
    return vox


def test_voxelize_matches_oracle():
    rng = np.random.RandomState(0)
    pts = rng.uniform(-1, 9, (128, 5)).astype(np.float32)
    valid = np.ones(128, bool)
    valid[100:] = False  # padding
    out = voxelize_points(jnp.array(pts), jnp.array(valid), SPEC)
    oracle = _numpy_voxelize(pts, valid, SPEC)

    vm = np.asarray(out.voxel_mask)
    vc = np.asarray(out.voxel_coords)
    pvi = np.asarray(out.point_voxel_idx)
    npts = np.asarray(out.num_points)

    got_coords = {tuple(vc[i]) for i in range(len(vm)) if vm[i]}
    assert got_coords == set(oracle.keys())

    slot_by_coord = {tuple(vc[i]): i for i in range(len(vm)) if vm[i]}
    for coord, members in oracle.items():
        s = slot_by_coord[coord]
        assert npts[s] == len(members)
        got_members = [i for i in range(128) if pvi[i] == s]
        assert sorted(got_members) == sorted(members)

    # all other points are invalid
    valid_pts = {i for members in oracle.values() for i in members}
    pm = np.asarray(out.point_mask)
    assert {i for i in range(128) if pm[i]} == valid_pts


def test_voxelize_capacity_overflow():
    spec = VoxelizationSpec(SPEC.voxel_size, SPEC.point_cloud_range,
                            max_num_points=-1, max_voxels=4)
    rng = np.random.RandomState(1)
    pts = rng.uniform(0.1, 7.9, (64, 4)).astype(np.float32)
    out = voxelize_points(jnp.array(pts), jnp.ones(64, bool), spec)
    assert np.asarray(out.voxel_mask).sum() == 4
    pvi = np.asarray(out.point_voxel_idx)
    assert (pvi <= 4).all()


def test_voxelize_jit_static():
    f = jax.jit(lambda p, m: voxelize_points(p, m, SPEC))
    pts = jnp.zeros((32, 4)) + 1.0
    out = f(pts, jnp.ones(32, bool))
    assert out.voxel_coords.shape == (64, 3)
    # all 32 points in one voxel, capped at 3
    assert int(out.voxel_mask.sum()) == 1
    assert int(out.point_mask.sum()) == 3
    assert int(out.num_points.max()) == 3


def test_hard_simple_vfe_mean():
    rng = np.random.RandomState(2)
    pts = rng.uniform(0.1, 7.9, (64, 5)).astype(np.float32)
    valid = np.ones(64, bool)
    spec = VoxelizationSpec(SPEC.voxel_size, SPEC.point_cloud_range,
                            max_num_points=10, max_voxels=64)
    vox = voxelize_points(jnp.array(pts), jnp.array(valid), spec)
    vfe = HardSimpleVFE(num_features=5)
    feats = vfe.apply({}, jnp.array(pts), vox, 64)
    oracle = _numpy_voxelize(pts, valid, spec)
    vc = np.asarray(vox.voxel_coords)
    vm = np.asarray(vox.voxel_mask)
    slot_by_coord = {tuple(vc[i]): i for i in range(64) if vm[i]}
    f = np.asarray(feats)
    for coord, members in oracle.items():
        s = slot_by_coord[coord]
        np.testing.assert_allclose(f[s], pts[members].mean(0), rtol=1e-5,
                                   atol=1e-5)


def test_pillar_feature_net_shapes():
    rng = np.random.RandomState(3)
    pts = rng.uniform(0.1, 7.9, (64, 4)).astype(np.float32)
    vox = voxelize_points(jnp.array(pts), jnp.ones(64, bool), SPEC)
    net = PillarFeatureNet(in_channels=4, feat_channels=(64,), spec=SPEC)
    params = net.init(jax.random.PRNGKey(0), jnp.array(pts), vox, 64,
                      train=False)
    out = net.apply(params, jnp.array(pts), vox, 64, train=False)
    assert out.shape == (64, 64)
    # empty voxel slots produce zeros after pooling of nothing
    vm = np.asarray(vox.voxel_mask)
    o = np.asarray(out)
    assert np.abs(o[~vm]).max() == 0.0


def test_dynamic_vfe_shapes_and_train():
    rng = np.random.RandomState(4)
    pts = rng.uniform(0.1, 7.9, (128, 5)).astype(np.float32)
    spec = VoxelizationSpec(SPEC.voxel_size, SPEC.point_cloud_range,
                            max_num_points=-1, max_voxels=64)
    vox = voxelize_points(jnp.array(pts), jnp.ones(128, bool), spec)
    net = DynamicVFE(in_channels=5, feat_channels=(64, 128), spec=spec)
    variables = net.init(jax.random.PRNGKey(0), jnp.array(pts), vox, 64,
                         train=True)
    out, updates = net.apply(variables, jnp.array(pts), vox, 64, train=True,
                             mutable=["batch_stats"])
    assert out.shape == (64, 128)
    assert "batch_stats" in updates
    assert np.isfinite(np.asarray(out)).all()


def test_batched_matches_vmapped():
    """Flat-batched voxelization == per-sample voxelization on every
    field, including capacity overflow and max_num_points capping."""
    from srfdet3d_tpu.ops.voxelize import voxelize_points_batched
    rng = np.random.RandomState(11)
    spec = VoxelizationSpec(voxel_size=(0.4, 0.4, 0.5),
                            point_cloud_range=(-4, -4, -2, 4, 4, 2),
                            max_num_points=3, max_voxels=32)
    b, p = 3, 256
    pts = rng.uniform(-5, 5, (b, p, 5)).astype(np.float32)
    valid = rng.rand(b, p) < 0.8
    got = voxelize_points_batched(jnp.asarray(pts), jnp.asarray(valid),
                                  spec)
    for i in range(b):
        ref = voxelize_points(jnp.asarray(pts[i]), jnp.asarray(valid[i]),
                              spec)
        np.testing.assert_array_equal(np.asarray(got.voxel_coords[i]),
                                      np.asarray(ref.voxel_coords))
        np.testing.assert_array_equal(np.asarray(got.voxel_mask[i]),
                                      np.asarray(ref.voxel_mask))
        np.testing.assert_array_equal(np.asarray(got.num_points[i]),
                                      np.asarray(ref.num_points))
        np.testing.assert_array_equal(np.asarray(got.point_voxel_idx[i]),
                                      np.asarray(ref.point_voxel_idx))
        np.testing.assert_array_equal(np.asarray(got.point_mask[i]),
                                      np.asarray(ref.point_mask))


def test_batched_dynamic_voxelize_matches():
    from srfdet3d_tpu.ops.voxelize import voxelize_points_batched
    rng = np.random.RandomState(12)
    spec = VoxelizationSpec(voxel_size=(0.4, 0.4, 0.5),
                            point_cloud_range=(-4, -4, -2, 4, 4, 2),
                            max_num_points=-1, max_voxels=64)
    b, p = 2, 200
    pts = rng.uniform(-4.5, 4.5, (b, p, 4)).astype(np.float32)
    valid = np.ones((b, p), bool)
    got = voxelize_points_batched(jnp.asarray(pts), jnp.asarray(valid),
                                  spec)
    for i in range(b):
        ref = voxelize_points(jnp.asarray(pts[i]), jnp.asarray(valid[i]),
                              spec)
        np.testing.assert_array_equal(np.asarray(got.point_voxel_idx[i]),
                                      np.asarray(ref.point_voxel_idx))
        np.testing.assert_array_equal(np.asarray(got.voxel_coords[i]),
                                      np.asarray(ref.voxel_coords))


def test_voxelizer_output_is_plan_major():
    """The batched voxelizer emits voxels PLAN-major ((y, x) major, z
    minor, invalid at the tail) — the sparse encoder's column invariant
    (SparseEncoder(presorted=True) / detector wiring depends on this; if
    the key order ever changes, presorted must be dropped)."""
    import numpy as np
    from srfdet3d_tpu.ops.voxelize import (VoxelizationSpec,
                                           voxelize_points_batched)
    rng = np.random.default_rng(7)
    spec = VoxelizationSpec(
        voxel_size=(0.5, 0.5, 0.25),
        point_cloud_range=(-8, -8, -2, 8, 8, 2),
        max_num_points=4, max_voxels=512)
    pts = rng.uniform(-9, 9, size=(2, 800, 4)).astype(np.float32)
    mask = rng.uniform(size=(2, 800)) < 0.9
    vox = voxelize_points_batched(jnp.asarray(pts), jnp.asarray(mask), spec)
    nx, ny, nz = spec.grid_size
    for b in range(2):
        c = np.asarray(vox.voxel_coords[b])
        m = np.asarray(vox.voxel_mask[b])
        n = int(m.sum())
        assert m[:n].all() and not m[n:].any()      # packed, tail invalid
        key = (c[:n, 1] * nx + c[:n, 2]) * nz + c[:n, 0]
        assert np.all(np.diff(key) > 0)             # strictly plan-major


def test_bitpack_passenger_matches_gather_fallback(monkeypatch):
    """The bit-packed coord sort passenger (round-5 predict win) must be
    bit-identical to the coords[order] gather fallback it replaced —
    both paths, single-sample and batched."""
    import srfdet3d_tpu.ops.voxelize as V
    rng = np.random.default_rng(11)
    spec = VoxelizationSpec(
        voxel_size=(0.25, 0.25, 0.25),
        point_cloud_range=(-8, -8, -2, 8, 8, 2),
        max_num_points=5, max_voxels=256)
    assert V._coord_bits(spec) is not None  # shipped grids take bitpack
    pts = rng.uniform(-9, 9, (2, 600, 4)).astype(np.float32)
    mask = rng.uniform(size=(2, 600)) < 0.85
    fast_b = V.voxelize_points_batched(jnp.asarray(pts),
                                       jnp.asarray(mask), spec)
    fast_s = V.voxelize_points(jnp.asarray(pts[0]), jnp.asarray(mask[0]),
                               spec)
    monkeypatch.setattr(V, "_coord_bits", lambda _spec: None)
    slow_b = V.voxelize_points_batched(jnp.asarray(pts),
                                       jnp.asarray(mask), spec)
    slow_s = V.voxelize_points(jnp.asarray(pts[0]), jnp.asarray(mask[0]),
                               spec)
    for fast, slow in ((fast_b, slow_b), (fast_s, slow_s)):
        for name in ("point_voxel_idx", "point_mask", "voxel_coords",
                     "voxel_mask", "num_points"):
            np.testing.assert_array_equal(
                np.asarray(getattr(fast, name)),
                np.asarray(getattr(slow, name)), err_msg=name)
