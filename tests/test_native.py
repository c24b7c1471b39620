"""Native C++ data kernels agree with the numpy fallback."""
import os
import numpy as np
import pytest

from srfdet3d_tpu.data import native as N
from srfdet3d_tpu.data import transforms as T


@pytest.fixture(scope="module")
def have():
    if not N.have_native():
        pytest.skip("native extension not built")
    return True


def test_load_points_roundtrip(tmp_path, have):
    rng = np.random.default_rng(0)
    pts = rng.normal(size=(1000, 5)).astype(np.float32)
    path = str(tmp_path / "p.bin")
    pts.tofile(path)
    got = N.load_points_fast(path, 5)
    np.testing.assert_array_equal(got, pts)


def test_filter_pad_matches_numpy(have):
    rng = np.random.default_rng(1)
    pts = rng.uniform(-20, 20, (5000, 5)).astype(np.float32)
    pc = (-10, -10, -10, 10, 10, 10)
    got, gmask = N.filter_pad_fast(pts, pc, 4096, shuffle=False, seed=0)
    want = T.points_range_filter(pts, pc)
    assert gmask.sum() == len(want)
    np.testing.assert_allclose(got[gmask], want)
    # shuffled variant keeps the same point set
    got2, m2 = N.filter_pad_fast(pts, pc, 4096, shuffle=True, seed=7)
    assert m2.sum() == len(want)
    a = set(map(tuple, np.round(got2[m2], 4)))
    b = set(map(tuple, np.round(want, 4)))
    assert a == b


def test_filter_pad_overflow_truncates(have):
    pts = np.zeros((100, 4), np.float32)
    out, mask = N.filter_pad_fast(pts, (-1, -1, -1, 1, 1, 1), 10,
                                  shuffle=False, seed=0)
    assert out.shape == (10, 4) and mask.all()


def test_transform_points_matches_numpy(have):
    rng = np.random.default_rng(2)
    pts = rng.normal(size=(500, 5)).astype(np.float32)
    ang = 0.7
    rot = np.array([[np.cos(ang), -np.sin(ang), 0],
                    [np.sin(ang), np.cos(ang), 0],
                    [0, 0, 1]], np.float32)
    tr = np.array([1.0, -2.0, 0.5], np.float32)
    want = pts.copy()
    want[:, :3] = want[:, :3] @ rot.T + tr
    got = N.transform_points_fast(pts.copy(), rot, tr)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
