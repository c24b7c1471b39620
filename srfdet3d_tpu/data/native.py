"""Wrapper for the native C++ data kernels with numpy fallback.

The extension (native/pointio.cpp) accelerates the host-side per-sample hot
loop: .bin load, range filter + shuffle + capacity pad, and rigid point
transforms.  Build once with:

    cd native && python setup.py build_ext --inplace

If the extension is absent everything falls back to the numpy paths in
transforms.py.  Results are identical EXCEPT the shuffle order inside
filter_pad (different RNGs): the point SET kept is identical while the
in-range count fits the capacity; over capacity, the retained subset
differs between the native and numpy paths (both are uniform random
subsets — training semantics match, exact reproducibility across
machines with/without the extension does not).
"""

from __future__ import annotations

import os
import sys
from typing import Optional, Tuple

import numpy as np

_NATIVE = None


def _load_native():
    global _NATIVE
    if _NATIVE is not None:
        return _NATIVE
    native_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__)))), "native")
    if native_dir not in sys.path:
        sys.path.insert(0, native_dir)
    try:
        import srfdet3d_native
        _NATIVE = srfdet3d_native
    except ImportError:
        _NATIVE = False
    return _NATIVE


def have_native() -> bool:
    return bool(_load_native())


def load_points_fast(path: str, load_dim: int) -> np.ndarray:
    n = _load_native()
    if n:
        return n.load_points(path, load_dim)
    return np.fromfile(path, dtype=np.float32).reshape(-1, load_dim)


def filter_pad_fast(points: np.ndarray, pc_range, cap: int,
                    shuffle: bool = True, seed: int = 0
                    ) -> Tuple[np.ndarray, np.ndarray]:
    """Range filter + (optional) shuffle + pad to capacity, one pass."""
    n = _load_native()
    if n:
        return n.filter_pad(
            np.ascontiguousarray(points, np.float32),
            np.asarray(pc_range, np.float32), int(cap), int(shuffle),
            int(seed))
    from . import transforms as T
    pts = T.points_range_filter(points, pc_range)
    if shuffle:
        pts = T.point_shuffle(pts, np.random.default_rng(seed))
    return T.pad_points(pts, cap)


def transform_points_fast(points: np.ndarray, rot: np.ndarray,
                          trans: np.ndarray) -> np.ndarray:
    """xyz' = R @ xyz + t.  Always returns a fresh array — the native
    kernel works in place, so it gets a copy (identical aliasing behavior
    with and without the extension)."""
    n = _load_native()
    if n:
        points = np.ascontiguousarray(points, np.float32).copy()
        n.transform_points(points, np.asarray(rot, np.float32),
                           np.asarray(trans, np.float32))
        return points
    points = points.copy()
    points[:, :3] = points[:, :3] @ np.asarray(rot).T + np.asarray(trans)
    return points
