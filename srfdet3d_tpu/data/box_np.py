"""Numpy box geometry helpers for the host-side data pipeline."""

from __future__ import annotations

import numpy as np


def points_in_boxes_bev(points: np.ndarray, boxes: np.ndarray) -> np.ndarray:
    """Rotated-BEV membership: points (N, >=2), boxes (M, >=7 bottom-z)
    -> bool (N, M)."""
    if len(boxes) == 0:
        return np.zeros((len(points), 0), bool)
    d = points[:, None, :2] - boxes[None, :, :2]
    c, s = np.cos(boxes[:, 6]), np.sin(boxes[:, 6])
    u = d[..., 0] * c + d[..., 1] * s
    v = -d[..., 0] * s + d[..., 1] * c
    return (np.abs(u) <= boxes[:, 3] / 2) & (np.abs(v) <= boxes[:, 4] / 2)


def points_in_boxes_3d(points: np.ndarray, boxes: np.ndarray) -> np.ndarray:
    """3D membership (rotated BEV x z slab): points (N, >=3),
    boxes (M, >=7) with BOTTOM-center z -> bool (N, M).  Matches mmdet3d
    points_in_rbbox (ObjectSample removes only points inside the 3D box,
    not the whole vertical column)."""
    bev = points_in_boxes_bev(points, boxes)
    if bev.shape[1] == 0:
        return bev
    z0 = boxes[:, 2]
    z1 = z0 + boxes[:, 5]
    in_z = (points[:, 2:3] >= z0[None]) & (points[:, 2:3] <= z1[None])
    return bev & in_z


def box_corners_bev(boxes: np.ndarray) -> np.ndarray:
    """(M, >=7) -> (M, 4, 2) BEV corners."""
    hw, hl = boxes[:, 3] / 2, boxes[:, 4] / 2
    lx = np.stack([hw, -hw, -hw, hw], axis=-1)
    ly = np.stack([hl, hl, -hl, -hl], axis=-1)
    c, s = np.cos(boxes[:, 6])[:, None], np.sin(boxes[:, 6])[:, None]
    x = lx * c - ly * s + boxes[:, 0:1]
    y = lx * s + ly * c + boxes[:, 1:2]
    return np.stack([x, y], axis=-1)
