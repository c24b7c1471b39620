"""3D box codecs and corner math (pure jnp, fully batched).

Box code (matching reference mmdet3d_plugin/core/bbox/util.py):
  raw box     : [cx, cy, cz, w, l, h, yaw (, vx, vy)]           (7 or 9)
  normalized  : [cx, cy, cz, log w, log l, log h, sin, cos (, vx, vy)] (8/10)

The reference's `boxes3d_to_corners3d` (util.py:84-176) always exponentiates
the size fields, even when invoked with raw-size GT boxes from the OTA
assigner (ota_srfdet.py:181-183).  That behavior is load-bearing for the
trained models (it inflates GT extents in the in-box gating), so we keep a
`log_size` flag and default it to True to mirror every reference call site.
"""

from __future__ import annotations

import jax.numpy as jnp


def normalize_bbox(bboxes: jnp.ndarray) -> jnp.ndarray:
    """[cx,cy,cz,w,l,h,yaw(,vx,vy)] -> [cx,cy,cz,logw,logl,logh,sin,cos(,vx,vy)].

    Mirrors reference core/bbox/util.py:4-38 (center passed through).
    """
    center = bboxes[..., 0:3]
    size = jnp.log(bboxes[..., 3:6])
    rot = bboxes[..., 6:7]
    parts = [center, size, jnp.sin(rot), jnp.cos(rot)]
    if bboxes.shape[-1] > 7:
        parts.append(bboxes[..., 7:9])
    return jnp.concatenate(parts, axis=-1)


def denormalize_bbox(normalized: jnp.ndarray) -> jnp.ndarray:
    """Inverse of :func:`normalize_bbox` (reference util.py:41-81)."""
    rot = jnp.arctan2(normalized[..., 6:7], normalized[..., 7:8])
    center = normalized[..., 0:3]
    size = jnp.exp(normalized[..., 3:6])
    parts = [center, size, rot]
    if normalized.shape[-1] > 8:
        parts.append(normalized[..., 8:10])
    return jnp.concatenate(parts, axis=-1)


def boxes3d_to_corners3d(
    boxes3d: jnp.ndarray,
    bottom_center: bool = True,
    yaw_as_sincos: bool = False,
    log_size: bool = True,
) -> jnp.ndarray:
    """Convert boxes to 8 corners, replicating reference util.py:84-176.

    Args:
      boxes3d: (..., 7) [cx,cy,cz,w,l,h,yaw] if not yaw_as_sincos, else
        (..., 8) [cx,cy,cz,w,l,h,sin,cos].  Sizes are log-sizes when
        ``log_size`` (reference always exps).
      bottom_center: if True, z spans [0, h] above cz; else [-h/2, h/2].

    Returns: (..., 8, 3) corners.
    """
    cx, cy, cz = boxes3d[..., 0], boxes3d[..., 1], boxes3d[..., 2]
    w, l, h = boxes3d[..., 3], boxes3d[..., 4], boxes3d[..., 5]
    if yaw_as_sincos:
        ry = jnp.arctan2(boxes3d[..., 6], boxes3d[..., 7])
    else:
        ry = boxes3d[..., 6]
    if log_size:
        w, l, h = jnp.exp(w), jnp.exp(l), jnp.exp(h)

    half_w, half_l, half_h = w / 2.0, l / 2.0, h / 2.0
    sx = jnp.stack([half_w, -half_w, -half_w, half_w,
                    half_w, -half_w, -half_w, half_w], axis=-1)
    sy = jnp.stack([-half_l, -half_l, half_l, half_l,
                    -half_l, -half_l, half_l, half_l], axis=-1)
    if bottom_center:
        zeros = jnp.zeros_like(h)
        sz = jnp.stack([zeros, zeros, zeros, zeros, h, h, h, h], axis=-1)
    else:
        sz = jnp.stack([-half_h, -half_h, -half_h, -half_h,
                        half_h, half_h, half_h, half_h], axis=-1)

    # Reference applies corners(row-vectors) @ R with
    # R = [[cos,-sin,0],[sin,cos,0],[0,0,1]]  (util.py:146-159), i.e.
    # x' = x cos + y sin ; y' = -x sin + y cos.  Replicated verbatim.
    cos_r, sin_r = jnp.cos(ry)[..., None], jnp.sin(ry)[..., None]
    rx = sx * cos_r + sy * sin_r
    ry_ = -sx * sin_r + sy * cos_r
    corners = jnp.stack(
        [rx + cx[..., None], ry_ + cy[..., None], sz + cz[..., None]], axis=-1)
    return corners


def bev_corners(boxes_bev: jnp.ndarray) -> jnp.ndarray:
    """BEV rectangle corners, CCW order.

    Args:
      boxes_bev: (..., 5) [cx, cy, w, l, yaw]; raw (non-log) sizes.
    Returns: (..., 4, 2).
    """
    cx, cy = boxes_bev[..., 0], boxes_bev[..., 1]
    hw, hl = boxes_bev[..., 2] / 2.0, boxes_bev[..., 3] / 2.0
    yaw = boxes_bev[..., 4]
    cos_r, sin_r = jnp.cos(yaw)[..., None], jnp.sin(yaw)[..., None]
    lx = jnp.stack([hw, -hw, -hw, hw], axis=-1)
    ly = jnp.stack([hl, hl, -hl, -hl], axis=-1)
    # Standard column-vector rotation here (IoU only needs self-consistency).
    x = lx * cos_r - ly * sin_r + cx[..., None]
    y = lx * sin_r + ly * cos_r + cy[..., None]
    return jnp.stack([x, y], axis=-1)


def gravity_to_bottom_center(boxes: jnp.ndarray) -> jnp.ndarray:
    """Shift cz from gravity center to bottom center (z -= h/2)."""
    return boxes.at[..., 2].add(-0.5 * boxes[..., 5])


def bottom_to_gravity_center(boxes: jnp.ndarray) -> jnp.ndarray:
    """Shift cz from bottom center to gravity center (z += h/2)."""
    return boxes.at[..., 2].add(0.5 * boxes[..., 5])
