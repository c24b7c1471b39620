"""Static-shape voxelization (hard & dynamic) for point clouds.

TPU-native replacement for mmdet3d's CUDA `Voxelization` op
(reference srfdet.py:58,206-247).  Instead of building a (V, max_pts, C)
buffer on the host/GPU, we keep points point-major and derive:

  - per-point voxel slot ids (for segment reductions),
  - per-voxel integer coords + occupancy masks,
  - per-point "rank within voxel" so the hard-voxelization point cap
    (max_num_points) becomes a mask rather than a gather.

Everything is static-shape: P points in, V_cap voxel slots out.  Points that
are out of range, beyond the per-voxel cap, or in voxels beyond V_cap get the
invalid slot id V_cap (segment ops drop them; gathers read a zero pad row).

Semantic note vs the CUDA op: when more than V_cap voxels are occupied, the
reference keeps the first-seen voxels in point order; we keep the V_cap
spatially-smallest keys (a sort order).  Both are arbitrary truncations of an
overflow case that configs size to be rare (max_voxels=120k/160k).
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
from flax import struct


@dataclasses.dataclass(frozen=True)
class VoxelizationSpec:
    voxel_size: Tuple[float, float, float]
    point_cloud_range: Tuple[float, float, float, float, float, float]
    max_num_points: int  # -1 => dynamic voxelization (no per-voxel cap)
    max_voxels: int      # static voxel capacity V_cap

    @property
    def grid_size(self) -> Tuple[int, int, int]:
        """(nx, ny, nz) voxel counts."""
        pc = self.point_cloud_range
        vs = self.voxel_size
        return (
            int(round((pc[3] - pc[0]) / vs[0])),
            int(round((pc[4] - pc[1]) / vs[1])),
            int(round((pc[5] - pc[2]) / vs[2])),
        )

    @property
    def sparse_shape(self) -> Tuple[int, int, int]:
        """(D, H, W) = (nz + 1, ny, nx), matching the reference coord order.

        The +1 z slot follows mmdet3d convention (reference
        srfdet_voxel_nusc_L.py:12 sparse_shape [41, 1472, 1472] for a
        40-cell z grid): voxel z coords stay in [0, nz-1], the extra top
        plane is always empty, and the encoder's z chain 41->21->11->5->2
        yields the (C*D)=256-channel BEV the SECOND backbone consumes
        (in_channels=256, cfg :57)."""
        nx, ny, nz = self.grid_size
        return (nz + 1, ny, nx)


@struct.dataclass
class VoxelizedPoints:
    """Per-sample voxelization result (all arrays static shape)."""
    point_voxel_idx: jnp.ndarray   # (P,) int32 in [0, V_cap]; V_cap = invalid
    point_mask: jnp.ndarray        # (P,) bool, after range+cap+capacity
    voxel_coords: jnp.ndarray      # (V_cap, 3) int32, (z, y, x); 0 if empty
    voxel_mask: jnp.ndarray        # (V_cap,) bool
    num_points: jnp.ndarray        # (V_cap,) int32 (capped count)


def compute_voxel_coords(points: jnp.ndarray, spec: VoxelizationSpec):
    """Integer voxel coords (z,y,x) and in-range mask for each point.

    points: (P, >=3) with xyz leading. Returns ((P, 3) int32, (P,) bool).
    """
    pc = jnp.asarray(spec.point_cloud_range)
    vs = jnp.asarray(spec.voxel_size)
    nx, ny, nz = spec.grid_size
    rel = (points[:, :3] - pc[:3]) / vs
    idx = jnp.floor(rel).astype(jnp.int32)
    in_range = (
        (idx[:, 0] >= 0) & (idx[:, 0] < nx) &
        (idx[:, 1] >= 0) & (idx[:, 1] < ny) &
        (idx[:, 2] >= 0) & (idx[:, 2] < nz))
    coords_zyx = jnp.stack([idx[:, 2], idx[:, 1], idx[:, 0]], axis=-1)
    return coords_zyx, in_range


def _coord_bits(spec: VoxelizationSpec):
    """(zbits, xbits, ybits) of the bit-packed coord passenger, or None.

    Sorting a bit-packed (y<<(x+z) | x<<z | z) int32 alongside the key
    lets the scatter stage reconstruct sorted coords with shifts/masks
    instead of a (P, 3) row gather (~10 ns/row wall) — int division by
    the non-power-of-2 grid strides is NOT an option at this width (the
    `// shift` note below).  All shipped grids fit 31 bits (flagship
    11+11+6=28); returns None when one would not."""
    nx, ny, nz = spec.grid_size
    zb = max((nz - 1).bit_length(), 1)
    xb = max((nx - 1).bit_length(), 1)
    yb = max((ny - 1).bit_length(), 1)
    return (zb, xb, yb) if zb + xb + yb <= 31 else None


def _pack_coords(coords: jnp.ndarray, bits) -> jnp.ndarray:
    zb, xb, _ = bits
    return (coords[:, 1] << (xb + zb)) | (coords[:, 2] << zb) | coords[:, 0]


def _unpack_coords(packed: jnp.ndarray, bits) -> jnp.ndarray:
    zb, xb, _ = bits
    return jnp.stack([packed & ((1 << zb) - 1),
                      packed >> (xb + zb),
                      (packed >> zb) & ((1 << xb) - 1)], axis=-1)


def voxelize_points(points: jnp.ndarray,
                    point_valid: jnp.ndarray,
                    spec: VoxelizationSpec,
                    with_counts: bool = True) -> VoxelizedPoints:
    """Voxelize one sample's (padded) point cloud.

    Args:
      points: (P, C) with xyz in the first 3 channels.
      point_valid: (P,) bool padding mask.
      spec: voxelization parameters.
      with_counts: False skips the per-voxel point-count scatter (a
        ~262k-row pass at flagship scale) and returns zeros in
        num_points — the detector path never consumes it (the VFE
        segment mean derives its own counts).
    """
    p = points.shape[0]
    v_cap = spec.max_voxels
    nx, ny, nz = spec.grid_size

    coords, in_range = compute_voxel_coords(points, spec)
    valid = point_valid & in_range

    # linear key, PLAN-major (y*nx + x)*nz + z; fits int32 for all
    # configs.  Plan-major output order makes the sparse encoder's
    # column invariant hold straight out of the voxelizer — its
    # sort_plan_major becomes a no-op (detector passes presorted=True)
    key = (coords[:, 1] * nx + coords[:, 2]) * nz + coords[:, 0]
    sentinel = jnp.int32(nx * ny * nz)
    key = jnp.where(valid, key, sentinel)

    order_src = jnp.arange(p, dtype=jnp.int32)
    bits = _coord_bits(spec)
    if bits is not None:
        # sorted coords ride the sort as a bit-packed passenger operand
        # (invalid rows carry garbage but never reach a live scatter slot)
        skey, order, sbit = jax.lax.sort(
            (key, order_src, _pack_coords(coords, bits)), num_keys=1)
        coords_sorted = _unpack_coords(sbit, bits)
    else:
        skey, order = jax.lax.sort((key, order_src), num_keys=1)
        coords_sorted = coords[order]
    svalid = skey != sentinel
    head = jnp.concatenate(
        [jnp.ones((1,), bool), skey[1:] != skey[:-1]]) & svalid
    from .prefix import prefix_count
    slot_sorted = prefix_count(head)                     # (P,) voxel rank
    slot_sorted = jnp.where(
        svalid & (slot_sorted < v_cap), slot_sorted, v_cap).astype(jnp.int32)

    # hard-voxelization point cap WITHOUT the per-point rank machinery:
    # sorted same-voxel points are contiguous, so point i is within the
    # first `cap` of its voxel iff the point `cap` positions back belongs
    # to a different voxel.  One static shift-compare replaces the
    # first-position scatter-max + gather (two 262k-row passes at the
    # ~10 ns/row wall, PERF.md round-5).
    if spec.max_num_points > 0:
        cap = spec.max_num_points
        keep_sorted = jnp.concatenate(
            [jnp.ones((min(cap, p),), bool),
             skey[cap:] != skey[:-cap]]) if cap < p else jnp.ones((p,),
                                                                  bool)
    else:
        keep_sorted = jnp.ones((p,), bool)
    slot_sorted = jnp.where(
        keep_sorted & (slot_sorted < v_cap), slot_sorted, v_cap)

    # voxel coords + occupancy in ONE packed 4-column scatter at head
    # positions (mask rides as the 4th int32 column)
    packed = jnp.concatenate(
        [coords_sorted, jnp.ones((p, 1), jnp.int32)], axis=1)
    buf = jnp.zeros((v_cap + 1, 4), jnp.int32).at[
        jnp.where(head, slot_sorted, v_cap)].set(packed, mode="drop")
    voxel_coords = buf[:v_cap, :3]
    voxel_mask = buf[:v_cap, 3] > 0
    if with_counts:
        num_points = jnp.zeros((v_cap + 1,), jnp.int32).at[
            slot_sorted].add(1, mode="drop")[:v_cap]
    else:
        num_points = jnp.zeros((v_cap,), jnp.int32)

    # un-sort the per-point slot ids (scatter beats a second argsort)
    point_voxel_idx = jnp.zeros((p,), jnp.int32).at[order].set(
        slot_sorted.astype(jnp.int32))
    point_mask = point_voxel_idx < v_cap

    return VoxelizedPoints(
        point_voxel_idx=point_voxel_idx,
        point_mask=point_mask,
        voxel_coords=voxel_coords,
        voxel_mask=voxel_mask,
        num_points=num_points,
    )


def voxelize_points_batched(points: jnp.ndarray,
                            point_valid: jnp.ndarray,
                            spec: VoxelizationSpec,
                            with_counts: bool = True) -> VoxelizedPoints:
    """Flat-batched voxelization: (B, P, C) -> batched VoxelizedPoints.

    `jax.vmap(voxelize_points)` measured 81.5 ms vs 18.8 single-sample at
    flagship shapes (vmapped sort/scatter lowering, PERF.md) — so the
    batch folds into the KEY instead: sample b's keys shift by
    b*(cells+1), one global sort keeps samples as contiguous key-ordered
    blocks (each sample's keys, sentinel included, sort below the next
    sample's range), and every scatter hits a flat (B*(V+1),) buffer.
    Requires B*(cells+1) < 2^31 (B <= ~22 at Waymo grid scale); larger
    batches fall back to the vmapped path.
    """
    b, p = point_valid.shape
    v_cap = spec.max_voxels
    nx, ny, nz = spec.grid_size
    cells = nx * ny * nz
    shift = cells + 1
    if b * shift >= (1 << 31):
        return jax.vmap(lambda pt, m: voxelize_points(
            pt, m, spec, with_counts=with_counts))(points, point_valid)

    flat_pts = points.reshape(b * p, -1)
    coords, in_range = compute_voxel_coords(flat_pts, spec)
    valid = point_valid.reshape(-1) & in_range

    # PLAN-major key (see voxelize_points): encoder-ready voxel order
    key = (coords[:, 1] * nx + coords[:, 2]) * nz + coords[:, 0]
    b_of = jnp.repeat(jnp.arange(b, dtype=jnp.int32), p)
    key = jnp.where(valid, key, cells) + b_of * shift     # (B*P,)

    order_src = jnp.arange(b * p, dtype=jnp.int32)
    bits = _coord_bits(spec)
    if bits is not None:
        skey, order, sbit = jax.lax.sort(
            (key, order_src, _pack_coords(coords, bits)), num_keys=1)
        coords_sorted = _unpack_coords(sbit, bits)
    else:
        skey, order = jax.lax.sort((key, order_src), num_keys=1)
        coords_sorted = coords[order]
    # sorted samples form contiguous blocks [b*P, (b+1)*P), so the sample
    # id is positional — no `// shift` (int32 division by a non-power-of-2
    # costs tens of ms at this width on the VPU)
    sb = jnp.repeat(jnp.arange(b, dtype=jnp.int32), p)
    svalid = (skey - sb * shift) != cells
    head = jnp.concatenate(
        [jnp.ones((1,), bool), skey[1:] != skey[:-1]]) & svalid
    from .prefix import prefix_count
    grank = prefix_count(head)                            # global voxel rank
    # per-sample base: rank just before the sample's block (blocks are
    # [b*P, (b+1)*P) because shifted keys sort samples in order)
    starts = jnp.arange(b, dtype=jnp.int32) * p
    # heads strictly before the block start: prefix_count is inclusive-1,
    # so count(0..start-1) = grank[start-1] + 1
    base = jnp.where(starts > 0, grank[jnp.maximum(starts - 1, 0)] + 1, 0)
    slot_sorted = grank - base[sb]
    slot_sorted = jnp.where(
        svalid & (slot_sorted < v_cap), slot_sorted, v_cap).astype(jnp.int32)
    gslot = jnp.where(slot_sorted < v_cap,
                      slot_sorted + sb * (v_cap + 1), b * (v_cap + 1) - 1)
    # (invalid rows target their sample's trash slot v_cap; the final
    # gslot for fully-invalid rows uses the last sample's trash slot)

    # point cap as a sorted-key shift compare (see voxelize_points): the
    # b_of key shift keeps samples' key ranges disjoint, so the compare
    # never credits a point against another sample's voxel
    if spec.max_num_points > 0:
        cap = spec.max_num_points
        keep_sorted = jnp.concatenate(
            [jnp.ones((min(cap, b * p),), bool),
             skey[cap:] != skey[:-cap]]) if cap < b * p else jnp.ones(
                 (b * p,), bool)
    else:
        keep_sorted = jnp.ones((b * p,), bool)
    slot_sorted = jnp.where(keep_sorted & (slot_sorted < v_cap),
                            slot_sorted, v_cap)
    gslot = jnp.where(slot_sorted < v_cap,
                      slot_sorted + sb * (v_cap + 1), b * (v_cap + 1) - 1)
    ghead = jnp.where(head & (slot_sorted < v_cap), gslot,
                      b * (v_cap + 1) - 1)

    # coords + occupancy in one packed 4-column scatter (sorted coords
    # reconstructed from the bit-packed sort passenger — no row gather)
    packed = jnp.concatenate(
        [coords_sorted, jnp.ones((b * p, 1), jnp.int32)], axis=1)
    buf = jnp.zeros((b * (v_cap + 1), 4), jnp.int32).at[
        ghead].set(packed, mode="drop")
    if with_counts:
        num_points = jnp.zeros((b * (v_cap + 1),), jnp.int32).at[
            gslot].add(1, mode="drop")
    else:
        num_points = jnp.zeros((b * (v_cap + 1),), jnp.int32)
    # strip each sample's trash slot; undo any write that landed in the
    # shared last trash slot
    buf = buf.reshape(b, v_cap + 1, 4)[:, :v_cap]
    voxel_coords = buf[..., :3]
    voxel_mask = buf[..., 3] > 0
    num_points = num_points.reshape(b, v_cap + 1)[:, :v_cap]

    point_voxel_idx = jnp.zeros((b * p,), jnp.int32).at[order].set(
        slot_sorted.astype(jnp.int32)).reshape(b, p)
    point_mask = point_voxel_idx < v_cap

    return VoxelizedPoints(
        point_voxel_idx=point_voxel_idx,
        point_mask=point_mask,
        voxel_coords=voxel_coords,
        voxel_mask=voxel_mask,
        num_points=num_points,
    )
