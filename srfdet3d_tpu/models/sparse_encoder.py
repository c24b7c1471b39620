"""Sparse 3D middle encoder (spconv-stack replacement, flax).

Mirrors SparseEncoderCustom (reference sparse_encoder_custom.py:20-216) for
both shipped layouts:

  - block_type='conv_module' (KITTI, mmdet3d defaults): each stage is
    [downsample (i>0, j==0)] + submanifold convs, every conv + BN + ReLU.
  - block_type='basicblock' (nuScenes / Waymo): each stage is
    SparseBasicBlock x n + downsample SparseConv3d (except last stage).

Followed by conv_out (kernel (3,1,1), stride (2,1,1), pad 0) and a scatter to
a dense BEV map (B, H, W, D*C).

Batch handling is FLAT, not vmapped: rulebook lookups, feature gathers and
the dense scatter fold the batch index into the cell/row key so every
scatter/gather is a single unbatched op — vmapped scatters compile ~8x
slower on the remote TPU compiler and the flat form runs identically
(see ops/sparse_conv.py batched_lookup).

Two interchangeable rulebook backends produce the (B, M, K) gather indices
(identical offset order, so parameters transfer between them):

  - 'bitmap' (default): z-bitmap columns (ops/bitmap_rulebook.py) — plan
    (y, x) tables + per-column 64-bit z masks; no per-layer sorts, no 3D
    cell tables.  Requires the z depth chain to fit 64/32 bits (every
    shipped grid does); falls back to 'table' otherwise.
  - 'table': dense 3D cell tables + candidate-sort output sites
    (ops/sparse_conv.py), the general path (any kernel shape, any depth).

The two backends emit sites in different row ORDERS (plan-major vs
z-major); the dense BEV output is identical (tests/test_sparse_encoder.py).
"""

from __future__ import annotations

from typing import Any, List, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.bitmap_rulebook import (
    _use_eqmatch, build_columns, convout_rulebook_bitmap,
    convout_sites_bitmap, sort_plan_major, strided_downsample_bitmap,
    subm_rulebook_bitmap, subm_rulebook_eqmatch)
from ..ops.sparse_conv import (
    SparseTensor, subm_gather_indices_batched,
    strided_gather_indices_batched, gathered_conv_apply_batched,
    generate_output_sites, conv_out_shape, sparse_to_dense_batched,
    make_key_table)
from .layers import MaskedBatchNorm

_KAIMING = nn.initializers.variance_scaling(2.0, "fan_in", "normal", in_axis=(0, 1))


class _GatheredConvBN(nn.Module):
    """Shared conv-apply + BN + optional ReLU over a precomputed batched
    rulebook of GLOBAL flat gather indices (B, M, K)."""
    out_channels: int
    num_offsets: int
    relu: bool = True
    bn: bool = True
    subm: bool = False     # symmetric rulebook -> symmetric backward
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats, gidx, mask, train=False):
        cin = feats.shape[-1]
        w = self.param("kernel", _KAIMING,
                       (self.num_offsets, cin, self.out_channels),
                       jnp.float32)
        out = gathered_conv_apply_batched(feats, gidx, w.astype(self.dtype),
                                          subm=self.subm)
        if self.bn:
            out = MaskedBatchNorm(dtype=self.dtype)(out, mask, train=train)
        if self.relu:
            out = nn.relu(out)
        return jnp.where(mask[..., None], out, 0.0)


def _pad3(p):
    return (p, p, p) if isinstance(p, int) else tuple(p)


class _TableRulebooks:
    """Dense-3D-cell-table backend (ops/sparse_conv.py)."""

    def __init__(self, coords, mask, shape):
        self.coords, self.mask, self.shape = coords, mask, shape
        # one cell table per stage, shared by the subm rulebook and the
        # following strided conv's input lookup (the stage-0 table alone
        # is a 355 MB write at nuScenes scale)
        self.key_table = make_key_table(coords, mask, shape)

    def subm(self):
        return subm_gather_indices_batched(
            self.coords, self.mask, self.shape, 3, key_table=self.key_table)

    def _strided(self, kernel, stride, pad, capacity):
        oshape = conv_out_shape(self.shape, kernel, stride, pad)
        oc, om = jax.vmap(
            lambda c, m: generate_output_sites(
                SparseTensor(jnp.zeros((c.shape[0], 1)), c, m, self.shape),
                kernel, stride, pad, capacity))(self.coords, self.mask)
        gidx = strided_gather_indices_batched(
            self.coords, self.mask, self.shape, oc, om, kernel, stride,
            pad, key_table=self.key_table)
        self.coords, self.mask, self.shape = oc, om, oshape
        self.key_table = make_key_table(oc, om, oshape)
        return gidx

    def downsample(self, pad, capacity):
        return self._strided((3, 3, 3), (2, 2, 2), _pad3(pad), capacity)

    def convout(self, capacity):
        return self._strided((3, 1, 1), (2, 1, 1), (0, 0, 0), capacity)

    def dense(self, feats):
        return sparse_to_dense_batched(feats, self.coords, self.mask,
                                       self.shape)


class _BitmapRulebooks:
    """z-bitmap column backend (ops/bitmap_rulebook.py).

    Tracks per-voxel plan coords (vyx) through the stage chain so the
    eq-match kernel path (ops/pallas_eqmatch.py) can query cells directly
    — no per-voxel column gathers anywhere in the rulebook walk."""

    def __init__(self, coords, mask, shape):
        self.cs, self.vcol, self.vz = build_columns(coords, mask, shape)
        self.mask = mask
        self.vyx = coords[..., 1:3]

    def subm(self):
        if _use_eqmatch():
            coords = jnp.concatenate([self.vz[..., None], self.vyx],
                                     axis=-1)
            return subm_rulebook_eqmatch(self.cs, coords, self.vcol,
                                         self.vz, self.mask)
        return subm_rulebook_bitmap(self.cs, self.vcol, self.vz, self.mask)

    def downsample(self, pad, capacity):
        pad = _pad3(pad)
        cs_o, vcol_o, vz_o, vm_o, gidx, vyx_o = strided_downsample_bitmap(
            self.cs, pad, capacity, return_yx=True)
        self.cs, self.vcol, self.vz, self.mask = cs_o, vcol_o, vz_o, vm_o
        self.vyx = vyx_o
        return gidx

    def convout(self, capacity):
        cs_o, vcol_o, vz_o, vm_o = convout_sites_bitmap(self.cs, capacity)
        gidx = convout_rulebook_bitmap(self.cs, vcol_o, vz_o, vm_o)
        self.cs, self.vcol, self.vz, self.mask = cs_o, vcol_o, vz_o, vm_o
        return gidx

    def dense(self, feats):
        b, p, _ = self.cs.ccoords.shape
        m = self.vcol.shape[1]
        ccflat = jnp.concatenate(
            [self.cs.ccoords.reshape(b * p, 2),
             jnp.zeros((1, 2), jnp.int32)], axis=0)
        yx = ccflat[self.vcol.reshape(-1)].reshape(b, m, 2)
        coords = jnp.concatenate([self.vz[..., None], yx], axis=-1)
        return sparse_to_dense_batched(feats, coords, self.mask,
                                       self.cs.shape)


def down_pads(block_type: str, encoder_channels, encoder_paddings) -> List:
    """Padding of each strided downsample conv, in stage order — the ONE
    definition of where the downsamples sit in each layout (conv_module:
    first conv of stages 1..; basicblock: last conv of all but the last
    stage).  Shared by the encoder, the bitmap-support check and the
    torch converter's BEV depth chain."""
    pads = []
    if block_type == "conv_module":
        for i, _blocks in enumerate(encoder_channels):
            if i != 0:
                pads.append(encoder_paddings[i][0])
    else:
        n = len(encoder_channels)
        for i, blocks in enumerate(encoder_channels):
            if i != n - 1:
                pads.append(encoder_paddings[i][len(blocks) - 1])
    return pads


def _bitmap_supported(shape, down_pads: List, block_type: str) -> bool:
    """The bitmap backend needs the z-depth chain to fit its bit words:
    input depth <= 64, every downsample output depth in (0, 32], and a
    valid conv_out depth.  True for every shipped grid (41->21->11->5->2);
    tiny/degenerate test grids fall back to the table backend."""
    d = shape[0]
    if d > 64:
        return False
    for pad in down_pads:
        pz = _pad3(pad)[0]
        if d + pz > 64:       # decimate_bits shifts left by pz pre-tap
            return False
        d = (d + 2 * pz - 3) // 2 + 1
        if d <= 0 or d > 32:
            return False
    d = (d - 3) // 2 + 1
    return d >= 1


class SparseEncoder(nn.Module):
    in_channels: int
    sparse_shape: Tuple[int, int, int]          # (D, H, W)
    base_channels: int = 16
    output_channels: int = 128
    encoder_channels: Sequence[Sequence[int]] = (
        (16,), (32, 32, 32), (64, 64, 64), (64, 64, 64))
    encoder_paddings: Sequence[Sequence[Any]] = (
        (1,), (1, 1, 1), (1, 1, 1), ((0, 1, 1), 1, 1))
    block_type: str = "conv_module"
    # voxel capacity after each of the 3 downsamples + conv_out
    capacities: Sequence[int] = (60000, 30000, 15000, 15000)
    rulebook: str = "bitmap"                    # bitmap | table
    # profiling hook: False skips conv_out + densify and returns the masked
    # sparse stage output (B, V, C) — lets truncated-stack benches avoid
    # materializing an early-stage dense grid (22 GB at stage-1 resolution,
    # tools/bench_encoder_grad_parts.py)
    densify: bool = True
    # True: caller guarantees voxels arrive plan-major ((y, x) major, z
    # minor, invalid at each sample's tail) — the voxelizer's native
    # order since its sort key went plan-major — skipping the encoder's
    # own sort + 3 re-order gathers.  Leave False for arbitrary orders.
    presorted: bool = False
    dtype: Any = jnp.float32

    def _down_pads(self) -> List:
        return down_pads(self.block_type, self.encoder_channels,
                         self.encoder_paddings)

    @nn.compact
    def __call__(self, voxel_feats: jnp.ndarray, voxel_coords: jnp.ndarray,
                 voxel_mask: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        """voxel_feats (B, V, C), voxel_coords (B, V, 3) zyx, mask (B, V)."""
        feats = voxel_feats.astype(self.dtype)
        coords, mask = voxel_coords, voxel_mask
        shape = tuple(self.sparse_shape)

        use_bitmap = (self.rulebook == "bitmap" and
                      _bitmap_supported(shape, self._down_pads(),
                                        self.block_type))
        if use_bitmap:
            if not self.presorted:
                feats, coords, mask = sort_plan_major(feats, coords, mask,
                                                      shape)
            rb = _BitmapRulebooks(coords, mask, shape)
        else:
            rb = _TableRulebooks(coords, mask, shape)

        def downsample(out_ch, padding, capacity, name):
            nonlocal feats, mask
            gidx = rb.downsample(padding, capacity)
            mask = rb.mask
            feats = _GatheredConvBN(out_ch, 27, dtype=self.dtype,
                                    name=name)(feats, gidx, mask,
                                               train=train)

        def basic_block(gidx, ch, name):
            nonlocal feats
            identity = feats
            f = _GatheredConvBN(ch, 27, subm=True, dtype=self.dtype,
                                name=f"{name}_conv1")(
                feats, gidx, mask, train=train)
            f = _GatheredConvBN(ch, 27, relu=False, subm=True,
                                dtype=self.dtype,
                                name=f"{name}_conv2")(
                f, gidx, mask, train=train)
            f = nn.relu(f + identity)
            feats = jnp.where(mask[..., None], f, 0.0)

        # conv_input: SubMConv3d(in -> base) + BN + ReLU
        gidx = rb.subm()
        feats = _GatheredConvBN(self.base_channels, 27, subm=True,
                                dtype=self.dtype,
                                name="conv_input")(
            feats, gidx, mask, train=train)

        ds_count = 0
        if self.block_type == "conv_module":
            for i, blocks in enumerate(self.encoder_channels):
                for j, out_ch in enumerate(blocks):
                    pad = self.encoder_paddings[i][j]
                    if i != 0 and j == 0:
                        downsample(out_ch, pad, self.capacities[ds_count],
                                   f"down{i}")
                        ds_count += 1
                        gidx = rb.subm()
                    else:
                        feats = _GatheredConvBN(
                            out_ch, 27, subm=True, dtype=self.dtype,
                            name=f"subm{i}_{j}")(feats, gidx, mask,
                                                 train=train)
        elif self.block_type == "basicblock":
            n_stages = len(self.encoder_channels)
            for i, blocks in enumerate(self.encoder_channels):
                for j, out_ch in enumerate(blocks):
                    pad = self.encoder_paddings[i][j]
                    if j == len(blocks) - 1 and i != n_stages - 1:
                        downsample(out_ch, pad, self.capacities[ds_count],
                                   f"down{i}")
                        ds_count += 1
                        gidx = rb.subm()
                    else:
                        basic_block(gidx, out_ch, f"bb{i}_{j}")
        else:
            raise ValueError(self.block_type)

        if not self.densify:
            return jnp.where(mask[..., None], feats, 0.0)

        # conv_out: SparseConv3d k(3,1,1) s(2,1,1) p0 + BN + ReLU
        gidx_out = rb.convout(self.capacities[-1])
        mask = rb.mask
        feats = _GatheredConvBN(self.output_channels, 3, dtype=self.dtype,
                                name="conv_out")(
            feats, gidx_out, mask, train=train)

        dense = rb.dense(feats)
        b, d_, h_, w_, c_ = dense.shape
        # (B, H, W, D*C): z-major channel grouping (layout differs from the
        # reference's (C*D) only by a fixed permutation; trained from scratch)
        return dense.transpose(0, 2, 3, 1, 4).reshape(b, h_, w_, d_ * c_)
