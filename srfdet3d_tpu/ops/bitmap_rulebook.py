"""Bitmap-column rulebooks for the sparse 3D encoder.

The spconv stack the reference consumes (sparse_encoder_custom.py:74-140)
builds rulebooks on the host per layer; our first TPU design replaced that
with dense per-CELL tables (ops/sparse_conv.py) — correct, but the 3D cell
table is huge (355 MB at nuScenes stage 0) and its 27-neighbor lookups +
the per-downsample candidate sorts cost ~100 ms of the forward.

This module exploits the one property every shipped grid shares: the z
axis is THIN (41 -> 21 -> 11 -> 5 cells).  A column's z-occupancy fits a
64-bit mask, so the voxel set factorizes into

    plan (y, x) columns  x  per-column z bitmaps (two uint32 words),

and, with voxels sorted plan-major ((y, x) major, z minor), every rulebook
query becomes pure integer math over SMALL tables:

  - neighbor row lookup:  row = column_start + popcount(bits & below(z'))
    — 9 plan-neighbor lookups into an (H*W)-cell 2D table (8 MB, not
    355 MB) + one packed 12-byte gather per neighbor column, replacing 27
    3D-cell lookups per voxel;
  - strided output sites: out_bits = OR of neighbors' DECIMATED bits,
    where decimation (out bit oz = OR_dz in bit (2*oz - pad + dz)) is
    five shift-and-mask ops — the per-downsample 8-candidate sort
    (~1M keys at stage 0) disappears entirely;
  - site ordering: plan-major by construction (prefix sums of popcounts),
    no sort anywhere past the encoder entry.

Semantics match spconv exactly (an output site exists iff its receptive
field touches an input site; submanifold convs preserve the site set);
capacity overflow drops the highest plan-major sites, mirroring the
dense-table path's highest-key drop (the reference has no capacities at
all — CUDA gets dynamic shapes for free, we pad).

Supported shapes: cubic kernel 3 stride 2 downsamples (any per-dim
padding) and the (3,1,1)/(2,1,1)/pad-0 conv_out — the only strided convs
any shipped config uses.  Rows index the FLAT (B*V + 1,) feature table
with B*V as the miss row, identical to ops/sparse_conv.py, so the conv
kernels (XLA fused gather-GEMM / packed one-hot Pallas) are shared.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import struct

from .prefix import prefix_count, prefix_sum

_U1 = jnp.uint32(1)


# ---------------------------------------------------------------- bit pairs
# A column's z occupancy is (lo, hi): bit z of lo for z < 32, bit z-32 of
# hi above.  Shifts are guarded — XLA shift semantics for amounts >= 32
# are undefined.

def _popcount(x: jnp.ndarray) -> jnp.ndarray:
    return jax.lax.population_count(x).astype(jnp.int32)


def _shl1(z: jnp.ndarray) -> jnp.ndarray:
    """(1 << z) as uint32; 0 when z is outside [0, 32)."""
    zz = jnp.clip(z, 0, 31).astype(jnp.uint32)
    ok = (z >= 0) & (z < 32)
    return jnp.where(ok, jnp.left_shift(_U1, zz), jnp.uint32(0))


def _mask_below(n: jnp.ndarray) -> jnp.ndarray:
    """n low bits set; saturates outside [0, 32]."""
    nn = jnp.clip(n, 0, 31).astype(jnp.uint32)
    m = jnp.left_shift(_U1, nn) - _U1
    m = jnp.where(n >= 32, jnp.uint32(0xFFFFFFFF), m)
    return jnp.where(n <= 0, jnp.uint32(0), m)


def _bit_get(lo: jnp.ndarray, hi: jnp.ndarray, z: jnp.ndarray) -> jnp.ndarray:
    w = jnp.where(z < 32, lo, hi)
    zz = jnp.clip(jnp.where(z < 32, z, z - 32), 0, 31).astype(jnp.uint32)
    ok = (z >= 0) & (z < 64)
    return (jnp.where(ok, jnp.right_shift(w, zz), jnp.uint32(0)) & _U1) != 0


def _rank_below(lo: jnp.ndarray, hi: jnp.ndarray, z: jnp.ndarray
                ) -> jnp.ndarray:
    """Number of set bits strictly below position z (z in [0, 64))."""
    return _popcount(lo & _mask_below(z)) + _popcount(hi & _mask_below(z - 32))


def _pair_shr(lo, hi, n: int):
    if n == 0:
        return lo, hi
    un, comp = jnp.uint32(n), jnp.uint32(32 - n)
    return (jnp.right_shift(lo, un) | jnp.left_shift(hi, comp),
            jnp.right_shift(hi, un))


def _pair_shl(lo, hi, n: int):
    if n == 0:
        return lo, hi
    un, comp = jnp.uint32(n), jnp.uint32(32 - n)
    return (jnp.left_shift(lo, un),
            jnp.left_shift(hi, un) | jnp.right_shift(lo, comp))


def _compress_even(x: jnp.ndarray) -> jnp.ndarray:
    """Pack the even-position bits of a uint32 into its low 16 bits."""
    x = x & jnp.uint32(0x55555555)
    x = (x | jnp.right_shift(x, _U1)) & jnp.uint32(0x33333333)
    x = (x | jnp.right_shift(x, jnp.uint32(2))) & jnp.uint32(0x0F0F0F0F)
    x = (x | jnp.right_shift(x, jnp.uint32(4))) & jnp.uint32(0x00FF00FF)
    x = (x | jnp.right_shift(x, jnp.uint32(8))) & jnp.uint32(0x0000FFFF)
    return x


def decimate_bits(lo: jnp.ndarray, hi: jnp.ndarray, pz: int, zout: int
                  ) -> jnp.ndarray:
    """z-occupancy transform of a kernel-3 stride-2 conv along z.

    out bit oz = OR_{dz in 0..2} in bit (2*oz - pz + dz).  Returns a single
    uint32 (zout <= 32 whenever the input depth + pz <= 64).

    Shift-left by the padding FIRST (padded cells below the grid are empty,
    so zero-fill is exact), then OR the three taps: doing the taps first
    loses the negative-index taps and drops every z=0 output site."""
    ulo, uhi = _pair_shl(lo, hi, pz)
    l1, h1 = _pair_shr(ulo, uhi, 1)
    l2, h2 = _pair_shr(ulo, uhi, 2)
    tlo, thi = ulo | l1 | l2, uhi | h1 | h2
    out = _compress_even(tlo) | jnp.left_shift(
        _compress_even(thi), jnp.uint32(16))
    return out & _mask_below(jnp.int32(zout))


def _shift_bits_up(bm: jnp.ndarray, n: int) -> jnp.ndarray:
    """Shift a word-array bit sequence toward higher bit positions:
    out bit i = in bit (i - n), across word boundaries (bit i of word k is
    sequence position k*32 + i; zeros shift in).  n in [0, 32)."""
    if n == 0:
        return bm
    un, comp = jnp.uint32(n), jnp.uint32(32 - n)
    prev = jnp.concatenate(
        [jnp.zeros_like(bm[..., :1]), bm[..., :-1]], axis=-1)
    return jnp.left_shift(bm, un) | jnp.right_shift(prev, comp)


def _shift_bits_down(bm: jnp.ndarray, n: int) -> jnp.ndarray:
    """out bit i = in bit (i + n), across word boundaries; n in [0, 32)."""
    if n == 0:
        return bm
    un, comp = jnp.uint32(n), jnp.uint32(32 - n)
    nxt = jnp.concatenate(
        [bm[..., 1:], jnp.zeros_like(bm[..., :1])], axis=-1)
    return jnp.right_shift(bm, un) | jnp.left_shift(nxt, comp)


def _plan_bitmap(cs: ColumnSet, emits: jnp.ndarray) -> jnp.ndarray:
    """(B, H, W32) uint32 plan-occupancy bitmap of the columns selected by
    `emits` (B, P): bit x%32 of word (y, x//32).  Distinct columns are
    distinct cells, so scatter-add of single bits is exact OR."""
    b, p, _ = cs.ccoords.shape
    _, h, w = cs.shape
    w32 = (w + 31) // 32
    y, x = cs.ccoords[..., 0], cs.ccoords[..., 1]
    word = y * w32 + jnp.right_shift(x, 5)
    gword = jnp.where(emits,
                      word + jnp.arange(b, dtype=jnp.int32)[:, None] *
                      (h * w32), b * h * w32)
    bits = _shl1(x & 31)
    bm = jnp.zeros((b * h * w32 + 1,), jnp.uint32).at[
        gword.reshape(-1)].add(bits.reshape(-1), mode="drop")
    return bm[:b * h * w32].reshape(b, h, w32)


def _decimate_plan(bm: jnp.ndarray, py: int, px: int, oh: int, ow: int
                   ) -> jnp.ndarray:
    """2D occupancy transform of a k3 s2 conv over the plan: out cell
    (oy, ox) is set iff any input cell (2oy - py + dy, 2ox - px + dx),
    dy/dx in {0..2}, is set.  bm (B, H, W32) -> (B, OH, OW32).

    The x axis is decimate_bits generalized to a word array (shift by the
    padding first, OR the three taps, compress even positions pairing
    adjacent words); the y axis is three strided row slices OR'd."""
    b, h, w32 = bm.shape
    # pad BEFORE shifting: the px up-shift can carry the top word's high
    # bits into a new word (w=96, px=1 pushes bit 95 to 96), and the
    # even-word compress pairs words — one headroom word, rounded even
    w32p = w32 + 1
    w32p += w32p % 2
    bm = jnp.pad(bm, ((0, 0), (0, 0), (0, w32p - w32)))
    # x: out bit ox of a row = taps t at bit 2*ox
    u = _shift_bits_up(bm, px)
    t = u | _shift_bits_down(u, 1) | _shift_bits_down(u, 2)
    ce = _compress_even(t)
    ox_words = ce[..., 0::2] | jnp.left_shift(ce[..., 1::2], jnp.uint32(16))
    ow32 = (ow + 31) // 32
    ox_words = ox_words[..., :ow32]
    if ox_words.shape[-1] < ow32:           # defensive; cannot happen
        ox_words = jnp.pad(
            ox_words, ((0, 0), (0, 0), (0, ow32 - ox_words.shape[-1])))
    tail = ow - (ow32 - 1) * 32             # valid bits in the last word
    mask = jnp.full((ow32,), 0xFFFFFFFF, jnp.uint32)
    if tail < 32:
        mask = mask.at[-1].set(
            jnp.left_shift(_U1, jnp.uint32(tail)) - _U1 if tail > 0
            else jnp.uint32(0))
    ox_words = ox_words & mask[None, None, :]
    # y: out row oy = input rows (2*oy - py + {0, 1, 2})
    need = 2 * (oh - 1) + 3                 # padded rows consumed
    padded = jnp.pad(ox_words, ((0, 0), (py, max(0, need - h - py)), (0, 0)))
    return (padded[:, 0::2][:, :oh] | padded[:, 1::2][:, :oh] |
            padded[:, 2::2][:, :oh])


def _expand_columns(obm: jnp.ndarray, ow: int, out_cap: int):
    """Output plan bitmap (B, OH, OW32) -> compact plan-major column list
    (cc_o (B, P_out, 2) int32, cm_o (B, P_out) bool).  Word order is plan
    order and bits ascend x, so ranks are plan-major; overflow drops the
    highest plan keys (start_local >= out_cap), like the candidate-scatter
    construction this replaces."""
    b, oh, ow32 = obm.shape
    nw = oh * ow32
    words = obm.reshape(b, nw)
    counts = _popcount(words)
    inc = prefix_sum(counts.reshape(-1))
    wstarts = jnp.arange(b, dtype=jnp.int32) * nw
    base = jnp.where(wstarts > 0, inc[jnp.maximum(wstarts - 1, 0)], 0)
    sb = jnp.repeat(jnp.arange(b, dtype=jnp.int32), nw)
    start_local = ((inc - counts.reshape(-1)) - base[sb]).reshape(b, nw)
    wslot, bit, vm = _expand_sites(words, words != jnp.uint32(0), counts,
                                   start_local, out_cap)
    widx = wslot - jnp.arange(b, dtype=jnp.int32)[:, None] * nw
    cy = widx // ow32
    cx = (widx % ow32) * 32 + bit
    cc_o = jnp.where(vm[..., None],
                     jnp.stack([cy, cx], axis=-1), 0)
    return cc_o, vm


def _select_bit(word: jnp.ndarray, k: jnp.ndarray) -> jnp.ndarray:
    """Position of the (k+1)-th set bit of a uint32 (k in [0, popcount))."""
    pos = jnp.zeros_like(k)
    for step in (16, 8, 4, 2, 1):
        c = _popcount(word & _mask_below(pos + step))
        pos = jnp.where(c <= k, pos + step, pos)
    return pos


def _expand_sites(olo: jnp.ndarray, cm: jnp.ndarray, counts: jnp.ndarray,
                  start_local: jnp.ndarray, out_cap: int,
                  ccoords: jnp.ndarray | None = None):
    """Column z-bitmaps -> per-site (vcol, vz, vm[, vyx]) rows, plan-major.

    olo/cm/counts/start_local are (B, P); rows are (B, M=out_cap), local
    row r of column c at rank k holds z = _select_bit(olo[c], k).

    Built gather-side: one P-sized scatter of column HEAD flags into the
    row axis + MXU prefix counts + rank-table gathers.  The previous
    formulation scattered every (column, z) pair ((B, P, D) index tensors,
    ~35 ms at stage 0); this one never materializes per-site scatters.

    ccoords (B, P, 2): when given, the rank table also carries each
    column's (y, x) so per-site plan coords ride the SAME row gather
    (row-gather cost is per row, not bytes — PERF.md) and a fourth
    return value vyx (B, M, 2) is appended (eqmatch rulebooks need site
    coords as query bases)."""
    b, p = olo.shape
    m = out_cap
    gb = jnp.arange(b, dtype=jnp.int32)[:, None]
    nz = cm & (counts > 0) & (start_local < m)

    # head flag at each nonempty column's first row (starts are unique
    # among nz columns of a sample; overflowed columns excluded on BOTH
    # sides so head rank == column rank globally)
    head_idx = jnp.where(nz, start_local + gb * m, b * m)
    heads = jnp.zeros((b * m + 1,), bool).at[
        head_idx.reshape(-1)].set(True, mode="drop")[:b * m]
    rowrank = prefix_count(heads)                     # (B*M,) inclusive-1
    crank = prefix_count(nz.reshape(-1))              # (B*P,)

    # rank -> packed column row [global slot, start_local, bits(, y, x)]
    slots = gb * p + jnp.arange(p, dtype=jnp.int32)[None, :]
    parts = [slots, start_local,
             jax.lax.bitcast_convert_type(olo, jnp.int32)]
    if ccoords is not None:
        parts += [ccoords[..., 0], ccoords[..., 1]]
    width = len(parts)
    packed = jnp.stack(parts, axis=-1)
    trash = b * p
    poison = jnp.zeros((width,), jnp.int32).at[0].set(trash).at[1].set(m)
    tbl = jnp.zeros((b * p + 1, width), jnp.int32).at[
        jnp.where(nz.reshape(-1), crank, trash)].set(
        packed.reshape(-1, width), mode="drop")
    tbl = tbl.at[trash].set(poison)                   # poison the miss row

    pk = tbl[jnp.clip(rowrank, 0, trash)].reshape(b, m, width)
    slot, st = pk[..., 0], pk[..., 1]
    bits = jax.lax.bitcast_convert_type(pk[..., 2], jnp.uint32)
    row_local = jnp.broadcast_to(jnp.arange(m, dtype=jnp.int32)[None, :],
                                 (b, m))
    k = row_local - st
    vm = ((rowrank.reshape(b, m) >= 0) & (slot != trash) &
          (slot // p == gb) & (k >= 0) & (k < _popcount(bits)))
    vz = jnp.where(vm, _select_bit(bits, jnp.maximum(k, 0)), 0)
    vcol = jnp.where(vm, slot, b * p)
    if ccoords is not None:
        vyx = jnp.where(vm[..., None], pk[..., 3:5], 0)
        return vcol, vz, vm, vyx
    return vcol, vz, vm


# ---------------------------------------------------------------- columns

@struct.dataclass
class ColumnSet:
    """Plan-sparse, z-bitmap view of one stage's voxel set (batched).

    Voxel feature rows are plan-major: all voxels of a column are
    contiguous, ascending in z; columns ascend by plan key (y*W + x).
    """
    ccoords: jnp.ndarray   # (B, P, 2) int32 (y, x), plan-key sorted
    cmask: jnp.ndarray     # (B, P) bool
    cstart: jnp.ndarray    # (B, P) int32 GLOBAL row (b*row_cap + local) of
    #                        the column's first voxel
    lo: jnp.ndarray        # (B, P) uint32 z bits 0..31
    hi: jnp.ndarray        # (B, P) uint32 z bits 32..63
    shape: Tuple[int, int, int] = struct.field(pytree_node=False)  # (D,H,W)
    row_cap: int = struct.field(pytree_node=False, default=0)


def sort_plan_major(feats: jnp.ndarray, coords: jnp.ndarray,
                    vmask: jnp.ndarray, shape: Tuple[int, int, int]):
    """Reorder voxels plan-major ((y, x) major, z minor) per sample.

    The voxelizer emits z-major order; one flat-batched key sort at the
    encoder entry establishes the column invariant for every later stage
    (downsample outputs are plan-major by construction).  Invalid voxels
    sort to each sample's tail, like the voxelizer's output."""
    b, v, _ = coords.shape
    d, h, w = shape
    cells = d * h * w
    shift = cells + 1
    key = (coords[..., 1] * w + coords[..., 2]) * d + coords[..., 0]
    key = jnp.where(vmask, key, cells)
    if b * shift < (1 << 31):
        fkey = (key + jnp.arange(b, dtype=jnp.int32)[:, None] * shift
                ).reshape(-1)
        src = jnp.arange(b * v, dtype=jnp.int32)
        _, order = jax.lax.sort((fkey, src), num_keys=1)
        order = order.reshape(b, v)
        # shifted keys keep samples as contiguous blocks; indices stay
        # within their own sample's block, so per-sample gathers are safe
        order_local = order - (jnp.arange(b, dtype=jnp.int32)[:, None] * v)
    else:
        src = jnp.broadcast_to(jnp.arange(v, dtype=jnp.int32), (b, v))
        _, order_local = jax.vmap(
            lambda k, s: jax.lax.sort((k, s), num_keys=1))(key, src)
    take = jax.vmap(lambda a, o: a[o])
    return (take(feats, order_local), take(coords, order_local),
            take(vmask, order_local))


def build_columns(coords: jnp.ndarray, vmask: jnp.ndarray,
                  shape: Tuple[int, int, int]) -> Tuple[
                      ColumnSet, jnp.ndarray, jnp.ndarray]:
    """Plan-major-sorted voxels -> (ColumnSet, vcol (B,V), vz (B,V)).

    vcol is the GLOBAL column slot (b*P + p, miss B*P) of each voxel; the
    column capacity P equals the voxel capacity V (never overflows —
    #columns <= #voxels)."""
    b, v, _ = coords.shape
    d, h, w = shape
    p_cap = v

    pkey = coords[..., 1] * w + coords[..., 2]
    pkey = jnp.where(vmask, pkey, h * w)
    shift = h * w + 1
    fkey = (pkey + jnp.arange(b, dtype=jnp.int32)[:, None] * shift
            ).reshape(-1)
    fmask = vmask.reshape(-1)
    head = jnp.concatenate(
        [jnp.ones((1,), bool), fkey[1:] != fkey[:-1]]) & fmask
    grank = prefix_count(head)
    starts = jnp.arange(b, dtype=jnp.int32) * v
    base = jnp.where(starts > 0, grank[jnp.maximum(starts - 1, 0)] + 1, 0)
    sb = jnp.repeat(jnp.arange(b, dtype=jnp.int32), v)
    col_local = grank - base[sb]                       # valid where fmask

    trash = b * (p_cap + 1) - 1
    gcol = jnp.where(fmask, col_local + sb * (p_cap + 1), trash)
    ghead = jnp.where(head, gcol, trash)
    rows = jnp.arange(b * v, dtype=jnp.int32)          # global feature rows

    cc = jnp.zeros((b * (p_cap + 1), 2), jnp.int32).at[ghead].set(
        coords.reshape(-1, 3)[:, 1:3], mode="drop")
    cstart = jnp.zeros((b * (p_cap + 1),), jnp.int32).at[ghead].set(
        rows, mode="drop")
    cmask = jnp.zeros((b * (p_cap + 1),), bool).at[ghead].set(
        True, mode="drop")
    z = coords[..., 0].reshape(-1)
    blo = jnp.zeros((b * (p_cap + 1),), jnp.uint32).at[gcol].add(
        _shl1(z), mode="drop")
    bhi = jnp.zeros((b * (p_cap + 1),), jnp.uint32).at[gcol].add(
        _shl1(z - 32), mode="drop")

    cs = ColumnSet(
        ccoords=cc.reshape(b, p_cap + 1, 2)[:, :p_cap],
        cmask=cmask.reshape(b, p_cap + 1)[:, :p_cap],
        cstart=cstart.reshape(b, p_cap + 1)[:, :p_cap],
        lo=blo.reshape(b, p_cap + 1)[:, :p_cap],
        hi=bhi.reshape(b, p_cap + 1)[:, :p_cap],
        shape=shape, row_cap=v)
    vcol = jnp.where(fmask, col_local + sb * p_cap, b * p_cap).reshape(b, v)
    vz = coords[..., 0]
    return cs, vcol, vz


def plan_table(cs: ColumnSet) -> jnp.ndarray:
    """(B*H*W + 1,) int32: plan cell -> GLOBAL column slot (miss B*P)."""
    b, p, _ = cs.ccoords.shape
    _, h, w = cs.shape
    key = cs.ccoords[..., 0] * w + cs.ccoords[..., 1]
    gkey = jnp.where(
        cs.cmask, key + jnp.arange(b, dtype=jnp.int32)[:, None] * (h * w),
        b * h * w)
    slots = (jnp.arange(b, dtype=jnp.int32)[:, None] * p +
             jnp.arange(p, dtype=jnp.int32)[None, :])
    t = jnp.full((b * h * w + 1,), b * p, jnp.int32)
    return t.at[gkey.reshape(-1)].set(slots.reshape(-1), mode="drop")


def _slice3(table1: jnp.ndarray, total: int, starts: jnp.ndarray
            ) -> jnp.ndarray:
    """Gather 3 consecutive cells per start from a miss-prepended table."""
    s = jnp.clip(starts + 1, 0, total - 1)
    return jax.vmap(lambda x: jax.lax.dynamic_slice(table1, (x,), (3,)))(s)


def plan_neighbors9(table: jnp.ndarray, ybase: jnp.ndarray,
                    xbase: jnp.ndarray, qmask: jnp.ndarray,
                    hw: Tuple[int, int], b: int, p: int) -> jnp.ndarray:
    """(B, Q) base coords -> (B, Q, 9) GLOBAL column slots, (dy, dx)
    row-major with dy, dx in {0, 1, 2} (cells (ybase+dy, xbase+dx)).

    The 3 dx cells are consecutive -> 3 slice gathers total."""
    h, w = hw
    total = b * h * w
    miss = b * p
    offs_b = (jnp.arange(b, dtype=jnp.int32) * (h * w))[:, None]
    # miss-prepend (start -1 reads miss) AND 2-miss tail: a 3-slice whose
    # start is the last real cell must not get clamped backwards by
    # dynamic_slice (that shifted the final two plan cells' neighbors)
    table1 = jnp.concatenate([
        jnp.full((1,), miss, jnp.int32), table[:-1],
        jnp.full((2,), miss, jnp.int32)])
    q = ybase.shape[1]
    rows = []
    for dy in range(3):
        starts = (ybase + dy) * w + xbase + offs_b
        rows.append(_slice3(table1, total + 3, starts.reshape(-1)))
    out = jnp.stack(rows, axis=1).reshape(b, q, 3, 3)
    d3 = jnp.arange(3, dtype=jnp.int32)
    vy = ((ybase[..., None] + d3 >= 0) & (ybase[..., None] + d3 < h))
    vx = ((xbase[..., None] + d3 >= 0) & (xbase[..., None] + d3 < w))
    valid = (vy[..., :, None] & vx[..., None, :] &
             qmask[..., None, None])
    return jnp.where(valid, out, miss).reshape(b, q, 9)


import os as _os

# A/B knobs for the two round-2 rulebook experiments (36726ab), re-landed
# SEPARATELY after the unsplit commit regressed flagship predict 2.9x
# end-to-end while every micro-part measured faster.  Isolated on-device
# (round 3, /tmp/bench_ab_*.log):
#   sites=bitmap ALONE:      7.258 f/s / p50 163.9 ms  (base 6.078/195.2)
#   neighbors=slice2d ALONE: 1.774 f/s / p50 593.4 ms  <- the regression:
#     the vmapped (3,3) dynamic-slice gather collapses in the full
#     program despite fast micro-benches.
# Hence bitmap sites are the DEFAULT and slice2d stays opt-in only.
# Flip a default ONLY with a same-session end-to-end bench.py number.
NEIGHBORS_METHOD = _os.environ.get("SRFDET_RB_NEIGHBORS", "slice3")
SITES_METHOD = _os.environ.get("SRFDET_RB_SITES", "bitmap")


def plan_table2d(cs: ColumnSet) -> jnp.ndarray:
    """Bordered (B*(H+2), W+2) int32 plan table: row b*(H+2) + y + 1,
    col x + 1 hold the GLOBAL column slot of cell (b, y, x); the 1-cell
    per-sample border holds the miss slot B*P.  One (3, 3) dynamic slice
    per query then fetches all 9 plan neighbors — 3x fewer gather
    descriptor rows than three 1D row slices (the gather wall is per-row
    overhead, not bytes; PERF.md).  Valid only for neighbor bases in
    [-1, dim-2], i.e. kernel-3 queries with padding <= 1 — every shipped
    config; larger pads take the slice3 path."""
    b, p, _ = cs.ccoords.shape
    _, h, w = cs.shape
    rows, cols = b * (h + 2), w + 2
    key = ((jnp.arange(b, dtype=jnp.int32)[:, None] * (h + 2) +
            cs.ccoords[..., 0] + 1) * cols + cs.ccoords[..., 1] + 1)
    gkey = jnp.where(cs.cmask, key, rows * cols)
    slots = (jnp.arange(b, dtype=jnp.int32)[:, None] * p +
             jnp.arange(p, dtype=jnp.int32)[None, :])
    t = jnp.full((rows * cols + 1,), b * p, jnp.int32).at[
        gkey.reshape(-1)].set(slots.reshape(-1), mode="drop")
    return t[:rows * cols].reshape(rows, cols)


def plan_neighbors9_2d(table2d: jnp.ndarray, ybase: jnp.ndarray,
                       xbase: jnp.ndarray, qmask: jnp.ndarray,
                       hw: Tuple[int, int], b: int, p: int) -> jnp.ndarray:
    """plan_neighbors9 via one (3, 3) slice per query on a plan_table2d.

    Requires ybase in [-1, h-2] and xbase in [-1, w-2] (guaranteed for
    kernel-3 pads <= 1): the per-sample border absorbs the -1/+1 cells, so
    slices never cross into a neighboring sample's rows."""
    h, w = hw
    q = ybase.shape[1]
    gb = jnp.arange(b, dtype=jnp.int32)[:, None]
    r0 = gb * (h + 2) + ybase + 1
    c0 = xbase + 1
    out = jax.vmap(
        lambda r, c: jax.lax.dynamic_slice(table2d, (r, c), (3, 3)))(
        r0.reshape(-1), c0.reshape(-1)).reshape(b, q, 3, 3)
    d3 = jnp.arange(3, dtype=jnp.int32)
    vy = ((ybase[..., None] + d3 >= 0) & (ybase[..., None] + d3 < h))
    vx = ((xbase[..., None] + d3 >= 0) & (xbase[..., None] + d3 < w))
    valid = (vy[..., :, None] & vx[..., None, :] & qmask[..., None, None])
    return jnp.where(valid, out, b * p).reshape(b, q, 9)


def _use_slice2d(pads: Tuple[int, int]) -> bool:
    return (NEIGHBORS_METHOD == "slice2d" and pads[0] <= 1 and pads[1] <= 1)


def _plan_neighbors(cs: ColumnSet, ybase, xbase, qmask,
                    pads: Tuple[int, int] = (1, 1)) -> jnp.ndarray:
    """Dispatch: bordered-2D-slice table when the query geometry allows,
    else the general 1D 3-slice table."""
    b, p, _ = cs.ccoords.shape
    if _use_slice2d(pads):
        return plan_neighbors9_2d(plan_table2d(cs), ybase, xbase, qmask,
                                  cs.shape[1:], b, p)
    return plan_neighbors9(plan_table(cs), ybase, xbase, qmask,
                           cs.shape[1:], b, p)


def _packed_columns(cs: ColumnSet) -> jnp.ndarray:
    """(B*P + 1, 3) int32 rows [cstart, lo, hi]; miss row = empty column."""
    b, p, _ = cs.ccoords.shape
    packed = jnp.stack([
        cs.cstart,
        jax.lax.bitcast_convert_type(cs.lo, jnp.int32),
        jax.lax.bitcast_convert_type(cs.hi, jnp.int32)], axis=-1)
    packed = packed.reshape(b * p, 3)
    return jnp.concatenate([packed, jnp.zeros((1, 3), jnp.int32)], axis=0)


def _rows_from_packed(pk: jnp.ndarray, z_target: jnp.ndarray,
                      miss_row: int, row_cap: int, sample_of: jnp.ndarray
                      ) -> jnp.ndarray:
    """pk (..., 3) packed neighbor column, z_target (...) -> global row or
    miss.  Guards rows dropped by the stage's capacity (local >= row_cap)."""
    start = pk[..., 0]
    lo = jax.lax.bitcast_convert_type(pk[..., 1], jnp.uint32)
    hi = jax.lax.bitcast_convert_type(pk[..., 2], jnp.uint32)
    present = _bit_get(lo, hi, z_target)
    row = start + _rank_below(lo, hi, z_target)
    local = row - sample_of * row_cap
    ok = present & (local >= 0) & (local < row_cap)
    return jnp.where(ok, row, miss_row)


def subm_rulebook_bitmap(cs: ColumnSet, vcol: jnp.ndarray, vz: jnp.ndarray,
                         vmask: jnp.ndarray) -> jnp.ndarray:
    """Submanifold 3x3x3 rulebook: (B, V, 27) GLOBAL feature rows
    (z-major (dz, dy, dx) offset order, matching sparse_conv._offsets)."""
    b, p, _ = cs.ccoords.shape
    v = vcol.shape[1]
    row_cap = cs.row_cap
    miss_row = b * row_cap

    nbr = _plan_neighbors(cs, cs.ccoords[..., 0] - 1,
                          cs.ccoords[..., 1] - 1, cs.cmask)  # (B, P, 9)
    pk = _packed_columns(cs)[nbr.reshape(-1)].reshape(b * p, 27)
    pk = jnp.concatenate(                                # miss column row
        [pk, jnp.tile(jnp.array([[0, 0, 0]], jnp.int32), (1, 9))], axis=0)
    pkv = pk[vcol.reshape(-1)].reshape(b, v, 9, 3)       # (B, V, 9, 3)

    sample_of = jnp.arange(b, dtype=jnp.int32)[:, None, None]
    outs = []
    for dz in (-1, 0, 1):
        zt = (vz + dz)[:, :, None]                       # (B, V, 1)
        outs.append(_rows_from_packed(pkv, zt, miss_row, row_cap,
                                      sample_of))        # (B, V, 9)
    out = jnp.stack(outs, axis=2).reshape(b, v, 27)
    return jnp.where(vmask[:, :, None], out, miss_row)


def _strided_sites_impl(cs: ColumnSet, padding: Tuple[int, int, int],
                        out_cap: int):
    """Sites of a k3 s2 sparse conv + the output-column plan-neighbor
    gather (reused by the rulebook via strided_downsample_bitmap)."""
    b, p, _ = cs.ccoords.shape
    d, h, w = cs.shape
    pz, py, px = padding
    od = (d + 2 * pz - 3) // 2 + 1
    oh = (h + 2 * py - 3) // 2 + 1
    ow = (w + 2 * px - 3) // 2 + 1
    if od <= 0 or oh <= 0 or ow <= 0 or od > 32:
        raise ValueError("bitmap strided conv needs 0 < out depth <= 32")

    # a column whose DECIMATED z bits are empty (every voxel's output taps
    # clip past the output depth) contributes no site to ANY candidate
    # cell — gating it out of candidate emission keeps the '#columns <=
    # #sites' invariant exact (no phantom zero-site columns eating out_cap
    # slots; unreachable with the shipped depth chains, but reachable
    # through this public function)
    dlo = decimate_bits(cs.lo, cs.hi, pz, od)           # (B, P_in)
    emits = cs.cmask & (dlo != jnp.uint32(0))

    # Output-column occupancy as a 2D plan-bitmap dilate-decimate — the
    # k3 s2 occupancy transform applied to (y, x) exactly as decimate_bits
    # applies it to z.  The previous candidate-side construction scattered
    # <= 4 candidate cells per input column (12 scatters + a 4x pref
    # gather + a B*OH*OW prefix over ~1.5M rows total at stage 0,
    # ~17 ms of its 27 ms — tools/bench_rb_parts.py); the bitmap form is
    # one P-row scatter plus VPU bit math on a (H, W/32) word image.
    p_out = out_cap
    if SITES_METHOD == "bitmap":
        bm = _plan_bitmap(cs, emits)                    # (B, H, W32)
        obm = _decimate_plan(bm, py, px, oh, ow)        # (B, OH, OW32)
        cc_o, cm_o = _expand_columns(obm, ow, p_out)
    else:
        # candidate-side construction (round-1 path): <= 4 candidate
        # cells per input column; same plan-major order and overflow
        # semantics as the bitmap form (equivalence fuzz-pinned)
        y, x = cs.ccoords[..., 0], cs.ccoords[..., 1]
        ylo = -(-(y + py - 2) // 2)
        yhi = (y + py) // 2
        xlo = -(-(x + px - 2) // 2)
        xhi = (x + px) // 2
        ohw = oh * ow
        occ = jnp.zeros((b * ohw + 1,), bool)
        offs_b = (jnp.arange(b, dtype=jnp.int32) * ohw)[:, None]
        for iy in range(2):
            for ix in range(2):
                cy = ylo + iy
                cx = xlo + ix
                ok = ((cy <= yhi) & (cx <= xhi) & (cy >= 0) & (cx >= 0) &
                      (cy < oh) & (cx < ow) & emits)
                key = jnp.where(ok, cy * ow + cx + offs_b, b * ohw)
                occ = occ.at[key.reshape(-1)].set(True, mode="drop")
        occ = occ[:b * ohw]

        pref = prefix_count(occ)                        # inclusive - 1
        starts = jnp.arange(b, dtype=jnp.int32) * ohw
        base = jnp.where(starts > 0,
                         pref[jnp.maximum(starts - 1, 0)] + 1, 0)

        trash = b * (p_out + 1) - 1
        cc_o = jnp.zeros((b * (p_out + 1), 2), jnp.int32)
        cm_o = jnp.zeros((b * (p_out + 1),), bool)
        for iy in range(2):
            for ix in range(2):
                cy = ylo + iy
                cx = xlo + ix
                ok = ((cy <= yhi) & (cx <= xhi) & (cy >= 0) & (cx >= 0) &
                      (cy < oh) & (cx < ow) & emits)
                key = jnp.where(ok, cy * ow + cx + offs_b, 0)
                slot = pref[key.reshape(-1)].reshape(b, p) - base[:, None]
                ok &= slot < p_out
                gslot = jnp.where(
                    ok, slot + jnp.arange(b, dtype=jnp.int32)[:, None] *
                    (p_out + 1), trash)
                cc_o = cc_o.at[gslot.reshape(-1)].set(
                    jnp.stack([cy, cx], -1).reshape(-1, 2), mode="drop")
                cm_o = cm_o.at[gslot.reshape(-1)].set(
                    ok.reshape(-1), mode="drop")
        cc_o = cc_o.reshape(b, p_out + 1, 2)[:, :p_out]
        cm_o = cm_o.reshape(b, p_out + 1)[:, :p_out]

    # output z bits: OR of the 9 input neighbors' decimated bits.
    # NOT a 9-row-per-column gather (P_out x 9 single uint32 rows ~5.4 ms
    # at stage 0, the round-5 site-gen target): the 3x3 neighbor OR is a
    # 2D DILATION of the dense per-plan-cell word image — one column-cap
    # scatter + 9 fused shifted ORs over the (padded) word image + ONE
    # P_out-row gather.  Scatter/gather rows drop ~5x.
    h2, w2 = h + 2 * py, w + 2 * px
    yx_in = cs.ccoords
    bi = jnp.arange(b, dtype=jnp.int32)[:, None]
    didx = jnp.where(
        emits,
        (bi * h2 + yx_in[..., 0] + py) * w2 + yx_in[..., 1] + px,
        jnp.int32(b * h2 * w2))
    dense = jnp.zeros((b * h2 * w2 + 1,), jnp.uint32).at[
        didx.reshape(-1)].set(dlo.reshape(-1), mode="drop")[:-1]
    dense = dense.reshape(b, h2, w2)
    dh, dw = h2 - 2, w2 - 2
    dil = dense[:, 0:dh, 0:dw]
    for g in range(3):
        for dx in range(3):
            if g or dx:
                dil = dil | dense[:, g:g + dh, dx:dx + dw]
    dflat = jnp.concatenate(
        [dil.reshape(-1), jnp.zeros((1,), jnp.uint32)])
    oidx = jnp.where(
        cm_o,
        (bi * dh + 2 * cc_o[..., 0]) * dw + 2 * cc_o[..., 1],
        jnp.int32(b * dh * dw))
    olo = dflat[oidx.reshape(-1)].reshape(b, p_out)
    olo = jnp.where(cm_o, olo, jnp.uint32(0))

    # plan-neighbor indices: still needed by the shared gather-path
    # rulebook (strided_rulebook_bitmap reuses nbr)
    nbr = _plan_neighbors(cs, 2 * cc_o[..., 0] - py,
                          2 * cc_o[..., 1] - px, cm_o,
                          pads=(py, px))                 # (B, P_out, 9)

    # row starts: exclusive per-sample prefix of per-column site counts
    counts = _popcount(olo)
    inc = prefix_sum(counts.reshape(-1))
    cstarts = jnp.arange(b, dtype=jnp.int32) * p_out
    cbase = jnp.where(cstarts > 0,
                      inc[jnp.maximum(cstarts - 1, 0)], 0)
    sb = jnp.repeat(jnp.arange(b, dtype=jnp.int32), p_out)
    start_local = ((inc - counts.reshape(-1)) - cbase[sb]).reshape(b, p_out)
    start_global = start_local + jnp.arange(
        b, dtype=jnp.int32)[:, None] * out_cap

    vcol_o, vz_o, vm_o, vyx_o = _expand_sites(olo, cm_o, counts,
                                              start_local, out_cap,
                                              ccoords=cc_o)
    cs_out = ColumnSet(ccoords=cc_o, cmask=cm_o, cstart=start_global,
                       lo=olo, hi=jnp.zeros_like(olo),
                       shape=(od, oh, ow), row_cap=out_cap)
    return cs_out, vcol_o, vz_o, vm_o, nbr, vyx_o


def strided_sites_bitmap(cs: ColumnSet, padding: Tuple[int, int, int],
                         out_cap: int):
    """Active output sites of a k3 s2 sparse conv, in column form.

    Returns (cs_out, vcol_out (B, M), vz_out (B, M), vmask_out (B, M))
    with M = P_out = out_cap (site count and column count share the
    capacity; #columns <= #sites always).  Sites are plan-major; overflow
    drops the highest plan keys."""
    return _strided_sites_impl(cs, padding, out_cap)[:4]


def strided_downsample_bitmap(cs: ColumnSet, padding: Tuple[int, int, int],
                              out_cap: int, eqmatch: bool | None = None,
                              interpret: bool | None = None,
                              return_yx: bool = False):
    """Fused sites + rulebook of a k3 s2 downsample.

    Shares the output-column plan-neighbor gather between site generation
    and the rulebook (the two queries are identical; sharing makes the
    saving structural instead of relying on XLA CSE).  Returns
    (cs_out, vcol_out, vz_out, vmask_out, gidx (B, M, 27)).

    eqmatch (default FALSE): build the rulebook with the windowed
    equality-match kernel (ops/pallas_eqmatch.py) instead of the gather
    chain.  Measured at flagship stage-0 (sorted fixture, v5e): the
    gather path wins here — 13.0 ms vs 16.2 — because it REUSES the site
    generation's plan-neighbor gather (nbr) so its marginal rulebook cost
    is ~2 ms, while the kernel pays a fresh 2048-column window pass
    (tools/bench_eqmatch.py).  The subm rulebooks (no such sharing) keep
    the kernel: 12.7 -> 7.5 stage 0, 6.0 -> 3.7 stage 1."""
    cs_out, vcol_o, vz_o, vm_o, nbr, vyx_o = _strided_sites_impl(
        cs, padding, out_cap)
    if eqmatch is None:
        eqmatch = False
    if eqmatch:
        gidx = strided_rulebook_eqmatch(cs, vyx_o, vz_o, vm_o, padding,
                                        cs_out=cs_out, vcol_out=vcol_o,
                                        nbr=nbr, interpret=interpret)
    else:
        gidx = strided_rulebook_bitmap(cs, cs_out, vcol_o, vz_o, vm_o,
                                       padding, nbr=nbr)
    if return_yx:
        return cs_out, vcol_o, vz_o, vm_o, gidx, vyx_o
    return cs_out, vcol_o, vz_o, vm_o, gidx


def strided_rulebook_bitmap(cs_in: ColumnSet, cs_out: ColumnSet,
                            vcol_out: jnp.ndarray, vz_out: jnp.ndarray,
                            vmask_out: jnp.ndarray,
                            padding: Tuple[int, int, int],
                            nbr: jnp.ndarray | None = None) -> jnp.ndarray:
    """k3 s2 strided rulebook: (B, M, 27) GLOBAL input feature rows
    (z-major (dz, dy, dx) offset order, offsets in {0, 1, 2}).

    nbr: optional precomputed (B, P_out, 9) plan-neighbor slots of the
    output columns (strided_downsample_bitmap passes the one site
    generation already gathered)."""
    b, p_in, _ = cs_in.ccoords.shape
    p_out = cs_out.ccoords.shape[1]
    m = vcol_out.shape[1]
    pz, py, px = padding
    row_cap = cs_in.row_cap
    miss_row = b * row_cap

    if nbr is None:
        nbr = _plan_neighbors(cs_in, 2 * cs_out.ccoords[..., 0] - py,
                              2 * cs_out.ccoords[..., 1] - px, cs_out.cmask,
                              pads=(py, px))             # (B, P_out, 9)
    pk = _packed_columns(cs_in)[nbr.reshape(-1)].reshape(b * p_out, 27)
    pk = jnp.concatenate(
        [pk, jnp.tile(jnp.array([[0, 0, 0]], jnp.int32), (1, 9))], axis=0)
    pkv = pk[vcol_out.reshape(-1)].reshape(b, m, 9, 3)

    sample_of = jnp.arange(b, dtype=jnp.int32)[:, None, None]
    outs = []
    for dz in range(3):
        zt = (2 * vz_out - pz + dz)[:, :, None]
        outs.append(_rows_from_packed(pkv, zt, miss_row, row_cap,
                                      sample_of))
    out = jnp.stack(outs, axis=2).reshape(b, m, 27)
    return jnp.where(vmask_out[:, :, None], out, miss_row)


def convout_sites_bitmap(cs: ColumnSet, out_cap: int):
    """Sites of the (3,1,1)/(2,1,1)/pad-0 conv_out (z-only stride)."""
    b, p, _ = cs.ccoords.shape
    d, h, w = cs.shape
    od = (d - 3) // 2 + 1
    if od <= 0 or od > 32:
        raise ValueError("bitmap conv_out needs 0 < out depth <= 32")

    olo = decimate_bits(cs.lo, cs.hi, 0, od)
    olo = jnp.where(cs.cmask, olo, jnp.uint32(0))
    counts = _popcount(olo)
    inc = prefix_sum(counts.reshape(-1))
    cstarts = jnp.arange(b, dtype=jnp.int32) * p
    cbase = jnp.where(cstarts > 0, inc[jnp.maximum(cstarts - 1, 0)], 0)
    sb = jnp.repeat(jnp.arange(b, dtype=jnp.int32), p)
    start_local = ((inc - counts.reshape(-1)) - cbase[sb]).reshape(b, p)
    start_global = start_local + jnp.arange(
        b, dtype=jnp.int32)[:, None] * out_cap

    cm_o = cs.cmask & (counts > 0)
    vcol_o, vz_o, vm_o = _expand_sites(olo, cm_o, counts, start_local,
                                       out_cap)
    cs_out = ColumnSet(ccoords=cs.ccoords, cmask=cm_o, cstart=start_global,
                       lo=olo, hi=jnp.zeros_like(olo),
                       shape=(od, h, w), row_cap=out_cap)
    return cs_out, vcol_o, vz_o, vm_o


def convout_rulebook_bitmap(cs_in: ColumnSet, vcol_out: jnp.ndarray,
                            vz_out: jnp.ndarray, vmask_out: jnp.ndarray
                            ) -> jnp.ndarray:
    """(B, M, 3) rulebook of the z-only conv_out: input rows at
    z = 2*oz + dz within the site's OWN column."""
    b, p, _ = cs_in.ccoords.shape
    m = vcol_out.shape[1]
    row_cap = cs_in.row_cap
    miss_row = b * row_cap

    pk = _packed_columns(cs_in)[vcol_out.reshape(-1)].reshape(b, m, 3)
    sample_of = jnp.arange(b, dtype=jnp.int32)[:, None]
    outs = []
    for dz in range(3):
        zt = 2 * vz_out + dz
        outs.append(_rows_from_packed(pk, zt, miss_row, row_cap,
                                      sample_of))
    out = jnp.stack(outs, axis=2)
    return jnp.where(vmask_out[:, :, None], out, miss_row)


# ------------------------------------------------- eq-match kernel path
# Windowed equality-match rulebooks (ops/pallas_eqmatch.py): the gather
# chain (plan_neighbors -> packed gather -> per-row gather -> bit math)
# becomes one Pallas kernel; an exact XLA fallback fires under lax.cond
# when any tile's window fails to cover its queries (expected zero at
# every shipped shape — tools/probe_eqmatch.py).
EQMATCH_METHOD = _os.environ.get("SRFDET_RB_EQMATCH", "auto")
EQMATCH_INTERPRET = _os.environ.get("SRFDET_EQMATCH_INTERPRET", "0") == "1"
EQMATCH_WC = int(_os.environ.get("SRFDET_EQMATCH_WC", "1024"))
EQMATCH_TM = int(_os.environ.get("SRFDET_EQMATCH_TM", "256"))
# strided queries span ~2x the input columns of a subm tile (stride-2:
# each output row reads 2-3 input rows); wc=1024 leaves ~82 OOW tiles at
# flagship stage-0 (fallback fires, paying both paths), wc=2048 covers
# with zero (tools/bench_eqmatch.py oow rows)
EQMATCH_WC_STRIDED = int(_os.environ.get("SRFDET_EQMATCH_WC_STRIDED",
                                         "2048"))


def _use_eqmatch() -> bool:
    if EQMATCH_METHOD == "eqmatch":
        return True
    if EQMATCH_METHOD == "auto":
        try:
            return jax.default_backend() not in ("cpu",) or \
                EQMATCH_INTERPRET
        except Exception:
            return False
    return False


def _flat_column_tables(cs: ColumnSet, wc: int):
    """ColumnSet -> (kwin, ctab) for the eq-match kernel: globally
    ascending column keys b*(H*W+1) + y*W + x (invalid slots hold the
    per-sample sentinel b*(H*W+1) + H*W with ZERO payload — a sentinel
    can never equal a query, and duplicate sentinels sum zero rows)."""
    from .pallas_eqmatch import build_column_tables
    b, p, _ = cs.ccoords.shape
    _, h, w = cs.shape
    key = cs.ccoords[..., 0] * w + cs.ccoords[..., 1]
    gkey = (jnp.where(cs.cmask, key, h * w) +
            jnp.arange(b, dtype=jnp.int32)[:, None] * (h * w + 1))
    cstart = jnp.where(cs.cmask, cs.cstart, 0)
    lo = jnp.where(cs.cmask, cs.lo, jnp.uint32(0))
    hi = jnp.where(cs.cmask, cs.hi, jnp.uint32(0))
    kwin, ctab, _ = build_column_tables(
        gkey.reshape(-1), cstart.reshape(-1), lo.reshape(-1),
        hi.reshape(-1), wc)
    return kwin, ctab


def _eqmatch_call(cs_in: ColumnSet, ybase, xbase, zbase, rvalid,
                  wc: int, tm: int, interpret: bool,
                  stats_only: bool = False):
    """Shared (B, Q)-query driver: pads Q per sample to a tile multiple
    (tiles must not straddle samples — the per-tile window start derives
    from the tile-min query key) and runs the kernel.
    Returns (idx (B, Q, 27), oow scalar); stats_only skips the kernel
    and returns (None, oow) — the layout probe's path."""
    from .pallas_eqmatch import eqmatch_rulebook, window_layout
    b, q = ybase.shape
    _, h, w = cs_in.shape
    row_cap = cs_in.row_cap
    kwin, ctab = _flat_column_tables(cs_in, wc)
    qp = -(-q // tm) * tm

    def flat(a, cval=0):
        return jnp.pad(a, ((0, 0), (0, qp - q)),
                       constant_values=cval).reshape(-1)

    gb = jnp.arange(b, dtype=jnp.int32)[:, None]
    rowbase = jnp.broadcast_to(gb * row_cap, (b, q))
    kbase = jnp.broadcast_to(gb * (h * w + 1), (b, q))
    if stats_only:
        _starts, oow = window_layout(
            kwin, flat(ybase, -10), flat(xbase, -10), flat(kbase),
            flat(rvalid.astype(jnp.int32)) > 0, w_in=w, h_in=h, wc=wc,
            tm=tm)
        return None, oow
    idx, oow = eqmatch_rulebook(
        kwin, ctab,
        flat(ybase, -10), flat(xbase, -10), flat(zbase),
        flat(rowbase), flat(kbase), flat(rvalid.astype(jnp.int32)),
        w_in=w, h_in=h, row_cap=row_cap, n_batch=b, wc=wc, tm=tm,
        interpret=interpret)
    return idx.reshape(b, qp, 27)[:, :q], oow


def subm_rulebook_eqmatch(cs: ColumnSet, coords: jnp.ndarray,
                          vcol: jnp.ndarray, vz: jnp.ndarray,
                          vmask: jnp.ndarray,
                          wc: int | None = None, tm: int | None = None,
                          interpret: bool | None = None) -> jnp.ndarray:
    """subm_rulebook_bitmap via the eq-match kernel (identical output).

    coords (B, V, 3) zyx of the PLAN-MAJOR-sorted voxels (the kernel
    queries cells directly — no per-voxel column gather at all); vcol/vz
    feed the exact fallback only."""
    wc = EQMATCH_WC if wc is None else wc
    tm = EQMATCH_TM if tm is None else tm
    interpret = EQMATCH_INTERPRET if interpret is None else interpret
    idx, oow = _eqmatch_call(
        cs, coords[..., 1] - 1, coords[..., 2] - 1, coords[..., 0] - 1,
        vmask, wc, tm, interpret)

    def fallback(_):
        return subm_rulebook_bitmap(cs, vcol, vz, vmask)

    return jax.lax.cond(oow == 0, lambda x: x, fallback, idx)


def strided_rulebook_eqmatch(cs_in: ColumnSet, vyx_out: jnp.ndarray,
                             vz_out: jnp.ndarray, vmask_out: jnp.ndarray,
                             padding: Tuple[int, int, int],
                             cs_out: ColumnSet | None = None,
                             vcol_out: jnp.ndarray | None = None,
                             nbr: jnp.ndarray | None = None,
                             wc: int | None = None, tm: int | None = None,
                             interpret: bool | None = None) -> jnp.ndarray:
    """strided_rulebook_bitmap via the eq-match kernel (identical
    output).  vyx_out (B, M, 2): per-site output-column (y, x) from
    _expand_sites; query bases are the input cells 2*(y,x) - (py,px),
    z taps 2*z' - pz + dz.  cs_out/vcol_out/nbr feed the fallback."""
    wc = EQMATCH_WC_STRIDED if wc is None else wc
    tm = EQMATCH_TM if tm is None else tm
    interpret = EQMATCH_INTERPRET if interpret is None else interpret
    pz, py, px = padding
    idx, oow = _eqmatch_call(
        cs_in, 2 * vyx_out[..., 0] - py, 2 * vyx_out[..., 1] - px,
        2 * vz_out - pz, vmask_out, wc, tm, interpret)

    def fallback(_):
        return strided_rulebook_bitmap(cs_in, cs_out, vcol_out, vz_out,
                                       vmask_out, padding, nbr=nbr)

    if cs_out is None:
        return idx   # no fallback available (probe use only)
    return jax.lax.cond(oow == 0, lambda x: x, fallback, idx)
