"""Decompose the bitmap rulebook walk cost (bench_encoder_split measured
the full walk at 73.7 ms — more than half the encoder forward).

Times each piece of the stage-0 subm rulebook + the stage-0 downsample at
flagship shapes, each as its own cached jitted program:

  build    build_columns (+ plan_table)
  nbr      plan_neighbors9 over all columns (3 slice-gathers x 3 dy)
  pk       _packed_columns[nbr] gather        (~1.08M 12-byte rows)
  pkv      pk[vcol] per-voxel gather          (~1.08M 36-byte rows)
  bits     _rows_from_packed z bit-math alone (no gathers)
  subm     full subm_rulebook_bitmap stage 0
  down     strided_downsample_bitmap stage 0 -> 1
  subm1    subm_rulebook_bitmap stage 1 (60k)

    python tools/bench_rb_parts.py
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from srfdet3d_tpu.configs import srfdet_voxel_nusc_L  # noqa: E402
from srfdet3d_tpu.ops import bitmap_rulebook as br  # noqa: E402
from tools.bench_encoder_grad_parts import _flagship_batch, _time  # noqa


def main():
    cfg = srfdet_voxel_nusc_L()
    (d, h, w), (_feats, coords, mask) = _flagship_batch(cfg)
    caps = tuple(cfg.middle.capacities)
    print(f"device: {jax.devices()[0]} grid=({d},{h},{w})", flush=True)
    b = coords.shape[0]

    def _sum(*xs):
        return sum(jnp.sum(jnp.asarray(x).astype(jnp.float32)) for x in xs)

    @jax.jit
    def build(coords, mask):
        cs, vcol, vz = br.build_columns(coords, mask, (d, h, w))
        t = br.plan_table(cs)
        return _sum(cs.cstart, cs.lo, vcol, vz, t)
    _time(lambda: build(coords, mask), "build_columns+plan_table")

    cs, vcol, vz = jax.jit(
        lambda c, m: br.build_columns(c, m, (d, h, w)))(coords, mask)
    table = jax.jit(br.plan_table)(cs)
    p = cs.ccoords.shape[1]

    @jax.jit
    def nbr_fn(cs, table):
        return br.plan_neighbors9(
            table, cs.ccoords[..., 0] - 1, cs.ccoords[..., 1] - 1,
            cs.cmask, (h, w), b, p)
    _time(lambda: _sum(nbr_fn(cs, table)), "nbr (plan_neighbors9 stage0)")
    nbr = nbr_fn(cs, table)

    @jax.jit
    def pk_fn(cs, nbr):
        return br._packed_columns(cs)[nbr.reshape(-1)].reshape(b * p, 27)
    _time(lambda: _sum(pk_fn(cs, nbr)), "pk gather (cols x 9)")
    pk = pk_fn(cs, nbr)

    @jax.jit
    def pkv_fn(pk, vcol):
        v = vcol.shape[1]
        pk1 = jnp.concatenate(
            [pk, jnp.tile(jnp.array([[0, 0, 0]], jnp.int32), (1, 9))],
            axis=0)
        return pk1[vcol.reshape(-1)].reshape(b, v, 9, 3)
    _time(lambda: _sum(pkv_fn(pk, vcol)), "pkv gather (voxels x 9)")
    pkv = pkv_fn(pk, vcol)

    @jax.jit
    def bits_fn(pkv, vz, mask):
        sample_of = jnp.arange(b, dtype=jnp.int32)[:, None, None]
        outs = []
        for dz in (-1, 0, 1):
            zt = (vz + dz)[:, :, None]
            outs.append(br._rows_from_packed(
                pkv, zt, b * cs.row_cap, cs.row_cap, sample_of))
        out = jnp.stack(outs, axis=2).reshape(b, vz.shape[1], 27)
        return jnp.where(mask[:, :, None], out, b * cs.row_cap)
    _time(lambda: _sum(bits_fn(pkv, vz, mask)), "bit math (rows_from_packed)")

    @jax.jit
    def subm_fn(cs, vcol, vz, mask):
        return br.subm_rulebook_bitmap(cs, vcol, vz, mask)
    _time(lambda: _sum(subm_fn(cs, vcol, vz, mask)), "subm rulebook stage0")

    @jax.jit
    def down_fn(cs):
        cs_o, vcol_o, vz_o, vm_o, gidx = br.strided_downsample_bitmap(
            cs, (1, 1, 1), caps[0])
        return _sum(vcol_o, vz_o, gidx), (cs_o, vcol_o, vz_o, vm_o)
    _time(lambda: down_fn(cs)[0], "downsample stage0->1 (sites+rulebook)")
    cs1, vcol1, vz1, vm1 = jax.jit(lambda c: down_fn(c)[1])(cs)

    @jax.jit
    def subm1_fn(cs1, vcol1, vz1, vm1):
        return br.subm_rulebook_bitmap(cs1, vcol1, vz1, vm1)
    _time(lambda: _sum(subm1_fn(cs1, vcol1, vz1, vm1)),
          "subm rulebook stage1")


if __name__ == "__main__":
    main()
