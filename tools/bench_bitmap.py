"""Per-piece timings of the bitmap-column rulebook backend at flagship
scale (srfdet_voxel_nusc_L shapes, one chip, batch 1, full occupancy).

Answers: where do the bitmap backend's ~X ms go, piece by piece, vs the
dense-table backend it replaces (ops/sparse_conv.py)."""

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

from srfdet3d_tpu.ops.bitmap_rulebook import (
    build_columns, convout_rulebook_bitmap, convout_sites_bitmap,
    sort_plan_major, strided_rulebook_bitmap, strided_sites_bitmap,
    subm_rulebook_bitmap)
from srfdet3d_tpu.configs import srfdet_voxel_nusc_L
from tools.bench_stages import make_stage, time_fn, readback


def main():
    print("device:", jax.devices()[0], flush=True)
    rb = readback()
    print(f"readback {rb:.1f} ms", flush=True)
    cfg = srfdet_voxel_nusc_L()
    spec = cfg.voxelization
    caps = cfg.middle.capacities
    rng = np.random.default_rng(0)

    shape0 = tuple(spec.sparse_shape)
    v0 = spec.max_voxels
    c0, m0 = make_stage(rng, shape0, v0)
    f0 = jnp.asarray(rng.standard_normal((1, v0, 16), np.float32))

    t = time_fn(jax.jit(
        lambda: sort_plan_major(f0, c0, m0, shape0)[0]))
    print(f"sort_plan_major V={v0}: {t - rb:.1f} ms", flush=True)

    f1, c1, m1 = jax.jit(
        lambda: sort_plan_major(f0, c0, m0, shape0))()

    t = time_fn(jax.jit(lambda: build_columns(c1, m1, shape0)[1]))
    print(f"build_columns: {t - rb:.1f} ms", flush=True)

    # full chain, stage by stage, one jit per piece to isolate
    cs, vcol, vz = jax.jit(lambda: build_columns(c1, m1, shape0))()
    mask = m1
    pads = [(1, 1, 1), (1, 1, 1), (0, 1, 1)]
    for si in range(4):
        t = time_fn(jax.jit(
            lambda cs=cs, vcol=vcol, vz=vz, mask=mask:
            subm_rulebook_bitmap(cs, vcol, vz, mask)))
        nvox = vcol.shape[1]
        print(f"stage{si} subm rulebook (V={nvox}): {t - rb:.1f} ms",
              flush=True)
        if si == 3:
            break
        pad, cap = pads[si], caps[si]
        sites = jax.jit(lambda cs=cs, pad=pad, cap=cap:
                        strided_sites_bitmap(cs, pad, cap))
        t = time_fn(lambda: sites()[1])
        print(f"stage{si} strided sites (cap={cap}): {t - rb:.1f} ms",
              flush=True)
        cs_o, vcol_o, vz_o, vm_o = sites()
        t = time_fn(jax.jit(
            lambda cs=cs, cs_o=cs_o, vcol_o=vcol_o, vz_o=vz_o, vm_o=vm_o,
            pad=pad:
            strided_rulebook_bitmap(cs, cs_o, vcol_o, vz_o, vm_o, pad)))
        print(f"stage{si} strided rulebook: {t - rb:.1f} ms", flush=True)
        cs, vcol, vz, mask = cs_o, vcol_o, vz_o, vm_o

    co = jax.jit(lambda cs=cs, cap=caps[3]: convout_sites_bitmap(cs, cap))
    t = time_fn(lambda: co()[1])
    print(f"convout sites: {t - rb:.1f} ms", flush=True)
    cs2, vcol2, vz2, vm2 = co()
    t = time_fn(jax.jit(
        lambda: convout_rulebook_bitmap(cs, vcol2, vz2, vm2)))
    print(f"convout rulebook: {t - rb:.1f} ms", flush=True)

    # one fused jit of the whole rulebook machinery (what the encoder pays)
    def whole():
        f, c, m = sort_plan_major(f0, c0, m0, shape0)
        cs, vcol, vz = build_columns(c, m, shape0)
        outs = [subm_rulebook_bitmap(cs, vcol, vz, m)]
        mk = m
        for si in range(3):
            cs_o, vcol_o, vz_o, vm_o = strided_sites_bitmap(
                cs, pads[si], caps[si])
            outs.append(strided_rulebook_bitmap(cs, cs_o, vcol_o, vz_o,
                                                vm_o, pads[si]))
            cs, vcol, vz, mk = cs_o, vcol_o, vz_o, vm_o
            outs.append(subm_rulebook_bitmap(cs, vcol, vz, mk))
        cs2, vcol2, vz2, vm2 = convout_sites_bitmap(cs, caps[3])
        outs.append(convout_rulebook_bitmap(cs, vcol2, vz2, vm2))
        # keep every rulebook live (no DCE): fold a cheap reduction of each
        return sum(jnp.sum(o[:, ::4097, 0]) for o in outs)

    t = time_fn(jax.jit(whole))
    print(f"WHOLE bitmap machinery (sort+cols+4 subm+3 strided+convout): "
          f"{t - rb:.1f} ms", flush=True)


if __name__ == "__main__":
    main()
