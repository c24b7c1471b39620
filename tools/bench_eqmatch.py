"""Eq-match kernel vs gather-chain rulebook timings at flagship shapes.

  subm0/subm1      old gather path vs eqmatch kernel (stage 0 / 1)
  down0 parts      full downsample, site-gen only (rulebook share),
                   and the site-gen's nbr+dpk gather share

    python tools/bench_eqmatch.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from srfdet3d_tpu.configs import srfdet_voxel_nusc_L  # noqa: E402
from srfdet3d_tpu.ops import bitmap_rulebook as br  # noqa: E402
from tools.bench_encoder_grad_parts import _flagship_batch, _time  # noqa


def main():
    cfg = srfdet_voxel_nusc_L()
    (d, h, w), (_f, coords, mask) = _flagship_batch(cfg)
    caps = tuple(cfg.middle.capacities)
    shape = (d, h, w)
    print(f"device: {jax.devices()[0]}", flush=True)

    cs, vcol, vz = jax.jit(
        lambda c, m: br.build_columns(c, m, shape))(coords, mask)

    def _sum(x):
        return jnp.sum(jnp.asarray(x).astype(jnp.float32))

    @jax.jit
    def subm_old(cs, vcol, vz, mask):
        return _sum(br.subm_rulebook_bitmap(cs, vcol, vz, mask))

    @jax.jit
    def subm_eq(cs, coords, vcol, vz, mask):
        return _sum(br.subm_rulebook_eqmatch(cs, coords, vcol, vz, mask))

    print(f"subm0 old: {_time(lambda: subm_old(cs, vcol, vz, mask), 'x'):.1f} ms",
          flush=True)
    print(f"subm0 eqmatch: "
          f"{_time(lambda: subm_eq(cs, coords, vcol, vz, mask), 'x'):.1f} ms",
          flush=True)

    pad0 = (0, 1, 1)

    @jax.jit
    def down_old(cs):
        out = br.strided_downsample_bitmap(cs, pad0, caps[0], eqmatch=False)
        return _sum(out[4]) + _sum(out[2])

    @jax.jit
    def down_eq(cs):
        out = br.strided_downsample_bitmap(cs, pad0, caps[0], eqmatch=True)
        return _sum(out[4]) + _sum(out[2])

    @jax.jit
    def sites_only(cs):
        out = br.strided_sites_bitmap(cs, pad0, caps[0])
        return _sum(out[2]) + _sum(out[3])

    print(f"down0 old (sites+rulebook): {_time(lambda: down_old(cs), 'x'):.1f} ms",
          flush=True)
    print(f"down0 eqmatch (sites+rulebook): "
          f"{_time(lambda: down_eq(cs), 'x'):.1f} ms", flush=True)
    print(f"down0 sites only: {_time(lambda: sites_only(cs), 'x'):.1f} ms",
          flush=True)

    # stage-1 subm on the downsampled set
    cs1, vcol1, vz1, vm1, _g = jax.jit(
        lambda cs: br.strided_downsample_bitmap(cs, pad0, caps[0],
                                                eqmatch=False))(cs)
    coords1 = jnp.concatenate(
        [vz1[..., None],
         jnp.zeros_like(vz1)[..., None], jnp.zeros_like(vz1)[..., None]],
        axis=-1)
    # proper coords for stage1 need vyx; use return_yx
    out = jax.jit(lambda cs: br.strided_downsample_bitmap(
        cs, pad0, caps[0], eqmatch=False, return_yx=True))(cs)
    cs1, vcol1, vz1, vm1, _g1, vyx1 = out
    coords1 = jnp.concatenate([vz1[..., None], vyx1], axis=-1)

    @jax.jit
    def subm1_old(cs1, vcol1, vz1, vm1):
        return _sum(br.subm_rulebook_bitmap(cs1, vcol1, vz1, vm1))

    @jax.jit
    def subm1_eq(cs1, coords1, vcol1, vz1, vm1):
        return _sum(br.subm_rulebook_eqmatch(cs1, coords1, vcol1, vz1,
                                             vm1))

    print(f"subm1 old: "
          f"{_time(lambda: subm1_old(cs1, vcol1, vz1, vm1), 'x'):.1f} ms",
          flush=True)
    print(f"subm1 eqmatch: "
          f"{_time(lambda: subm1_eq(cs1, coords1, vcol1, vz1, vm1), 'x'):.1f} ms",
          flush=True)

    # OOW diagnostics: nonzero means the exact fallback fires and the
    # call pays BOTH paths — window/tile sizes must change, not ship
    for label, (csq, yb, xb, zb, vm) in {
        "subm0": (cs, coords[..., 1] - 1, coords[..., 2] - 1,
                  coords[..., 0] - 1, mask),
        "down0": (cs, 2 * vyx1[..., 0] - pad0[1],
                  2 * vyx1[..., 1] - pad0[2], 2 * vz1 - pad0[0], vm1),
        "subm1": (cs1, coords1[..., 1] - 1, coords1[..., 2] - 1,
                  coords1[..., 0] - 1, vm1),
    }.items():
        for wc, tm in ((1024, 256), (1024, 128), (2048, 256), (512, 128)):
            _idx, oow = jax.jit(
                lambda csq=csq, yb=yb, xb=xb, zb=zb, vm=vm, wc=wc, tm=tm:
                br._eqmatch_call(csq, yb, xb, zb, vm, wc, tm, False))()
            print(f"oow[{label} wc={wc} tm={tm}] = {int(oow)} tiles",
                  flush=True)


if __name__ == "__main__":
    main()
