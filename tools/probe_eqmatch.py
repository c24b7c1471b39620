"""Window-coverage probe for the eq-match rulebook kernel (CPU).

Walks REAL voxelizer output (synthetic points -> hard voxelize ->
plan-major voxels, exactly the encoder's input) through every stage's
query layout and reports, per (stage, wc, tm), how many tiles would fall
out of window — i.e. how often the exact fallback would fire and the
model would pay both paths.  The PERF.md round-2 lesson: an exactness
fallback that silently re-creates the wall it replaces needs a layout
diagnostic at REAL shapes.

    env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
        python tools/probe_eqmatch.py [occupancy=0.5]
"""
import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from srfdet3d_tpu.configs import srfdet_voxel_nusc_L
from srfdet3d_tpu.ops import bitmap_rulebook as br
from srfdet3d_tpu.ops.voxelize import voxelize_points_batched


def probe(label, cs, ybase, xbase, zbase, rvalid, settings):
    for wc, tm in settings:
        _idx, oow = br._eqmatch_call(cs, ybase, xbase, zbase, rvalid,
                                     wc, tm, False, stats_only=True)
        n_tiles = -(-ybase.shape[1] // tm) * 3
        print(f"  {label:28s} wc={wc:5d} tm={tm:4d}: "
              f"oow {int(oow):5d} / {n_tiles} (tile,dy) pairs", flush=True)


def main():
    occ = float(sys.argv[1]) if len(sys.argv) > 1 else 0.5
    cfg = srfdet_voxel_nusc_L()
    spec = cfg.voxelization
    rng = np.random.default_rng(0)
    n = int(cfg.points_cap * occ)
    pts = np.zeros((1, cfg.points_cap, cfg.points_dim), np.float32)
    lo, hi = cfg.pc_range[:3], cfg.pc_range[3:6]
    # radially-weighted points (lidar-like: dense near, sparse far)
    r = np.abs(rng.normal(0, 0.35, n)) * (hi[0] - 0)
    th = rng.uniform(0, 2 * np.pi, n)
    pts[0, :n, 0] = np.clip(r * np.cos(th), lo[0], hi[0] - 1e-3)
    pts[0, :n, 1] = np.clip(r * np.sin(th), lo[1], hi[1] - 1e-3)
    pts[0, :n, 2] = rng.uniform(lo[2], hi[2], n)
    mask = np.zeros((1, cfg.points_cap), bool)
    mask[0, :n] = True

    vox = voxelize_points_batched(jnp.asarray(pts), jnp.asarray(mask),
                                  spec)
    coords, vmask = vox.voxel_coords, vox.voxel_mask
    print(f"occ={occ}: {int(vmask.sum())} voxels "
          f"(cap {spec.max_voxels})", flush=True)

    shape = spec.sparse_shape
    cs, vcol, vz = br.build_columns(coords, vmask, shape)
    subm_settings = ((1024, 256), (768, 256), (512, 256))
    strided_settings = ((2048, 256), (1536, 256), (1024, 256))

    pads = [(0, 1, 1), (0, 1, 1), (1, 1, 1)]  # nusc chain
    caps = tuple(cfg.middle.capacities)
    for stage in range(4):
        probe(f"subm stage{stage}", cs, coords[..., 1] - 1,
              coords[..., 2] - 1, coords[..., 0] - 1, vmask,
              subm_settings)
        if stage < 3:
            pad = pads[stage]
            out = br.strided_downsample_bitmap(cs, pad, caps[stage],
                                               eqmatch=False,
                                               return_yx=True)
            cs_n, vcol, vz, vmask, _g, vyx = out
            probe(f"strided down{stage}", cs, 2 * vyx[..., 0] - pad[1],
                  2 * vyx[..., 1] - pad[2], 2 * vz - pad[0], vmask,
                  strided_settings)
            cs = cs_n
            coords = jnp.concatenate([vz[..., None], vyx], axis=-1)


if __name__ == "__main__":
    main()
