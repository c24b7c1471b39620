"""Check: (1) out-of-window tile counts of the REAL flagship rulebooks at
the default one-hot kernel layout; (2) chaos control — perturb the input
points by 1e-6 on the pure XLA path and measure the logits deviation.

Together these decide whether the onehot-vs-xla logit deviation (0.92) is
correction overflow (a bug) or benign accumulation-order noise amplified
by a random-init network.
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from __graft_entry__ import entry  # noqa: E402
import srfdet3d_tpu.ops.sparse_conv as sc  # noqa: E402


def main():
    print("device:", jax.devices()[0], flush=True)
    forward, (variables, batch) = entry()

    # (2) chaos control first (cheap: reuses the cached xla executable)
    sc.GATHER_METHOD = "xla"

    def fwd(v, b):
        return forward(v, b)

    jf = jax.jit(fwd)
    out0 = jf(variables, batch)
    pts = batch["points"]
    noise = (jnp.asarray(
        np.random.default_rng(1).normal(size=pts.shape), jnp.float32)
        * 1e-6)
    b2 = dict(batch)
    b2["points"] = pts + noise * batch["points_mask"][..., None]
    out1 = jf(variables, b2)
    d_log = float(jnp.max(jnp.abs(out0[0] - out1[0])))
    d_box = float(jnp.max(jnp.abs(out0[1] - out1[1])))
    print(f"1e-6 input perturbation -> logits diff {d_log:.3e}, "
          f"boxes diff {d_box:.3e}", flush=True)

    # (1) real-rulebook OOW tile counts: rebuild the stage-0 rulebook from
    # the voxelizer output and measure window coverage
    from srfdet3d_tpu.ops.voxelize import voxelize_points
    from srfdet3d_tpu.ops.sparse_conv import subm_gather_indices_batched
    from srfdet3d_tpu.configs import srfdet_voxel_nusc_L
    cfg = srfdet_voxel_nusc_L()
    spec = cfg.voxelization
    vox = jax.jit(lambda p, m: jax.vmap(
        lambda x, y: voxelize_points(x, y, spec))(p, m))(
        batch["points"], batch["points_mask"])
    coords, mask = vox.voxel_coords, vox.voxel_mask
    gidx = jax.jit(lambda c, m: subm_gather_indices_batched(
        c, m, tuple(spec.sparse_shape), 3))(coords, mask)
    b, v, k = gidx.shape
    n = b * v
    idx = np.asarray(gidx.reshape(b * v, k))

    for tm, wrows in ((512, 2048), (512, 4096)):
        for pack in (8, 16):
            wp = wrows // pack
            pad = (-n) % tm
            ip = np.pad(idx, ((0, pad), (0, 0)), constant_values=n)
            tiles = (ip // pack).reshape(-1, tm, k)
            miss = ip.reshape(-1, tm, k) >= n
            oow_tiles = 0
            worst = 0
            for g in range(3):
                sel = tiles[:, :, g * 9:(g + 1) * 9]
                msel = miss[:, :, g * 9:(g + 1) * 9]
                valid = np.where(~msel, sel, (n // pack))
                s = valid.min(axis=(1, 2))
                s = (s // 16) * 16
                rel = sel - s[:, None, None]
                oow = ((rel < 0) | (rel >= wp)) & ~msel
                per_tile = oow.sum(axis=(1, 2))
                oow_tiles = max(oow_tiles, int((per_tile > 0).sum()))
                worst = max(worst, int(per_tile.max()))
            print(f"stage0 tm={tm} window={wrows} pack={pack}: "
                  f"tiles-with-OOW <= {oow_tiles} (of {tiles.shape[0]}), "
                  f"worst tile {worst} entries", flush=True)


if __name__ == "__main__":
    main()
