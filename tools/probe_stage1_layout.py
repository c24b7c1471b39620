"""Inspect the stage-1 subm rulebook's index layout: monotonicity of the
center offset, per-tile z-group spans vs the one-hot window, and where
the out-of-window entries come from."""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp

from srfdet3d_tpu.configs import srfdet_voxel_nusc_L  # noqa: E402
from srfdet3d_tpu.models.sparse_encoder import (  # noqa: E402
    _BitmapRulebooks, down_pads, sort_plan_major)


def main():
    cfg = srfdet_voxel_nusc_L()
    mid = cfg.middle
    spec = cfg.voxelization
    shape = tuple(spec.sparse_shape)
    v = cfg.voxels_cap
    rng = np.random.default_rng(0)
    d, h, w = shape
    keys = np.sort(rng.choice(d * h * w, size=v, replace=False))
    coords = np.stack([keys // (h * w), (keys // w) % h, keys % w],
                      -1).astype(np.int32)[None]
    mask = np.ones((1, v), bool)
    feats = np.zeros((1, v, mid.in_channels), np.float32)

    f, c, m = sort_plan_major(jnp.asarray(feats), jnp.asarray(coords),
                              jnp.asarray(mask), shape)
    rb = _BitmapRulebooks(c, m, shape)
    pads = down_pads(mid.block_type, mid.encoder_channels,
                     mid.encoder_paddings)
    rb.subm()
    gidx = rb.downsample(pads[0], mid.capacities[0])
    n_in = v
    print("down0 gidx center monotone:",
          bool(np.all(np.diff(np.asarray(
              gidx[0, :, 13])[np.asarray(rb.mask[0])]) >= 0)))

    g1 = np.asarray(rb.subm()[0])          # (60000, 27)
    msk = np.asarray(rb.mask[0])
    n = mid.capacities[0]
    center = g1[:, 13]
    valid = msk & (center < n)
    print(f"stage1 sites valid={valid.sum()} of {n}")
    cv = center[valid]
    mono = np.all(np.diff(cv) >= 0)
    print("center offset monotone over valid sites:", bool(mono))
    if not mono:
        bad = np.where(np.diff(cv) < 0)[0]
        print(f"  {bad.size} inversions; first at valid-site {bad[0]}: "
              f"{cv[bad[0]]} -> {cv[bad[0] + 1]}")
    # does row index == site position (identity layout)?
    pos = np.arange(n)[valid]
    print("center == own site position:", bool(np.all(cv == pos)),
          "max |delta|:", int(np.abs(cv - pos).max()))

    # per-tile z-group spans at the bwd layout (pack=4, tm=256)
    pack, tm, k = 4, 256, 27
    mp = ((n + tm - 1) // tm) * tm
    idx = np.pad(g1, ((0, mp - n), (0, 0)), constant_values=n)
    pidx = idx // pack
    tiles = pidx.reshape(-1, tm, k)
    misst = (idx >= n).reshape(-1, tm, k)
    for g, name in ((0, "dz=-1"), (1, "dz=0"), (2, "dz=+1")):
        sel = tiles[:, :, g * 9:(g + 1) * 9]
        ms = misst[:, :, g * 9:(g + 1) * 9]
        lo = np.where(ms, 2**30, sel).min(axis=(1, 2))
        hi = np.where(ms, -1, sel).max(axis=(1, 2))
        span = np.where(hi >= 0, hi - lo, 0)
        print(f"group {name}: span p50={np.percentile(span, 50):.0f} "
              f"p90={np.percentile(span, 90):.0f} max={span.max()} "
              f"(window wp=256 packed rows)")


if __name__ == "__main__":
    main()
