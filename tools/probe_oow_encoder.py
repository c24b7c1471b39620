"""Count out-of-window one-hot entries for EVERY conv of the flagship
encoder at real bitmap-rulebook layouts (CPU; pure integer math).

The one-hot kernels repair out-of-window rows tile-granularly and
lax.cond into an exact FULL-RANGE XLA correction when more than
`correction_tiles` tiles carry OOW entries (ADVICE r1 fix).  That
fallback re-creates the original XLA gather/scatter wall *in addition
to* the kernel — silently.  tools/check_oow.py certified zero OOW for
the STAGE-0 subm rulebook only; this probe walks the whole conv plan
(basicblock layout) with the exact `_window_layout` + (pack, wp, tm)
each conv actually uses in forward AND backward, and prints whether the
full correction would fire.

Usage: JAX_PLATFORMS=cpu python tools/probe_oow_encoder.py [occ]
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

import srfdet3d_tpu.ops.sparse_conv as sc  # noqa: E402
from srfdet3d_tpu.configs import srfdet_voxel_nusc_L  # noqa: E402
from srfdet3d_tpu.models.sparse_encoder import (  # noqa: E402
    _BitmapRulebooks, down_pads, sort_plan_major)
from srfdet3d_tpu.ops.pallas_onehot import (  # noqa: E402
    _default_groups, _padded_rows, _snap_of, _window_layout)


def layout_stats(gidx, n, cin, dtype, correction_tiles=16):
    """Uses the kernels' own (pack, wp, tm) derivation
    (sparse_conv.onehot_tile_params) and counts OOW entries under the
    shared _window_layout at the active ONEHOT_GROUPS mode."""
    m, k = gidx.shape
    if dtype == "bwd":  # backward: f32 one-hot, 4 B budget
        pack, wp, tm = sc.onehot_tile_params(cin, k, bwd=True)
        snap = _snap_of(jnp.float32)
    else:
        pack, wp, tm = sc.onehot_tile_params(cin, k, bwd=False)
        snap = _snap_of(dtype)
    mp = ((m + tm - 1) // tm) * tm
    idx = jnp.pad(gidx, ((0, mp - m), (0, 0)), constant_values=n)
    np_rows = _padded_rows(n, pack, snap, wp)
    groups = _default_groups(k, sc.ONEHOT_GROUPS)
    _, _, _, miss, in_win = _window_layout(
        idx, n, pack, snap, wp, np_rows, tm, groups)
    oow = np.asarray(~in_win & ~miss)
    counts = oow.sum(axis=(1, 2))
    tiles_with = int((counts > 0).sum())
    total = int(counts.sum())
    covered = int(np.sort(counts)[::-1][:correction_tiles].sum())
    return dict(pack=pack, wp=wp, tm=tm, n_tiles=mp // tm,
                tiles_with=tiles_with, total=total,
                full_fires=covered != total)


def main():
    occ = float(sys.argv[1]) if len(sys.argv) > 1 else 1.0
    cfg = srfdet_voxel_nusc_L()
    mid = cfg.middle
    spec = cfg.voxelization
    shape = tuple(spec.sparse_shape)
    v = cfg.voxels_cap
    n_act = int(v * occ)
    rng = np.random.default_rng(0)
    d, h, w = shape
    keys = np.sort(rng.choice(d * h * w, size=n_act, replace=False))
    coords = np.zeros((1, v, 3), np.int32)
    coords[0, :n_act] = np.stack(
        [keys // (h * w), (keys // w) % h, keys % w], -1)
    mask = np.zeros((1, v), bool)
    mask[0, :n_act] = True
    feats = np.zeros((1, v, mid.in_channels), np.float32)

    f, c, m = sort_plan_major(jnp.asarray(feats), jnp.asarray(coords),
                              jnp.asarray(mask), shape)
    rb = _BitmapRulebooks(c, m, shape)
    pads = down_pads(mid.block_type, mid.encoder_channels,
                     mid.encoder_paddings)

    # conv plan: (label, kind, cin) walking the basicblock layout
    plan = []
    plan.append(("conv_input", "subm", mid.in_channels))
    ds = 0
    n_stages = len(mid.encoder_channels)
    ch_in = mid.base_channels
    for i, blocks in enumerate(mid.encoder_channels):
        for j, out_ch in enumerate(blocks):
            if j == len(blocks) - 1 and i != n_stages - 1:
                plan.append((f"down{i}", "down", ch_in))
            else:
                plan.append((f"bb{i}_{j}a", "subm", ch_in))
                plan.append((f"bb{i}_{j}b", "subm", out_ch))
            ch_in = out_ch
    plan.append(("conv_out", "convout", ch_in))

    gidx_subm = rb.subm()
    ds = 0
    for label, kind, cin in plan:
        if kind == "down":
            gidx = rb.downsample(pads[ds], mid.capacities[ds])
            ds += 1
            n_in_rows = gidx_subm.shape[1]   # gathers FROM the input stage
            gidx_subm = rb.subm()
        elif kind == "convout":
            n_in_rows = gidx_subm.shape[1]
            gidx = rb.convout(mid.capacities[-1])
        else:
            gidx = gidx_subm
            n_in_rows = gidx.shape[1]
        b, mrows, k = gidx.shape
        n = b * n_in_rows
        flat = np.asarray(gidx.reshape(b * mrows, k))
        rows = b * mrows * k
        use = rows >= sc.ONEHOT_MIN_GATHER_ROWS and cin <= sc.ONEHOT_MAX_CIN
        if not use:
            print(f"{label:12s} cin={cin:3d} rows={rows / 1e6:.2f}M  "
                  f"-> XLA path (below kernel gate)", flush=True)
            continue
        fs = layout_stats(jnp.asarray(flat), n, cin, jnp.float32)
        bs = layout_stats(jnp.asarray(flat), n, cin, "bwd")
        print(f"{label:12s} cin={cin:3d} rows={rows / 1e6:.2f}M  "
              f"fwd[pack={fs['pack']} wp={fs['wp']} tm={fs['tm']} "
              f"oow_tiles={fs['tiles_with']}/{fs['n_tiles']} "
              f"total={fs['total']} FULL={fs['full_fires']}]  "
              f"bwd[tm={bs['tm']} oow_tiles={bs['tiles_with']} "
              f"total={bs['total']} FULL={bs['full_fires']}]", flush=True)


if __name__ == "__main__":
    main()
