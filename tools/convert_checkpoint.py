#!/usr/bin/env python
"""Convert a reference SRFDet3D PyTorch checkpoint to this framework.

Usage:
  python tools/convert_checkpoint.py <config_name> <in.pth> <out_dir>
      [--spconv-layout KIO|OKI]

Reads the torch checkpoint (mmcv format: {'state_dict': ..., 'meta': ...}
or a bare state_dict), maps every module through
srfdet3d_tpu.utils.torch_convert.convert_reference_state_dict (sparse
encoder, VFE, SECOND, FPN, VoVNet/ResNet incl. DCN, DPG embeddings,
scanned head stack), and writes an orbax checkpoint of
{"params", "batch_stats"} consumable by:

  python tools/train.py <config> --load-from <out_dir>     # fine-tune
  python tools/test.py  <config> <out_dir> --eval ...      # evaluate

Both load paths restore the converted BATCH STATS too (frozen-BN branches
and eval fidelity need the torch running stats, not just the weights).

`--spconv-layout`: mmcv.ops sparse convs store (kz, ky, kx, in, out) =
KIO (the reference's import, the default); OKI for spconv-2.x native
exports.
"""
from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def load_torch_state_dict(path: str) -> dict:
    """torch .pth -> {name: np.ndarray} on the host."""
    import torch
    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    state = ckpt.get("state_dict", ckpt) if isinstance(ckpt, dict) else ckpt
    out = {}
    for k, v in state.items():
        if hasattr(v, "detach"):
            out[k] = v.detach().cpu().numpy()
        else:
            out[k] = np.asarray(v)
    # mmdet distributed checkpoints prefix every key with 'module.'
    if out and all(k.startswith("module.") for k in out):
        out = {k[len("module."):]: v for k, v in out.items()}
    return out


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("config", help="config factory name "
                                   "(srfdet3d_tpu.configs, e.g. "
                                   "srfdet_voxel_nusc_L)")
    ap.add_argument("input", help="reference torch checkpoint (.pth)")
    ap.add_argument("output", help="output orbax checkpoint directory")
    ap.add_argument("--spconv-layout", default="KIO",
                    choices=("KIO", "OKI"))
    args = ap.parse_args(argv)

    from srfdet3d_tpu.configs import get_config
    from srfdet3d_tpu.utils.checkpoint import _checkpointer
    from srfdet3d_tpu.utils.torch_convert import convert_reference_state_dict

    cfg = get_config(args.config)
    state = load_torch_state_dict(args.input)
    print(f"loaded {len(state)} torch tensors from {args.input}", flush=True)

    tree = convert_reference_state_dict(state, cfg,
                                        spconv_layout=args.spconv_layout)
    n_p = len(jax_leaves(tree.get("params", {})))
    n_s = len(jax_leaves(tree.get("batch_stats", {})))
    if n_p == 0:
        raise SystemExit(
            f"conversion produced ZERO parameter leaves — the checkpoint's "
            f"module names do not match config {cfg.name!r} (sample keys: "
            f"{sorted(state)[:6]}). Not writing an artifact.")
    out = os.path.abspath(args.output)
    _checkpointer().save(out, tree, force=True)
    with open(out + ".meta.json", "w") as f:
        json.dump({"config": cfg.name, "source": os.path.abspath(args.input),
                   "spconv_layout": args.spconv_layout,
                   "param_leaves": n_p, "batch_stat_leaves": n_s,
                   "converted": True}, f, indent=2)
    print(f"wrote {out} ({n_p} param leaves, {n_s} batch-stat leaves)",
          flush=True)


def jax_leaves(tree):
    import jax
    return jax.tree_util.tree_leaves(tree)


if __name__ == "__main__":
    main()
