#!/usr/bin/env python
"""Evaluation CLI (mirrors reference tools/test.py surface).

Usage:
  python tools/test.py <config_name> <checkpoint> [--eval mAP|kitti|waymo]
      [--synthetic] [--out results.pkl] [--batch-size B]
      [--data-root PATH] [--ann-file PATH] [--cfg-options k=v ...]

Runs inference with the config's test_cfg (rotated NMS etc.), optionally
dumps per-frame results to a pickle (reference --out), and evaluates with
the native metric implementations.  `--eval-from-pkl results.pkl` re-runs
evaluation from a dump without inference (reference
tools/eval_results_from_pkl.py).
"""

from __future__ import annotations

import argparse
import os
import pickle
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def evaluate(cfg, gts, preds, protocol: str = "auto"):
    """protocol: auto (= cfg.dataset) | mAP/nuscenes | kitti | waymo
    (reference --eval values, tools/test.py:243-252)."""
    from srfdet3d_tpu.evals import kitti_eval, nuscenes_eval, waymo_eval
    kind = cfg.dataset if protocol in ("auto", None) else \
        {"mAP": "nuscenes"}.get(protocol, protocol)
    if kind == "nuscenes":
        return nuscenes_eval(gts, preds, cfg.class_names)
    if kind == "kitti":
        return kitti_eval(gts, preds, cfg.class_names)
    if kind == "waymo":
        return waymo_eval(gts, preds, cfg.class_names)
    raise SystemExit(f"unknown --eval protocol {protocol!r}")


def run_inference_eval(cfg, dataset, state, eval_step, batch_size: int,
                       protocol: str = "auto", out: str | None = None):
    """Inference over `dataset` + native metric evaluation.

    Shared by this CLI and tools/train.py's --eval-interval hook (the
    reference's mmcv EvalHook, cfg evaluation=dict(interval=1),
    srfdet_voxel_nusc_L.py:370).  Returns the metric dict; optionally
    dumps {gts, preds} to `out` (reference --out pickle)."""
    import jax.numpy as jnp

    from srfdet3d_tpu.data import data_loader

    names = np.asarray(cfg.class_names)
    gts, preds = [], []
    # drop_last=False: every validation frame scores (the ragged tail
    # batch costs one extra jit specialization)
    for batch in data_loader(dataset, batch_size, shuffle=False,
                             num_workers=2, drop_last=False):
        out_b = eval_step(state, {k: jnp.asarray(v)
                                  for k, v in batch.items()
                                  if k not in ("gt_boxes", "gt_labels",
                                               "gt_mask")})
        boxes = np.asarray(out_b["boxes"])
        scores = np.asarray(out_b["scores"])
        labels = np.asarray(out_b["labels"])
        valid = np.asarray(out_b["valid"])
        for i in range(boxes.shape[0]):
            v = valid[i]
            pb = boxes[i][v].copy()
            pb[:, 2] += 0.5 * pb[:, 5]       # bottom -> gravity center
            preds.append({"boxes": pb, "scores": scores[i][v],
                          "labels_name": names[labels[i][v]]})
            gm = np.asarray(batch["gt_mask"][i])
            gb = np.asarray(batch["gt_boxes"][i])[gm]
            gl = np.asarray(batch["gt_labels"][i])[gm]
            gts.append({"boxes": gb, "labels_name": names[gl]})

    if out:
        with open(out, "wb") as f:
            pickle.dump({"gts": gts, "preds": preds}, f)
        print(f"dumped {len(preds)} frames to {out}", flush=True)
    return evaluate(cfg, gts, preds, protocol)


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("config")
    ap.add_argument("checkpoint", nargs="?", default=None)
    ap.add_argument("--eval", default="auto")
    ap.add_argument("--out", default=None)
    ap.add_argument("--eval-from-pkl", default=None)
    ap.add_argument("--synthetic", action="store_true")
    ap.add_argument("--synthetic-length", type=int, default=8)
    ap.add_argument("--batch-size", type=int, default=1)
    ap.add_argument("--data-root", default="data/nuscenes")
    ap.add_argument("--ann-file", default=None)
    ap.add_argument("--cfg-options", nargs="*", default=None)
    args = ap.parse_args()

    from srfdet3d_tpu.configs import get_config
    from tools.train import apply_cfg_options
    cfg = apply_cfg_options(get_config(args.config), args.cfg_options)

    if args.eval_from_pkl:
        with open(args.eval_from_pkl, "rb") as f:
            dump = pickle.load(f)
        res = evaluate(cfg, dump["gts"], dump["preds"], args.eval)
        print({k: v for k, v in res.items() if not isinstance(v, dict)})
        return

    import jax
    import jax.numpy as jnp

    from srfdet3d_tpu.data import (KittiDataset, NuScenesDataset,
                                   SyntheticDataset, WaymoDataset,
                                   data_loader)
    from srfdet3d_tpu.models.detector import SRFDet
    from srfdet3d_tpu.train import create_train_state, make_eval_step
    from srfdet3d_tpu.utils import load_for_eval

    if args.synthetic:
        # keep GTs for eval but run the DETERMINISTIC protocol: no
        # random augs, no sweep sampling, no point shuffle
        dataset = SyntheticDataset(cfg, length=args.synthetic_length,
                                   test_mode=False, augment=False)
    else:
        ds_cls = {"nuscenes": NuScenesDataset, "kitti": KittiDataset,
                  "waymo": WaymoDataset}[cfg.dataset]
        ann = args.ann_file or os.path.join(
            args.data_root, f"{cfg.dataset}_infos_val.pkl")
        dataset = ds_cls(cfg, info_path=ann, data_root=args.data_root,
                         test_mode=False, augment=False)

    sample = next(iter(data_loader(dataset, args.batch_size, shuffle=False,
                                   num_workers=0)))
    sample_j = {k: jnp.asarray(v) for k, v in sample.items()}
    model, state, _ = create_train_state(
        cfg, jax.random.PRNGKey(0), sample_j, total_steps=1)
    if args.checkpoint:
        state = load_for_eval(args.checkpoint, state)
        print(f"loaded {args.checkpoint} @ step {int(state.step)}",
              flush=True)
    eval_step = make_eval_step(model)

    res = run_inference_eval(cfg, dataset, state, eval_step,
                             args.batch_size, args.eval, out=args.out)
    print({k: (round(v, 4) if isinstance(v, float) else v)
           for k, v in res.items() if not isinstance(v, dict)})


if __name__ == "__main__":
    main()
