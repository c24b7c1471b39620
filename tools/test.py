#!/usr/bin/env python
"""Evaluation CLI (mirrors reference tools/test.py surface).

Usage:
  python tools/test.py <config_name> <checkpoint> [--eval mAP|kitti|waymo]
      [--synthetic] [--out results.pkl] [--batch-size B]
      [--data-root PATH] [--ann-file PATH]

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


def evaluate(cfg, gts, preds):
    from srfdet3d_tpu.evals import kitti_eval, nuscenes_eval, waymo_eval
    if cfg.dataset == "nuscenes":
        return nuscenes_eval(gts, preds, cfg.class_names)
    if cfg.dataset == "kitti":
        return kitti_eval(gts, preds, cfg.class_names)
    return waymo_eval(gts, preds, cfg.class_names)


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
    args = ap.parse_args()

    from srfdet3d_tpu.configs import get_config
    cfg = get_config(args.config)

    if args.eval_from_pkl:
        with open(args.eval_from_pkl, "rb") as f:
            dump = pickle.load(f)
        res = evaluate(cfg, dump["gts"], dump["preds"])
        print({k: v for k, v in res.items() if not isinstance(v, dict)})
        return

    import jax
    import jax.numpy as jnp

    from srfdet3d_tpu.data import (KittiDataset, NuScenesDataset,
                                   SyntheticDataset, WaymoDataset,
                                   data_loader)
    from srfdet3d_tpu.models.detector import SRFDet
    from srfdet3d_tpu.train import create_train_state, make_eval_step
    from srfdet3d_tpu.utils import restore_checkpoint

    if args.synthetic:
        dataset = SyntheticDataset(cfg, length=args.synthetic_length,
                                   test_mode=False)  # keep GTs for eval
    else:
        ds_cls = {"nuscenes": NuScenesDataset, "kitti": KittiDataset,
                  "waymo": WaymoDataset}[cfg.dataset]
        ann = args.ann_file or os.path.join(
            args.data_root, f"{cfg.dataset}_infos_val.pkl")
        dataset = ds_cls(cfg, info_path=ann, data_root=args.data_root,
                         test_mode=False)

    sample = next(iter(data_loader(dataset, args.batch_size, shuffle=False,
                                   num_workers=0)))
    sample_j = {k: jnp.asarray(v) for k, v in sample.items()}
    model, state, _ = create_train_state(
        cfg, jax.random.PRNGKey(0), sample_j, total_steps=1)
    if args.checkpoint:
        state = restore_checkpoint(args.checkpoint, state)
        print(f"loaded {args.checkpoint} @ step {int(state.step)}",
              flush=True)
    eval_step = make_eval_step(model)

    names = np.asarray(cfg.class_names)
    gts, preds = [], []
    for batch in data_loader(dataset, args.batch_size, shuffle=False,
                             num_workers=2):
        out = eval_step(state, {k: jnp.asarray(v) for k, v in batch.items()
                                if k not in ("gt_boxes", "gt_labels",
                                             "gt_mask")})
        boxes = np.asarray(out["boxes"])
        scores = np.asarray(out["scores"])
        labels = np.asarray(out["labels"])
        valid = np.asarray(out["valid"])
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

    if args.out:
        with open(args.out, "wb") as f:
            pickle.dump({"gts": gts, "preds": preds}, f)
        print(f"dumped {len(preds)} frames to {args.out}", flush=True)

    res = evaluate(cfg, gts, preds)
    print({k: (round(v, 4) if isinstance(v, float) else v)
           for k, v in res.items() if not isinstance(v, dict)})


if __name__ == "__main__":
    main()
