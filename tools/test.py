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


class _ProcessShard:
    """Strided per-process view of a dataset (multi-host eval)."""

    def __init__(self, ds, offset: int, stride: int):
        self.ds, self.offset, self.stride = ds, offset, stride

    def __len__(self):
        return max((len(self.ds) - self.offset + self.stride - 1)
                   // self.stride, 0)

    def __getitem__(self, i):
        return self.ds[self.offset + i * self.stride]


def run_inference_eval(cfg, dataset, state, eval_step, batch_size: int,
                       protocol: str = "auto", out: str | None = None):
    """Inference over `dataset` + native metric evaluation.

    Shared by this CLI and tools/train.py's --eval-interval hook (the
    reference's mmcv EvalHook, cfg evaluation=dict(interval=1),
    srfdet_voxel_nusc_L.py:370).  Returns the metric dict; optionally
    dumps {gts, preds} to `out` (reference --out pickle).

    Under a jax.distributed cluster (tools/dist_test.sh) each process
    evaluates a strided shard of the dataset with its LOCAL devices, the
    fixed-shape per-frame results all-gather across hosts
    (multihost_utils.process_allgather — the reference's collect_results
    role), and every process computes the same metrics."""
    import jax
    import jax.numpy as jnp

    from srfdet3d_tpu.data import data_loader

    n_proc = jax.process_count()
    if n_proc > 1:
        if len(dataset) < n_proc:
            # decided identically on EVERY process (global length) —
            # aborting one-sided later would strand the others at the
            # pre-gather barrier
            raise SystemExit(f"dataset has {len(dataset)} frames < "
                             f"{n_proc} processes")
        dataset = _ProcessShard(dataset, jax.process_index(), n_proc)

    rows = []                                   # fixed-shape per frame
    # drop_last=False: every validation frame scores. The ragged tail
    # batch PADS to batch_size (repeat last frame, drop its rows) so the
    # whole eval compiles exactly ONE program — also keeps multi-host
    # shards shape-aligned (unequal compile counts skew processes past
    # Gloo's rendezvous deadline at the gather below).
    for batch in data_loader(dataset, batch_size, shuffle=False,
                             num_workers=2, drop_last=False):
        n_real = next(iter(batch.values())).shape[0]
        if n_real < batch_size:
            batch = {k: np.concatenate(
                [v] + [v[-1:]] * (batch_size - n_real)) for k, v in
                batch.items()}
        out_b = eval_step(state, {k: jnp.asarray(v)
                                  for k, v in batch.items()
                                  if k not in ("gt_boxes", "gt_labels",
                                               "gt_mask")})
        out_np = {k: np.asarray(v) for k, v in out_b.items()}
        for i in range(n_real):
            rows.append({
                "pb": out_np["boxes"][i], "ps": out_np["scores"][i],
                "pl": out_np["labels"][i], "pv": out_np["valid"][i],
                "gb": np.asarray(batch["gt_boxes"][i]),
                "gl": np.asarray(batch["gt_labels"][i]),
                "gm": np.asarray(batch["gt_mask"][i])})

    if n_proc > 1:
        from jax.experimental import multihost_utils as mhu
        stacked = {k: np.stack([r[k] for r in rows]) for k in rows[0]} \
            if rows else None
        if stacked is None:
            raise SystemExit("empty dataset shard — fewer frames than "
                             "processes")
        # processes compile/evaluate at different speeds; align at the
        # coordination-service barrier (no collectives) so the FIRST Gloo
        # collective below doesn't hit its ~30s rendezvous deadline while
        # a peer is still compiling
        try:
            from jax._src import distributed as _dist
            _dist.global_state.client.wait_at_barrier(
                "srfdet_disteval_gather", 3_600_000)
        except Exception as e:               # private API moved — best effort
            print(f"disteval barrier fallback ({e})", flush=True)
        n_local = np.asarray([len(rows)], np.int32)
        n_all = np.asarray(mhu.process_allgather(n_local)).reshape(-1)
        n_max = int(n_all.max())
        ok = np.zeros((n_max,), bool)
        ok[:len(rows)] = True
        padded = {k: np.concatenate(
            [v, np.zeros((n_max - len(rows),) + v.shape[1:], v.dtype)])
            for k, v in stacked.items()}
        padded["frame_ok"] = ok
        gathered = mhu.process_allgather(padded)   # (P, n_max, ...)
        gathered = {k: np.asarray(v) for k, v in gathered.items()}
        fo = gathered.pop("frame_ok").reshape(-1)
        rows = []
        flat = {k: v.reshape((-1,) + v.shape[2:]) for k, v in
                gathered.items()}
        for i in np.nonzero(fo)[0]:
            rows.append({k: v[i] for k, v in flat.items()})

    names = np.asarray(cfg.class_names)
    gts, preds = [], []
    for r in rows:
        v = r["pv"].astype(bool)
        pb = r["pb"][v].copy()
        pb[:, 2] += 0.5 * pb[:, 5]           # bottom -> gravity center
        preds.append({"boxes": pb, "scores": r["ps"][v],
                      "labels_name": names[r["pl"][v]]})
        gm = r["gm"].astype(bool)
        gts.append({"boxes": r["gb"][gm], "labels_name": names[r["gl"][gm]]})

    if out and jax.process_index() == 0:
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

    # multi-host bootstrap (tools/dist_test.sh — same contract as
    # dist_train.sh); each host then evaluates a shard of the dataset
    coord = os.environ.get("SRFDET_COORD_ADDR")
    if coord:
        jax.distributed.initialize(
            coordinator_address=coord,
            num_processes=int(os.environ.get("SRFDET_NUM_HOSTS", "1")),
            process_id=int(os.environ.get("SRFDET_HOST_ID", "0")))

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
