#!/usr/bin/env python
"""Training CLI (mirrors reference tools/train.py surface).

Usage:
  python tools/train.py <config_name> [--work-dir DIR] [--resume-from CKPT]
      [--load-from CKPT] [--epochs N] [--batch-size B] [--seed S]
      [--synthetic] [--data-root PATH] [--ann-file PATH]
      [--cfg-options k=v ...]

config_name is one of srfdet3d_tpu.configs.CONFIGS (the 11 experiments).
--synthetic trains on generated scenes (smoke testing without datasets).
--cfg-options supports dotted keys into the frozen dataclasses, e.g.
  optim.lr=1e-4 head.num_proposals=300 (reference --cfg-options mechanism).
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def apply_cfg_options(cfg, options):
    """Dotted-key overrides into nested frozen dataclasses."""
    for opt in options or []:
        key, _, raw = opt.partition("=")
        try:
            val = json.loads(raw)
        except json.JSONDecodeError:
            val = raw
        parts = key.split(".")
        objs = [cfg]
        for p in parts[:-1]:
            objs.append(getattr(objs[-1], p))
        new_leaf = val                      # rebuild from the leaf outwards
        for depth in range(len(parts) - 1, -1, -1):
            new_leaf = dataclasses.replace(
                objs[depth], **{parts[depth]: new_leaf})
        cfg = new_leaf
    return cfg


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("config")
    ap.add_argument("--work-dir", default="work_dirs")
    ap.add_argument("--resume-from", default=None)
    ap.add_argument("--load-from", default=None)
    ap.add_argument("--epochs", type=int, default=None)
    ap.add_argument("--batch-size", type=int, default=None)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--synthetic", action="store_true")
    ap.add_argument("--synthetic-length", type=int, default=32)
    ap.add_argument("--data-root", default="data/nuscenes")
    ap.add_argument("--ann-file", default=None)
    ap.add_argument("--db-info", default=None,
                    help="GT-database pickle for ObjectSample paste "
                         "augmentation (e.g. nuscenes_dbinfos_train.pkl)")
    ap.add_argument("--log-interval", type=int, default=50)
    ap.add_argument("--ckpt-interval", type=int, default=1)
    ap.add_argument("--eval-interval", type=int, default=0,
                    help="run validation eval every N epochs (mmcv "
                         "EvalHook; reference configs use interval=1, "
                         "e.g. srfdet_voxel_nusc_L.py:370). 0 = off")
    ap.add_argument("--no-cbgs", action="store_true")
    ap.add_argument("--debug-nans", action="store_true",
                    help="jax nan debugging (reference "
                         "set_detect_anomaly, train.py:317)")
    ap.add_argument("--cfg-options", nargs="*", default=None)
    args = ap.parse_args()

    import jax

    # multi-host bootstrap (tools/dist_train.sh)
    coord = os.environ.get("SRFDET_COORD_ADDR")
    if coord:
        jax.distributed.initialize(
            coordinator_address=coord,
            num_processes=int(os.environ.get("SRFDET_NUM_HOSTS", "1")),
            process_id=int(os.environ.get("SRFDET_HOST_ID", "0")))
    if args.debug_nans:
        jax.config.update("jax_debug_nans", True)
    import jax.numpy as jnp

    from srfdet3d_tpu.configs import get_config
    from srfdet3d_tpu.data import (CBGSWrapper, KittiDataset,
                                   NuScenesDataset, SyntheticDataset,
                                   WaymoDataset, data_loader)
    from srfdet3d_tpu.parallel import make_mesh, replicate, shard_batch
    from srfdet3d_tpu.train import (create_train_state, make_lr_schedule,
                                    make_train_step)
    from srfdet3d_tpu.utils import (MetricLogger, load_pretrained,
                                    restore_checkpoint, save_checkpoint)

    cfg = get_config(args.config)
    cfg = apply_cfg_options(cfg, args.cfg_options)
    epochs = args.epochs or cfg.optim.epochs
    work_dir = os.path.join(args.work_dir, cfg.name)
    os.makedirs(work_dir, exist_ok=True)
    # reproducibility capture (reference train.py:174-212: cfg.dump +
    # collect_env + seed/exp meta)
    with open(os.path.join(work_dir, "config.json"), "w") as f:
        json.dump(dataclasses.asdict(cfg), f, indent=1, default=str)
    with open(os.path.join(work_dir, "env.json"), "w") as f:
        json.dump({"jax": jax.__version__,
                   "backend": jax.default_backend(),
                   "devices": [str(d) for d in jax.devices()],
                   "process_count": jax.process_count(),
                   "seed": args.seed, "argv": sys.argv}, f, indent=1)

    n_dev = len(jax.devices())
    batch_size = args.batch_size or cfg.optim.batch_size_per_device * n_dev
    # each microbatch of a grad-accumulation step must span every device
    # evenly (trainer.py strided split) -> batch % (n_dev * accum) == 0
    quantum = n_dev * max(cfg.optim.accum_steps, 1)
    batch_size = max(batch_size - batch_size % quantum, quantum)

    if args.synthetic:
        dataset = SyntheticDataset(cfg, length=args.synthetic_length,
                                   seed=args.seed)
    else:
        from srfdet3d_tpu.data.transforms import DBSampler

        # per-class paste counts (cfg ObjectSample sample_groups,
        # srfdet_voxel_nusc_L.py:229-240)
        nus_groups = dict(car=2, truck=3, construction_vehicle=7, bus=4,
                          trailer=6, barrier=2, motorcycle=6, bicycle=6,
                          pedestrian=2, traffic_cone=2)
        kitti_groups = dict(Car=12, Pedestrian=6, Cyclist=6)
        # filter_by_min_points: nuScenes uses 5 for every class
        # (srfdet_voxel_nusc_L.py:217-227); KITTI 5/10/10
        # (srfdet_voxel_kitti_L.py:230)
        kitti_min_points = dict(Car=5, Pedestrian=10, Cyclist=10)
        db_sampler = None
        if args.db_info:
            nus = cfg.dataset == "nuscenes"
            db_sampler = DBSampler(
                info_path=args.db_info, data_root=args.data_root,
                classes=cfg.class_names,
                sample_groups=nus_groups if nus else kitti_groups,
                min_points=({c: 5 for c in cfg.class_names} if nus
                            else kitti_min_points),
                points_load_dim=cfg.points_dim,
                points_use_dim=tuple(range(cfg.points_dim)))
        ds_cls = {"nuscenes": NuScenesDataset, "kitti": KittiDataset,
                  "waymo": WaymoDataset}[cfg.dataset]
        ann = args.ann_file or os.path.join(
            args.data_root, f"{cfg.dataset}_infos_train.pkl")
        dataset = ds_cls(cfg, info_path=ann, data_root=args.data_root,
                         seed=args.seed, db_sampler=db_sampler)
        if cfg.dataset == "nuscenes" and not args.no_cbgs:
            dataset = CBGSWrapper(dataset)

    steps_per_epoch = max(len(dataset) // batch_size, 1)
    total_steps = steps_per_epoch * epochs
    print(f"config={cfg.name} devices={n_dev} batch={batch_size} "
          f"steps/epoch={steps_per_epoch} epochs={epochs}", flush=True)

    mesh = make_mesh(n_dev)
    sample = next(iter(data_loader(dataset, batch_size, shuffle=False,
                                   num_workers=0)))
    sample = {k: jnp.asarray(v) for k, v in sample.items()}
    model, state, tx = create_train_state(
        cfg, jax.random.PRNGKey(args.seed), sample, total_steps)
    schedule = make_lr_schedule(cfg.optim, total_steps)

    if args.load_from:
        # params AND batch_stats (converted reference checkpoints carry
        # torch running stats frozen-BN fine-tuning must keep)
        state = load_pretrained(state, args.load_from)
    if args.resume_from:
        state = restore_checkpoint(args.resume_from, state)
        print(f"resumed from {args.resume_from} @ step {int(state.step)}",
              flush=True)

    # mesh -> the shard_map DP path on multi-device meshes (per-device
    # work provably flat in mesh size; trainer.make_train_step docstring)
    train_step = make_train_step(model, tx, cfg, mesh=mesh)
    state = replicate(state, mesh)
    logger = MetricLogger(args.log_interval,
                          log_dir=os.path.join(work_dir, "tb"))

    val_dataset = eval_step = None
    if args.eval_interval > 0:
        from srfdet3d_tpu.train import make_eval_step
        if args.synthetic:
            val_dataset = SyntheticDataset(
                cfg, length=max(args.synthetic_length // 4, 2),
                seed=args.seed + 999, augment=False)
        else:
            val_ann = os.path.join(args.data_root,
                                   f"{cfg.dataset}_infos_val.pkl")
            val_dataset = ds_cls(cfg, info_path=val_ann,
                                 data_root=args.data_root,
                                 test_mode=False, augment=False)
        eval_step = make_eval_step(model)

    # host-side step counter: int(state.step)/float(metric) every
    # iteration would block on the just-dispatched device step, defeating
    # async dispatch (host preprocessing could no longer overlap compute)
    host_step = int(state.step)
    base_key = jax.random.PRNGKey(args.seed)
    start_epoch = host_step // steps_per_epoch

    # preemption-safe shutdown (beyond the reference, which has no
    # preemption handling — SURVEY §5): the FIRST SIGTERM/SIGINT sets a
    # flag checked after every step, batch fetch, checkpoint and eval; the
    # loop drains, saves `preempt_<step>` and exits 0 so `--resume-from`
    # continues on the next allocation.  The handler restores the default
    # disposition, so a SECOND signal (impatient Ctrl-C, platform SIGKILL
    # escalation) terminates immediately.
    import signal
    preempted = {"sig": None}

    def _on_preempt(signum, frame):
        preempted["sig"] = signum
        signal.signal(signum, signal.SIG_DFL)

    for sig in (signal.SIGTERM, signal.SIGINT):
        signal.signal(sig, _on_preempt)

    def preempt_save() -> bool:
        if preempted["sig"] is None:
            return False
        # orbax save is a cross-process collective (it syncs all hosts
        # and writes from its own primary) — EVERY process must call it
        path = os.path.join(work_dir, f"preempt_{host_step}")
        save_checkpoint(path, jax.device_get(state), meta={
            "config": cfg.name, "classes": cfg.class_names,
            "step": host_step, "preempted": True})
        print(f"preemption signal {preempted['sig']}: saved {path}",
              flush=True)
        return True

    for epoch in range(start_epoch, epochs):
        if hasattr(dataset, "epoch"):      # vary per-index aug draws
            dataset.epoch = epoch
        # mid-epoch resume (preempt_<step> checkpoints): the loader's
        # order is seed-deterministic per epoch, so starting at the
        # host_step-offset batch continues exactly where training left
        # off — skipped samples are never materialized (no replayed
        # augmentation pipeline, no over-training)
        skip = max(host_step - epoch * steps_per_epoch, 0)
        for batch in data_loader(dataset, batch_size, shuffle=True,
                                 seed=args.seed + epoch,
                                 skip_batches=skip):
            if preempt_save():               # signal during a data stall
                return
            batch = shard_batch(
                {k: jnp.asarray(v) for k, v in batch.items()}, mesh)
            state, metrics = train_step(
                state, batch, jax.random.fold_in(base_key, host_step))
            host_step += 1
            if preempt_save():
                return
            if host_step % args.log_interval == 0:
                logger.log(host_step,
                           {k: float(v) for k, v in metrics.items()},
                           lr=float(schedule(host_step)))
        if (epoch + 1) % args.ckpt_interval == 0 or epoch == epochs - 1:
            # all processes participate (orbax collective save)
            path = os.path.join(work_dir, f"epoch_{epoch + 1}")
            save_checkpoint(path, jax.device_get(state), meta={
                "config": cfg.name, "classes": cfg.class_names,
                "epoch": epoch + 1, "step": int(state.step)})
            print(f"saved {path}", flush=True)
        if preempt_save():
            return
        if eval_step is not None and (epoch + 1) % args.eval_interval == 0:
            if jax.process_count() > 1:
                # run_inference_eval places batches process-locally,
                # incompatible with the cross-process replicated state —
                # evaluate multi-host runs offline via tools/test.py
                print("eval-interval: skipped under multi-host training",
                      flush=True)
            else:
                from tools.test import run_inference_eval
                res = run_inference_eval(cfg, val_dataset, state, eval_step,
                                         batch_size=max(n_dev, 1))
                logger.log_eval(host_step, {k: v for k, v in res.items()
                                            if not isinstance(v, dict)})
            if preempt_save():               # signal during the eval pass
                return
    print("training done", flush=True)


if __name__ == "__main__":
    main()
