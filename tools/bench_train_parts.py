"""Train-step decomposition at flagship scale (the 933 ms localization).

Times, each as its own jitted program with stream-amortized readback:
  1. train-mode forward (model.apply train=True)
  2. forward + OTA assignment + losses           (delta = OTA+loss cost)
  3. value_and_grad of (2)                       (delta = backward)
  4. the full train step incl. AdamW + BN stats  (delta = optimizer)

    python tools/bench_train_parts.py [rulebook] [gather]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import optax

from __graft_entry__ import _synthetic_batch  # noqa: E402 (cache enabled)
import srfdet3d_tpu.ops.sparse_conv as sc  # noqa: E402
from srfdet3d_tpu.configs import srfdet_voxel_nusc_L  # noqa: E402
from srfdet3d_tpu.models.detector import SRFDet  # noqa: E402
from srfdet3d_tpu.models.losses import srfdet_losses  # noqa: E402
from srfdet3d_tpu.train.trainer import (TrainState,  # noqa: E402
                                        make_train_step)

ITERS = 10


def stream_ms(fn, label):
    def burst(n):
        t0 = time.perf_counter()
        out = None
        for _ in range(n):
            out = fn()
        val = out[0] if isinstance(out, tuple) else out
        leaf = jax.tree.leaves(val)[0]
        float(jnp.sum(leaf))
        return (time.perf_counter() - t0) * 1000.0

    t0 = time.perf_counter()
    burst(1)
    print(f"{label}: compile+run {time.perf_counter() - t0:.0f}s",
          flush=True)
    burst(2)
    ms = (burst(ITERS) - burst(1)) / (ITERS - 1)
    print(f"{label}: {ms:.1f} ms/it (stream)", flush=True)
    return ms


def main():
    import dataclasses
    cfg = srfdet_voxel_nusc_L()
    rulebook = sys.argv[1] if len(sys.argv) > 1 else cfg.middle.rulebook
    if rulebook != cfg.middle.rulebook:
        cfg = dataclasses.replace(
            cfg, middle=dataclasses.replace(cfg.middle, rulebook=rulebook))
    gather = sys.argv[2] if len(sys.argv) > 2 else "onehot"
    sc.GATHER_METHOD = gather
    sc.ONEHOT_BWD = gather
    print(f"device {jax.devices()[0]} rulebook={rulebook} gather={gather}",
          flush=True)

    batch = _synthetic_batch(cfg, batch_size=1, with_gt=True)
    model = SRFDet(cfg)
    variables = jax.jit(lambda r, b: model.init(r, b, train=True))(
        jax.random.PRNGKey(0), batch)
    params = variables["params"]
    bstats = variables.get("batch_stats", {})
    rngs = {"dropout": jax.random.PRNGKey(1)}

    fwd = jax.jit(lambda p, bs: model.apply(
        {"params": p, "batch_stats": bs}, batch, train=True,
        mutable=["batch_stats"], rngs=rngs))
    t_fwd = stream_ms(lambda: fwd(params, bstats), "1. train-mode forward")

    def loss_fn(p, bs):
        (logits, boxes), updates = model.apply(
            {"params": p, "batch_stats": bs}, batch, train=True,
            mutable=["batch_stats"], rngs=rngs)
        losses = srfdet_losses(
            logits, boxes, batch["gt_boxes"], batch["gt_labels"],
            batch["gt_mask"], cfg.loss, cfg.ota,
            decoder_num_heads=cfg.head.num_heads)
        return sum(losses.values()), updates.get("batch_stats", {})

    floss = jax.jit(lambda p, bs: loss_fn(p, bs)[0])
    t_loss = stream_ms(lambda: floss(params, bstats), "2. forward+OTA+loss")

    grad = jax.jit(jax.value_and_grad(loss_fn, has_aux=True))
    t_grad = stream_ms(lambda: grad(params, bstats),
                       "3. value_and_grad(fwd+OTA+loss)")

    tx = optax.adamw(1e-4)
    step = make_train_step(model, tx, cfg)
    holder = {"state": TrainState(
        params=jax.tree.map(jnp.copy, params),
        opt_state=tx.init(params),
        batch_stats=jax.tree.map(jnp.copy, bstats),
        step=jnp.zeros((), jnp.int32))}

    def run_step():
        s2, metrics = step(holder["state"], batch, jax.random.PRNGKey(1))
        holder["state"] = s2
        return metrics["loss"]

    t_step = stream_ms(run_step, "4. full train step")

    print(f"\nOTA+loss delta:  {t_loss - t_fwd:.1f} ms")
    print(f"backward delta:  {t_grad - t_loss:.1f} ms")
    print(f"optimizer delta: {t_step - t_grad:.1f} ms")


if __name__ == "__main__":
    main()
