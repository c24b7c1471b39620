"""Flagship train-step benchmark (forward + OTA loss + backward + AdamW).

Compares the gather-backward strategies (SRFDET_GATHER_BWD) on one chip.
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
from srfdet3d_tpu.train.trainer import make_train_step, TrainState  # noqa


def main():
    print("device:", jax.devices()[0], flush=True)
    import dataclasses
    cfg = srfdet_voxel_nusc_L()
    rulebook = sys.argv[1] if len(sys.argv) > 1 else cfg.middle.rulebook
    if rulebook not in ("bitmap", "table"):
        # "onehot"/"xla" are GATHER combos (argv[2]), not rulebooks —
        # a wrong arg here silently benches the slow table backend
        # (cost us three phantom-regression runs, 2026-08-21)
        raise SystemExit(
            f"argv[1] is the RULEBOOK backend (bitmap|table), got "
            f"{rulebook!r}; gather combos go in argv[2], e.g. "
            f"bench_train.py bitmap onehot")
    if rulebook != cfg.middle.rulebook:
        cfg = dataclasses.replace(
            cfg, middle=dataclasses.replace(cfg.middle, rulebook=rulebook))
    if os.environ.get("SRFDET_REMAT", "0") == "1":
        cfg = dataclasses.replace(
            cfg, head=dataclasses.replace(cfg.head, remat=True))
        print("head.remat: ON", flush=True)
    if os.environ.get("SRFDET_UNROLL", "0") == "1":
        cfg = dataclasses.replace(
            cfg, head=dataclasses.replace(cfg.head, unroll_train=True))
        print("head.unroll_train: ON", flush=True)
    combos = ((("xla", "xla"), ("onehot", "onehot")) if len(sys.argv) <= 2
              else tuple((c, c) for c in sys.argv[2].split(",")))
    print("rulebook:", rulebook, "combos:", combos, flush=True)
    batch = _synthetic_batch(cfg, batch_size=1, with_gt=True)
    model = SRFDet(cfg)
    variables = jax.jit(lambda r, b: model.init(r, b, train=True))(
        jax.random.PRNGKey(0), batch)
    tx = optax.adamw(1e-4)

    for fwd, bwd in combos:
        sc.GATHER_METHOD = fwd
        sc.ONEHOT_BWD = bwd

        step = make_train_step(model, tx, cfg)
        # the train step donates its state: give each combo fresh buffers
        params = jax.tree.map(jnp.copy, variables["params"])
        holder = {"state": TrainState(
            params=params,
            opt_state=tx.init(params),
            batch_stats=jax.tree.map(jnp.copy, variables.get("batch_stats", {})),
            step=jnp.zeros((), jnp.int32))}

        def run(holder=holder, _k=(fwd, bwd)):
            # state is donated — thread it like a real training loop
            s2, metrics = step(holder["state"], batch, jax.random.PRNGKey(1))
            holder["state"] = s2
            return float(metrics["loss"])

        t0 = time.perf_counter()
        run()
        print(f"{fwd}/{bwd}: compile+run {time.perf_counter() - t0:.0f}s",
              flush=True)
        for _ in range(2):
            run()
        ts = []
        for _ in range(8):
            t0 = time.perf_counter()
            run()
            ts.append(time.perf_counter() - t0)
        p50 = float(np.percentile(ts, 50)) * 1000
        print(f"{fwd}/{bwd}: train step p50 {p50:.0f} ms "
              f"({1000.0 / p50:.2f} steps/s)", flush=True)

        # stream-amortized: dispatch N steps, sync once — the real
        # training-loop configuration (logging reads back every
        # log_interval steps, not every step), without the ~28 ms
        # per-step tunnel readback the p50 above includes
        n_stream = 10
        t0 = time.perf_counter()
        for _ in range(n_stream - 1):
            s2, metrics = step(holder["state"], batch, jax.random.PRNGKey(2))
            holder["state"] = s2
        run()
        stream = (time.perf_counter() - t0) / n_stream * 1000
        print(f"{fwd}/{bwd}: train step stream {stream:.0f} ms/step "
              f"({1000.0 / stream:.2f} steps/s)", flush=True)


if __name__ == "__main__":
    main()
