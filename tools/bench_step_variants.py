"""Train-step structural A/Bs + backward decomposition (the 886 ms hunt).

PERF.md session 7: step 886 = fwd 188.5 + OTA/loss 2.3 + bwd 490 + opt 205.
Standalone probes: adamw math on synthetic trees is 5.4 ms, yet the same
update with real-init params measured 142 ms, and a threaded two-program
split ran at grad-speed (682 ms) — pointing at per-buffer host dispatch on
the tunneled backend (state = 623 arrays in AND out per step), not compute.

Variants (each its own jitted program):
  A. baseline make_train_step (donated TrainState, per-leaf optax)
  B. baseline without donation
  C. flat optimizer state: mu/nu as ONE raveled vector each, update math in
     flat space (state buffers 623 -> 267)
  D. C + params stored flat too (state buffers -> 88)
Backward decomposition (value_and_grad wrt param SUBSETS; unselected
subtrees are closure constants so their backward is DCE'd):
  G1. bbox_head only            (head+loss bwd)
  G2. + pts_backbone, pts_neck  (adds SECOND+FPN bwd)
  G3. everything                (adds sparse-encoder bwd; == #3 of
      bench_train_parts, recompiled here for same-harness deltas)

    python tools/bench_step_variants.py [A B C D G1 G2 G3 ...]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import optax
from jax.flatten_util import ravel_pytree

from __graft_entry__ import _synthetic_batch  # noqa: E402 (cache enabled)
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
        leaf = jax.tree.leaves(out)[0]
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
    which = set(sys.argv[1:]) or {"A", "B", "C", "D", "G1", "G2"}
    cfg = srfdet_voxel_nusc_L()
    print(f"device {jax.devices()[0]} variants={sorted(which)}", flush=True)

    batch = _synthetic_batch(cfg, batch_size=1, with_gt=True)
    model = SRFDet(cfg)
    variables = jax.jit(lambda r, b: model.init(r, b, train=True))(
        jax.random.PRNGKey(0), batch)
    params = variables["params"]
    bstats = variables.get("batch_stats", {})
    rng = jax.random.PRNGKey(1)
    rngs = {"dropout": jax.random.fold_in(rng, 0),
            "grid_mask": jax.random.fold_in(rng, 1)}

    def loss_fn(p, bs):
        (logits, boxes), updates = model.apply(
            {"params": p, "batch_stats": bs}, batch, train=True,
            mutable=["batch_stats"], rngs=rngs)
        losses = srfdet_losses(
            logits, boxes, batch["gt_boxes"], batch["gt_labels"],
            batch["gt_mask"], cfg.loss, cfg.ota,
            decoder_num_heads=cfg.head.num_heads)
        return sum(losses.values()), updates.get("batch_stats", {})

    # ---- backward decomposition -------------------------------------
    def grad_subset(keys, label):
        sub = {k: params[k] for k in keys}
        rest = {k: v for k, v in params.items() if k not in keys}

        def f(sub_p, bs):
            return loss_fn({**rest, **sub_p}, bs)

        g = jax.jit(jax.value_and_grad(f, has_aux=True))
        stream_ms(lambda: g(sub, bstats), label)

    if "G1" in which:
        grad_subset(["bbox_head"], "G1 grad wrt head only")
    if "G2" in which:
        grad_subset(["bbox_head", "pts_backbone", "pts_neck"],
                    "G2 grad wrt head+SECOND+FPN")
    if "G3" in which:
        grad_subset(list(params.keys()), "G3 grad wrt all")

    # ---- step variants ----------------------------------------------
    tx = optax.adamw(1e-4)

    if "A" in which:
        step = make_train_step(model, tx, cfg)
        holder = {"s": TrainState(params=jax.tree.map(jnp.copy, params),
                                  opt_state=tx.init(params),
                                  batch_stats=jax.tree.map(jnp.copy, bstats),
                                  step=jnp.zeros((), jnp.int32))}

        def run_a():
            s2, m = step(holder["s"], batch, rng)
            holder["s"] = s2
            return m["loss"]

        stream_ms(run_a, "A baseline step (donated)")

    if "B" in which:
        # baseline body (per-leaf optax + global_norm metric), NO donation,
        # no TrainState wrapper — isolates the donation/dispatch effect
        @jax.jit
        def step_b(p, bs, opt):
            (total, new_bs), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(p, bs)
            u, opt2 = tx.update(grads, opt, p)
            p2 = optax.apply_updates(p, u)
            return p2, new_bs, opt2, (total, optax.global_norm(grads))

        holder = {"s": (jax.tree.map(jnp.copy, params),
                        jax.tree.map(jnp.copy, bstats), tx.init(params))}

        def run_b():
            p, bs, opt = holder["s"]
            p2, bs2, opt2, (loss, gn) = step_b(p, bs, opt)
            holder["s"] = (p2, bs2, opt2)
            return loss

        stream_ms(run_b, "B baseline body, no donation")

    if "E" in which:
        # SAME program as B, but CONSTANT inputs (outputs dropped, never fed
        # back).  If E runs at grad-only speed (~680 ms) while B runs ~880,
        # the step cost is the state-feedback chain (no overlap between
        # dependent executions on the tunneled backend), not the program.
        @jax.jit
        def step_e(p, bs, opt):
            (total, new_bs), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(p, bs)
            u, opt2 = tx.update(grads, opt, p)
            p2 = optax.apply_updates(p, u)
            return p2, new_bs, opt2, (total, optax.global_norm(grads))

        opt0 = tx.init(params)
        stream_ms(lambda: step_e(params, bstats, opt0),
                  "E full-step program, constant inputs")

    if "F" in which:
        # grad + trivial fused SGD update, FED BACK: isolates optimizer
        # state traffic (no mu/nu, no opt state at all) from the feedback
        # chain.  F ~ B means the 200 ms is feedback; F ~ grad-only means
        # it is AdamW state traffic.
        @jax.jit
        def step_f(p, bs):
            (total, new_bs), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(p, bs)
            p2 = jax.tree.map(lambda a, g: a - 1e-6 * g, p, grads)
            return p2, new_bs, total

        holder = {"s": (jax.tree.map(jnp.copy, params),
                        jax.tree.map(jnp.copy, bstats))}

        def run_f():
            p, bs = holder["s"]
            p2, bs2, loss = step_f(p, bs)
            holder["s"] = (p2, bs2)
            return loss

        stream_ms(run_f, "F grad + fused SGD, fed back")

    if which & {"C", "D", "S"}:
        flat_p, unravel = ravel_pytree(params)
        n = flat_p.size
        print(f"flat param vector: {n} elems", flush=True)

        def flat_adamw(g_flat, p_flat, mu, nu, count):
            gn = jnp.sqrt(jnp.sum(g_flat * g_flat))
            scale = jnp.minimum(1.0, 35.0 / (gn + 1e-6))
            g = g_flat * scale
            mu = 0.9 * mu + 0.1 * g
            nu = 0.999 * nu + 0.001 * g * g
            c = count + 1
            mhat = mu / (1 - 0.9 ** c.astype(jnp.float32))
            nhat = nu / (1 - 0.999 ** c.astype(jnp.float32))
            upd = -1e-4 * (mhat / (jnp.sqrt(nhat) + 1e-8) + 0.01 * p_flat)
            return p_flat + upd, mu, nu, c, gn

    if "S" in which:
        # K steps under ONE lax.scan in ONE program: a device-side step
        # loop (batches pre-staged on device, like flax prefetch loops).
        # One dispatch + one state round-trip per K steps — if the
        # step-vs-grad delta is feedback/dispatch stall, this amortizes it
        # K-fold and is the idiomatic TPU fix.
        K = 4

        def one_step(carry, mb):
            p, bs, mu, nu, count = carry
            (total, new_bs), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(p, bs)
            g_flat, _ = ravel_pytree(grads)
            p_flat, unrav = ravel_pytree(p)
            new_p, mu, nu, c, gn = flat_adamw(g_flat, p_flat, mu, nu, count)
            return (unrav(new_p), new_bs, mu, nu, c), (total, gn)

        @jax.jit
        def steps_s(carry, batches):
            return jax.lax.scan(one_step, carry, batches)

        batches_k = jax.tree.map(
            lambda x: jnp.broadcast_to(x[None], (K,) + x.shape), batch)
        holder = {"s": (jax.tree.map(jnp.copy, params),
                        jax.tree.map(jnp.copy, bstats),
                        jnp.zeros_like(flat_p), jnp.zeros_like(flat_p),
                        jnp.zeros((), jnp.int32))}

        def run_s():
            carry, (losses, gns) = steps_s(holder["s"], batches_k)
            holder["s"] = carry
            return losses

        ms = stream_ms(run_s, f"S {K}-step scan program")
        print(f"S per-step: {ms / K:.1f} ms", flush=True)

    if "I" in which:
        # grad + SCALED-grads output (consumes every grad leaf, touches
        # neither params nor opt state).  I ~ H: outputting transformed
        # grads is free -> F's cost is the param read/liveness.  I ~ F:
        # ANY elementwise epilogue over the grad tree costs 200 ms ->
        # XLA loses in-place grad-accumulator aliasing.
        @jax.jit
        def step_i(p, bs):
            (total, new_bs), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(p, bs)
            return jax.tree.map(lambda g: g * 2.0, grads), total

        stream_ms(lambda: step_i(params, bstats),
                  "I grad + scaled-grad outputs")

    if "K" in which:
        # grad consumed ONLY by a scalar reduction (global norm); the grad
        # tree is NOT an output.  K ~ H: reductions are free consumers.
        # K ~ F: any consumption beyond raw output costs 200 ms.
        @jax.jit
        def step_k(p, bs):
            (total, new_bs), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(p, bs)
            return total, optax.global_norm(grads)

        stream_ms(lambda: step_k(params, bstats),
                  "K grad -> scalar norm only")

    if "H" in which:
        # grad-only with CONSTANT inputs == bench_train_parts #3 in this
        # harness (the 681 ms anchor), for same-run deltas.
        g = jax.jit(jax.value_and_grad(loss_fn, has_aux=True))
        stream_ms(lambda: g(params, bstats), "H grad-only, constant inputs")

    if "C" in which:
        @jax.jit
        def step_c(p_tree, bs, mu, nu, count):
            (total, new_bs), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(p_tree, bs)
            g_flat, _ = ravel_pytree(grads)
            p_flat, unrav = ravel_pytree(p_tree)
            new_p, mu, nu, c, gn = flat_adamw(g_flat, p_flat, mu, nu, count)
            return unrav(new_p), new_bs, mu, nu, c, (total, gn)

        holder = {"s": (jax.tree.map(jnp.copy, params),
                        jax.tree.map(jnp.copy, bstats),
                        jnp.zeros_like(flat_p), jnp.zeros_like(flat_p),
                        jnp.zeros((), jnp.int32))}

        def run_c():
            p, bs, mu, nu, c = holder["s"]
            p2, bs2, mu2, nu2, c2, (loss, gn) = step_c(p, bs, mu, nu, c)
            holder["s"] = (p2, bs2, mu2, nu2, c2)
            return loss

        stream_ms(run_c, "C flat-opt step (tree params, flat mu/nu)")

    if "D" in which:
        # params live as ONE flat vector between steps; unravel feeds apply
        @jax.jit
        def step_d(p_flat, bs, mu, nu, count):
            p_tree = unravel(p_flat)
            (total, new_bs), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(p_tree, bs)
            g_flat, _ = ravel_pytree(grads)
            new_p, mu, nu, c, gn = flat_adamw(g_flat, p_flat, mu, nu, count)
            return new_p, new_bs, mu, nu, c, (total, gn)

        holder = {"s": (jnp.copy(flat_p), jax.tree.map(jnp.copy, bstats),
                        jnp.zeros_like(flat_p), jnp.zeros_like(flat_p),
                        jnp.zeros((), jnp.int32))}

        def run_d():
            p, bs, mu, nu, c = holder["s"]
            p2, bs2, mu2, nu2, c2, (loss, gn) = step_d(p, bs, mu, nu, c)
            holder["s"] = (p2, bs2, mu2, nu2, c2)
            return loss

        stream_ms(run_d, "D flat-opt step (flat params between steps)")


if __name__ == "__main__":
    main()
