"""Probe: per-leaf optax AdamW vs a raveled single-vector AdamW on TPU.

The train-step decomposition (PERF.md session 7) shows a 205 ms optimizer
delta and a standalone adamw+global_norm probe at 142 ms for 23M params —
~100x above HBM-bandwidth cost. Hypothesis: 179 leaves x ~10 elementwise
HLOs each = ~2000 tiny kernels whose fixed launch overhead dominates.
This times (1) the tree chain, (2) the same math over one raveled vector
including the ravel/unravel copies.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import optax
from jax.flatten_util import ravel_pytree

from srfdet3d_tpu.configs import srfdet_voxel_nusc_L
from srfdet3d_tpu.models.detector import SRFDet
from __graft_entry__ import _synthetic_batch  # noqa: E402 (cache enabled)

ITERS = 20


def stream_ms(fn, label):
    def burst(n):
        t0 = time.perf_counter()
        out = None
        for _ in range(n):
            out = fn()
        leaf = jax.tree.leaves(out)[0]
        float(jnp.sum(leaf))
        return (time.perf_counter() - t0) * 1000.0

    burst(1)
    burst(2)
    ms = (burst(ITERS) - burst(1)) / (ITERS - 1)
    print(f"{label}: {ms:.1f} ms/it (stream)", flush=True)
    return ms


def main():
    cfg = srfdet_voxel_nusc_L()
    model = SRFDet(cfg)
    batch = _synthetic_batch(cfg, batch_size=1, with_gt=True)
    shapes = jax.eval_shape(
        lambda r, b: model.init(r, b, train=True), jax.random.PRNGKey(0),
        batch)["params"]
    # synthesize params/grads with the real tree structure (no model compile)
    params = jax.tree.map(
        lambda s: jnp.full(s.shape, 0.01, s.dtype), shapes)
    grads = jax.tree.map(lambda s: jnp.full(s.shape, 1e-3, s.dtype), shapes)
    print(f"device {jax.devices()[0]} leaves={len(jax.tree.leaves(params))}",
          flush=True)

    tx = optax.chain(optax.clip_by_global_norm(35.0),
                     optax.adamw(1e-4, weight_decay=0.01))
    opt_state = tx.init(params)

    @jax.jit
    def tree_update(grads, opt_state, params):
        updates, new_opt = tx.update(grads, opt_state, params)
        new_params = optax.apply_updates(params, updates)
        gn = optax.global_norm(grads)
        return new_params, new_opt, gn

    stream_ms(lambda: tree_update(grads, opt_state, params)[0],
              "tree adamw+clip+norm")

    flat_g, unravel = ravel_pytree(grads)
    flat_p, _ = ravel_pytree(params)
    mu = jnp.zeros_like(flat_p)
    nu = jnp.zeros_like(flat_p)

    @jax.jit
    def flat_update(grads_tree, params_tree, mu, nu, count):
        g, _ = ravel_pytree(grads_tree)
        p, _ = ravel_pytree(params_tree)
        gn = jnp.sqrt(jnp.sum(g * g))
        g = g * jnp.minimum(1.0, 35.0 / (gn + 1e-12))
        mu = 0.9 * mu + 0.1 * g
        nu = 0.999 * nu + 0.001 * g * g
        c = count + 1
        mhat = mu / (1 - 0.9 ** c)
        nhat = nu / (1 - 0.999 ** c)
        upd = -1e-4 * (mhat / (jnp.sqrt(nhat) + 1e-8) + 0.01 * p)
        new_p = p + upd
        return unravel(new_p), mu, nu, c, gn

    count = jnp.zeros((), jnp.int32)
    stream_ms(lambda: flat_update(grads, params, mu, nu, count)[0],
              "flat adamw+clip+norm (ravel grads+params, unravel params)")

    @jax.jit
    def flat_core(g, p, mu, nu, count):
        gn = jnp.sqrt(jnp.sum(g * g))
        g = g * jnp.minimum(1.0, 35.0 / (gn + 1e-12))
        mu = 0.9 * mu + 0.1 * g
        nu = 0.999 * nu + 0.001 * g * g
        c = count + 1
        mhat = mu / (1 - 0.9 ** c)
        nhat = nu / (1 - 0.999 ** c)
        upd = -1e-4 * (mhat / (jnp.sqrt(nhat) + 1e-8) + 0.01 * p)
        return p + upd, mu, nu, c

    stream_ms(lambda: flat_core(flat_g, flat_p, mu, nu, count)[0],
              "flat core only (no ravel)")


if __name__ == "__main__":
    main()
