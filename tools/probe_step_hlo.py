"""Diff compiled-HLO op histograms of grad-only vs grad+SGD programs
(both compiles hit the persistent cache after probe_step_memory)."""

import os
import re
import sys
from collections import Counter

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from __graft_entry__ import _synthetic_batch  # noqa: E402
from srfdet3d_tpu.configs import srfdet_voxel_nusc_L  # noqa: E402
from srfdet3d_tpu.models.detector import SRFDet  # noqa: E402
from srfdet3d_tpu.models.losses import srfdet_losses  # noqa: E402

# after the "=", the first lowercase word directly followed by "(" is the
# op (shape tokens like f32[...] are followed by "[", never "(")
OP_RE = re.compile(r"=\s*[^=]*?([a-z][a-z0-9_\-]*)\(")


def histo(txt):
    c = Counter()
    for line in txt.splitlines():
        m = OP_RE.search(line)
        if m:
            c[m.group(1)] += 1
    return c


def main():
    cfg = srfdet_voxel_nusc_L()
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

    def grad_only(p, bs):
        return jax.value_and_grad(loss_fn, has_aux=True)(p, bs)

    def grad_sgd(p, bs):
        (total, new_bs), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(p, bs)
        p2 = jax.tree.map(lambda a, g: a - 1e-6 * g, p, grads)
        return p2, new_bs, total

    hs = {}
    for name, f in (("H", grad_only), ("F", grad_sgd)):
        txt = jax.jit(f).lower(params, bstats).compile().as_text()
        hs[name] = histo(txt)
        del txt
    keys = sorted(set(hs["H"]) | set(hs["F"]),
                  key=lambda k: -(abs(hs["F"][k] - hs["H"][k])))
    print(f"{'op':28s} {'H':>8s} {'F':>8s} {'delta':>8s}")
    for k in keys:
        d = hs["F"][k] - hs["H"][k]
        print(f"{k:28s} {hs['H'][k]:8d} {hs['F'][k]:8d} {d:+8d}")


if __name__ == "__main__":
    main()
