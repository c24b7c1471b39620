"""Compare XLA memory analysis of grad-only vs grad+SGD-epilogue programs.

bench_step_variants: H (grad-only) 681 ms, F (same grad + p-1e-6*g
epilogue) 882 ms — a trivial epilogue adds 200 ms.  If F's temp buffer
size is much larger than H's, XLA is rematerializing/spilling under the
extra liveness; if equal, it is a scheduling (latency-hiding) difference.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from __graft_entry__ import _synthetic_batch  # noqa: E402 (cache enabled)
from srfdet3d_tpu.configs import srfdet_voxel_nusc_L  # noqa: E402
from srfdet3d_tpu.models.detector import SRFDet  # noqa: E402
from srfdet3d_tpu.models.losses import srfdet_losses  # noqa: E402


def main():
    cfg = srfdet_voxel_nusc_L()
    print(f"device {jax.devices()[0]}", flush=True)
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

    for name, f in (("H grad-only", grad_only), ("F grad+sgd", grad_sgd)):
        compiled = jax.jit(f).lower(params, bstats).compile()
        ma = compiled.memory_analysis()
        print(f"{name}:")
        print(f"  temp   {ma.temp_size_in_bytes/1e9:.3f} GB")
        print(f"  args   {ma.argument_size_in_bytes/1e9:.3f} GB")
        print(f"  output {ma.output_size_in_bytes/1e9:.3f} GB")
        print(f"  alias  {ma.alias_size_in_bytes/1e9:.3f} GB")
        print(f"  gen code {ma.generated_code_size_in_bytes/1e6:.1f} MB",
              flush=True)
        txt = compiled.as_text()
        import re
        n_fusion = len(re.findall(r"^\s+fusion", txt, re.M))
        n_copy = len(re.findall(r"copy", txt))
        n_custom = len(re.findall(r"custom-call", txt))
        print(f"  HLO: {len(txt.splitlines())} lines, fusions {n_fusion}, "
              f"copies {n_copy}, custom-calls {n_custom}", flush=True)


if __name__ == "__main__":
    main()
