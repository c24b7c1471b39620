"""AOT-export the inference surface as a serialized StableHLO artifact.

The reference has no deployment story beyond checkpoints + tools/test.py;
for TPU production serving we export the FULL predict program (voxelize ->
VFE -> sparse encoder -> SECOND/FPN -> decoder head -> decode -> rotated
NMS) via `jax.export`: one static-shape XLA program, loadable from any
process (python via jax.export.deserialize, or a C++ PjRt serving binary
consuming the embedded StableHLO) without flax or any model code.

Usage:
  python tools/export.py --config srfdet_voxel_nusc_L --out flagship.jxp
  python tools/export.py --config srfdet_voxel_nusc_L --out flagship.jxp \
      --checkpoint /path/to/ckpt --bake-params --batch-size 1

Without --bake-params the artifact takes (variables, batch) — pair it with
an orbax checkpoint at load time.  With it, parameters are embedded as
program constants and the artifact takes only the batch (self-contained,
larger file).  Round-trip covered by tests/test_export.py.
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_predict(cfg, variables=None, bake_params: bool = False,
                  batch_size: int = 1, rng_seed: int = 0):
    """Returns (fn, example_args) for the predict surface of `cfg`."""
    import jax

    import __graft_entry__ as graft
    from srfdet3d_tpu.models.detector import SRFDet

    batch = graft._synthetic_batch(cfg, batch_size=batch_size, seed=rng_seed)
    if cfg.use_img and "images" not in batch:
        import jax.numpy as jnp
        n_cam = cfg.img.num_cams
        h, w = cfg.img.img_shape
        batch["images"] = jnp.zeros((batch_size, n_cam, h, w, 3),
                                    jnp.float32)
        batch["lidar2img"] = jnp.broadcast_to(
            jnp.eye(4, dtype=jnp.float32), (batch_size, n_cam, 4, 4))
    model = SRFDet(cfg)
    if variables is None:
        variables = jax.jit(lambda r, b: model.init(r, b, train=False))(
            jax.random.PRNGKey(rng_seed), batch)

    if bake_params:
        def predict(batch):
            return model.apply(variables, batch, method=SRFDet.predict)
        return predict, (batch,)

    def predict(variables, batch):
        return model.apply(variables, batch, method=SRFDet.predict)
    return predict, (variables, batch)


def export_predict(cfg, out_path: str, variables=None,
                   bake_params: bool = False, batch_size: int = 1,
                   platforms=None) -> "jax.export.Exported":
    import jax

    fn, args = build_predict(cfg, variables=variables,
                             bake_params=bake_params, batch_size=batch_size)
    exp = jax.export.export(jax.jit(fn), platforms=platforms)(*args)
    data = exp.serialize()
    with open(out_path, "wb") as f:
        f.write(data)
    return exp


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--config", required=True,
                   help="config factory name (srfdet3d_tpu.configs)")
    p.add_argument("--out", required=True, help="output artifact path")
    p.add_argument("--checkpoint", default=None,
                   help="orbax checkpoint dir to export weights from "
                        "(default: fresh init)")
    p.add_argument("--bake-params", action="store_true",
                   help="embed parameters as program constants")
    p.add_argument("--batch-size", type=int, default=1)
    p.add_argument("--platforms", default=None,
                   help="comma-separated lowering platforms, e.g. tpu "
                        "(default: current backend)")
    args = p.parse_args(argv)

    import srfdet3d_tpu.configs as configs
    cfg = getattr(configs, args.config)()

    variables = None
    if args.checkpoint:
        import jax

        import __graft_entry__ as graft
        from srfdet3d_tpu.train import create_train_state
        from srfdet3d_tpu.utils.checkpoint import restore_checkpoint
        batch = graft._synthetic_batch(cfg, batch_size=args.batch_size)
        _, state, _ = create_train_state(cfg, jax.random.PRNGKey(0), batch)
        state = restore_checkpoint(args.checkpoint, state)
        variables = {"params": state.params,
                     "batch_stats": state.batch_stats}

    platforms = args.platforms.split(",") if args.platforms else None
    exp = export_predict(cfg, args.out, variables=variables,
                         bake_params=args.bake_params,
                         batch_size=args.batch_size, platforms=platforms)
    size = os.path.getsize(args.out)
    print(f"exported {args.config} predict -> {args.out} "
          f"({size / 1e6:.1f} MB, platforms={list(exp.platforms)}, "
          f"{len(exp.in_avals)} inputs)")


if __name__ == "__main__":
    main()
