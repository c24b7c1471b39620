"""Every shipped config must ASSEMBLE into a full-size model.

test_configs_parity.py pins the literal field values; this certifies the
other half — that each of the 11 experiment configs actually builds (all
inter-module channel/stride/shape contracts hold at the real capacities).
`jax.eval_shape` traces the full init abstractly (no FLOPs, ~5-15 s per
config on CPU), so the whole matrix stays affordable in the default suite.

Param counts are pinned (our own literals) so an accidental architecture
change in any family fails loudly; the flagship's 23.08M is in PERF.md's
measured ballpark (22.9M at the time of the train-step benchmarks).
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

import srfdet3d_tpu.configs as configs
from srfdet3d_tpu.models.detector import SRFDet

import __graft_entry__ as graft

# (factory name, expected params in millions, rel tolerance)
ALL_CONFIGS = [
    ("srfdet_voxel_nusc_L", 23.08),
    ("srfdet_voxel_nusc_LC", 103.73),
    ("srfdet_voxel_r50_LC", None),
    ("srfdet_pillar_nusc_L", None),
    ("srfdet_pillar_r50_LC", None),
    ("srfdet_pillar_v299_LC", None),
    ("srfdet_voxel_kitti_L", None),
    ("srfdet_voxel_kitti_LC", None),
    ("srfdet_dvoxel_waymo_L", None),
    ("srfdet_dvoxel_waymo_LC", None),
    ("srfdet_dvoxel_nusc_L", None),
]


def _full_batch(cfg):
    batch = graft._synthetic_batch(cfg, 1)
    if cfg.use_img:
        h, w = cfg.img.img_shape
        batch["images"] = jnp.zeros((1, cfg.img.num_cams, h, w, 3),
                                    jnp.float32)
        batch["lidar2img"] = jnp.broadcast_to(
            jnp.eye(4, dtype=jnp.float32), (1, cfg.img.num_cams, 4, 4))
    return batch


@pytest.mark.parametrize("name,want_m", ALL_CONFIGS,
                         ids=[n for n, _ in ALL_CONFIGS])
def test_config_assembles_full_size(name, want_m):
    cfg = getattr(configs, name)()
    model = SRFDet(cfg)
    batch = _full_batch(cfg)
    tree = jax.eval_shape(lambda r, b: model.init(r, b, train=False),
                          jax.random.PRNGKey(0), batch)
    assert "params" in tree
    n_params = sum(int(np.prod(x.shape))
                   for x in jax.tree_util.tree_leaves(tree["params"]))
    assert n_params > 1e5, f"{name}: suspiciously few params ({n_params})"
    if want_m is not None:
        np.testing.assert_allclose(n_params / 1e6, want_m, rtol=1e-3,
                                   err_msg=f"{name} param count drifted")
    # the predict surface must trace too (decode shapes consistent)
    out = jax.eval_shape(
        lambda v, b: model.apply(v, b, method=SRFDet.predict), tree, batch)
    assert set(out) >= {"boxes", "scores", "labels", "valid"}
    assert out["boxes"].shape[0] == 1
