"""Checkpoint round-trip, partial loads, torch layout conversion, CLI."""
import os
import subprocess
import sys

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from srfdet3d_tpu.configs import tiny_test_config
from srfdet3d_tpu.train import create_train_state
from srfdet3d_tpu.utils import (load_partial, restore_checkpoint,
                                save_checkpoint, torch_to_jax_array)

import __graft_entry__ as graft

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _state():
    cfg = tiny_test_config()
    batch = graft._synthetic_batch(cfg, 1)
    _, state, _ = create_train_state(cfg, jax.random.PRNGKey(0), batch,
                                     total_steps=10)
    return cfg, state


def test_checkpoint_roundtrip(tmp_path):
    cfg, state = _state()
    state = state.replace(step=jnp.asarray(7, jnp.int32))
    path = str(tmp_path / "ckpt")
    save_checkpoint(path, jax.device_get(state), meta={"config": cfg.name})
    assert os.path.exists(path + ".meta.json")

    # zeroed template: same treedef/shapes, provably different values
    fresh = jax.tree_util.tree_map(jnp.zeros_like, state)
    restored = restore_checkpoint(path, fresh)
    assert int(restored.step) == 7
    a = jax.tree_util.tree_leaves(state.params)
    b = jax.tree_util.tree_leaves(restored.params)
    assert all(np.allclose(x, y) for x, y in zip(a, b))


def test_partial_load(tmp_path):
    cfg, state = _state()
    path = str(tmp_path / "ckpt")
    save_checkpoint(path, jax.device_get(state))

    # shifted params: provably different, then partial load restores pts_backbone
    fresh = state.replace(params=jax.tree_util.tree_map(
        lambda x: x + 1.0, state.params))
    merged = load_partial(fresh.params, path, prefix="pts_backbone")
    orig = jax.tree_util.tree_leaves(state.params["pts_backbone"])
    new = jax.tree_util.tree_leaves(merged["pts_backbone"])
    assert all(np.allclose(x, y) for x, y in zip(orig, new))
    # other modules untouched (still shifted)
    o2 = jax.tree_util.tree_leaves(state.params["bbox_head"])
    n2 = jax.tree_util.tree_leaves(merged["bbox_head"])
    assert not all(np.allclose(x, y) for x, y in zip(o2, n2))


def test_torch_layout_conversion():
    import torch
    conv = torch.nn.Conv2d(3, 8, 3)
    w = torch_to_jax_array(conv.weight)
    assert w.shape == (3, 3, 3, 8)          # HWIO
    lin = torch.nn.Linear(4, 6)
    w2 = torch_to_jax_array(lin.weight)
    assert w2.shape == (4, 6)               # (in, out)


@pytest.mark.slow
def test_train_cli_synthetic(tmp_path):
    env = dict(os.environ, JAX_PLATFORMS="cpu",
               XLA_FLAGS="--xla_force_host_platform_device_count=2",
               PYTHONPATH=REPO)
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "train.py"),
         "srfdet_voxel_nusc_L", "--synthetic", "--synthetic-length", "4",
         "--epochs", "1", "--batch-size", "2", "--log-interval", "1",
         "--work-dir", str(tmp_path),
         "--cfg-options", "points_cap=2048", "voxels_cap=2048", "gt_cap=8",
         "head.num_proposals=24", "head.num_heads=2",
         "head.feat_channels_lidar=32", "head.hidden_dim=32",
         "head.num_dpg_exp=2", "head.dim_feedforward=64",
         "head.num_attn_heads=4", "head.dynamic_dim=8",
         "middle.base_channels=8", "middle.output_channels=32",
         'middle.encoder_channels=[[8,16],[16,16],[16,16],[16,16]]',
         'middle.encoder_paddings=[[0,1],[0,1],[0,[0,1,1]],[0,0]]',
         'middle.capacities=[1024,512,256,256]',
         'backbone.out_channels=[32,64]', 'backbone.layer_nums=[1,1]',
         "neck_out_channels=32",
         "voxel_size=[0.25,0.25,0.2]",
         "pc_range=[-10.0,-10.0,-5.0,10.0,10.0,3.0]",
         "ota.pc_range=[-10.0,-10.0,-5.0,10.0,10.0,3.0]",
         "test.post_center_range=[-12.0,-12.0,-10.0,12.0,12.0,10.0]"],
        capture_output=True, text=True, timeout=900, env=env)
    assert out.returncode == 0, out.stderr[-3000:]
    assert "training done" in out.stdout
    assert "epoch_1" in out.stdout
