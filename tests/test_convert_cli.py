"""tools/convert_checkpoint.py end-to-end: torch .pth -> orbax -> loaded
TrainState -> finite forward.

Drives the CLI a user with a released reference checkpoint runs: the
synthetic reference-named state_dict from test_torch_convert_full is
saved as a real mmcv-style .pth (torch tensors under 'state_dict', keys
prefixed 'module.' like distributed saves), converted via main(), then
load_pretrained must restore params AND the torch BN running stats, and
tools/test.py's load_for_eval must pick the partial path."""
import json
import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from srfdet3d_tpu.configs import CONFIGS
from srfdet3d_tpu.train import create_train_state, make_eval_step
from srfdet3d_tpu.utils import load_for_eval

import __graft_entry__ as graft
from tests.test_torch_convert_full import (_shrunk_flagship,
                                           _synthetic_torch_state)


@pytest.mark.slow
def test_convert_checkpoint_cli_roundtrip(tmp_path):
    import torch

    from tools.convert_checkpoint import main as convert_main

    cfg = _shrunk_flagship()
    rng = np.random.default_rng(0)
    state_np = _synthetic_torch_state(cfg, rng)
    pth = os.path.join(tmp_path, "reference.pth")
    torch.save({"state_dict": {f"module.{k}": torch.from_numpy(v)
                               for k, v in state_np.items()},
                "meta": {"exp_name": "srfdet_voxel_nusc_L"}}, pth)

    out = os.path.join(tmp_path, "converted")
    CONFIGS["_test_shrunk_flagship"] = _shrunk_flagship
    try:
        convert_main(["_test_shrunk_flagship", pth, out])
    finally:
        del CONFIGS["_test_shrunk_flagship"]
    assert os.path.isdir(out)
    meta = json.load(open(out + ".meta.json"))
    assert meta["converted"] and meta["param_leaves"] > 100

    batch = graft._synthetic_batch(cfg, 1, seed=1)
    model, state, _ = create_train_state(cfg, jax.random.PRNGKey(0), batch,
                                         total_steps=1)
    loaded = load_for_eval(out, state)

    # params took the converted values (not the fresh init)… sum-of-abs
    # is invariant under the layout transpose and the bev in_perm
    w_t = state_np["pts_backbone.blocks.0.0.weight"]
    dst = loaded.params["pts_backbone"]["ConvBNReLU_0"]["Conv_0"]["kernel"]
    src0 = state.params["pts_backbone"]["ConvBNReLU_0"]["Conv_0"]["kernel"]
    assert not np.allclose(np.asarray(dst), np.asarray(src0))
    assert np.isclose(np.abs(w_t).sum(), np.abs(np.asarray(dst)).sum(),
                      rtol=1e-5)
    # …and the torch BN RUNNING STATS landed in batch_stats
    rv_t = state_np["pts_backbone.blocks.0.1.running_var"]
    rv_j = np.asarray(loaded.batch_stats["pts_backbone"]["ConvBNReLU_0"]
                      ["BatchNorm_0"]["var"])
    np.testing.assert_allclose(rv_j, rv_t, rtol=1e-6)

    eval_step = make_eval_step(model)
    out_fwd = eval_step(loaded,
                        {k: jnp.asarray(v) for k, v in batch.items()})
    assert all(bool(jnp.all(jnp.isfinite(v))) for v in out_fwd.values()
               if jnp.issubdtype(v.dtype, jnp.floating))
