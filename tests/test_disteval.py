"""Distributed evaluation (tools/dist_test.sh semantics): 2 processes
shard the val set, all-gather fixed-shape results, and must report the
SAME metrics as a single-process evaluation of the whole set."""
import dataclasses
import os
import re
import socket
import subprocess
import sys

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from srfdet3d_tpu.configs import tiny_test_config
from srfdet3d_tpu.data import SyntheticDataset, data_loader
from srfdet3d_tpu.train import create_train_state, make_eval_step


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _cfg():
    cfg = tiny_test_config(points_cap=256, voxels_cap=256, gt_cap=4)
    return cfg.replace(
        middle=dataclasses.replace(cfg.middle, capacities=(128, 64, 32, 32)),
        head=dataclasses.replace(cfg.head, num_proposals=8))


@pytest.mark.slow
def test_two_process_sharded_eval_matches_single(tmp_path):
    import pickle

    here = os.path.dirname(__file__)
    worker = os.path.join(here, "_disteval_worker.py")
    coord = f"127.0.0.1:{_free_port()}"
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    for k in list(env):
        if k.startswith("PALLAS_AXON") or k.startswith("AXON_"):
            env.pop(k)

    dist_pkl = os.path.join(tmp_path, "dist_preds.pkl")
    procs = [subprocess.Popen(
        [sys.executable, worker, str(i), "2", coord, dist_pkl],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        env=env, cwd=os.path.join(here, ".."))
        for i in range(2)]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=900)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
                p.wait()
    vals = []
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out[-3000:]}"
        m = re.search(r"DISTEVAL_OK proc=\d+ mAP=([\d.eE+-]+) "
                      r"NDS=([\d.eE+-]+)", out)
        assert m, f"no DISTEVAL_OK line:\n{out[-3000:]}"
        vals.append((float(m.group(1)), float(m.group(2))))
    assert vals[0] == vals[1], vals

    # single-process oracle over the SAME deterministic dataset/params
    from tools.test import run_inference_eval
    cfg = _cfg()
    dataset = SyntheticDataset(cfg, length=5, test_mode=False, augment=False)
    sample = next(iter(data_loader(dataset, 2, shuffle=False,
                                   num_workers=0)))
    sample = {k: jnp.asarray(v) for k, v in sample.items()}
    model, state, _ = create_train_state(cfg, jax.random.PRNGKey(0), sample,
                                         total_steps=1)
    single_pkl = os.path.join(tmp_path, "single_preds.pkl")
    res = run_inference_eval(cfg, dataset, state, make_eval_step(model),
                             batch_size=2, out=single_pkl)
    np.testing.assert_allclose(vals[0][0], res["mAP"], atol=1e-9)
    np.testing.assert_allclose(vals[0][1], res["NDS"], atol=1e-9)

    # content-level check: the gathered dump holds the SAME per-frame
    # predictions (shard interleaving reorders frames — match on the
    # frame's unique GT bytes)
    with open(dist_pkl, "rb") as f:
        dist = pickle.load(f)
    with open(single_pkl, "rb") as f:
        single = pickle.load(f)
    assert len(dist["preds"]) == len(single["preds"]) == 5

    def by_gt(dump):
        return {d["boxes"].tobytes(): p
                for d, p in zip(dump["gts"], dump["preds"])}

    dmap, smap = by_gt(dist), by_gt(single)
    assert set(dmap) == set(smap) and len(dmap) == 5
    # tolerance certifies GATHER integrity (right frames, right rows);
    # the worker processes compile their own XLA programs (4 devices, no
    # shared autotuning), which drifts box floats by ~2e-5
    for key in smap:
        np.testing.assert_allclose(dmap[key]["boxes"], smap[key]["boxes"],
                                   rtol=1e-3, atol=1e-3)
        np.testing.assert_allclose(dmap[key]["scores"], smap[key]["scores"],
                                   rtol=1e-3, atol=1e-3)
