"""Worker for test_disteval.py: one host of a 2-process jax.distributed
cluster running the SHARDED evaluation path of tools/test.py
(run_inference_eval: strided per-process dataset shard, local inference,
process_allgather of fixed-shape frame results, identical metrics on
every controller)."""
import os
import sys

proc_id = int(sys.argv[1])
num_procs = int(sys.argv[2])
coord = sys.argv[3]

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = " ".join(f for f in os.environ.get("XLA_FLAGS", "").split()
                  if "xla_force_host_platform_device_count" not in f)
os.environ["XLA_FLAGS"] = (
    _flags + " --xla_force_host_platform_device_count=4").strip()
for k in list(os.environ):
    if k.startswith("PALLAS_AXON") or k.startswith("AXON_"):
        del os.environ[k]

import jax  # noqa: E402

jax.distributed.initialize(coordinator_address=coord,
                           num_processes=num_procs,
                           process_id=proc_id)

import dataclasses  # noqa: E402

import jax.numpy as jnp  # noqa: E402

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from srfdet3d_tpu.configs import tiny_test_config  # noqa: E402
from srfdet3d_tpu.data import SyntheticDataset, data_loader  # noqa: E402
from srfdet3d_tpu.train import create_train_state, make_eval_step  # noqa: E402
from tools.test import run_inference_eval  # noqa: E402

cfg = tiny_test_config(points_cap=256, voxels_cap=256, gt_cap=4)
cfg = cfg.replace(
    middle=dataclasses.replace(cfg.middle, capacities=(128, 64, 32, 32)),
    head=dataclasses.replace(cfg.head, num_proposals=8))

dataset = SyntheticDataset(cfg, length=5, test_mode=False, augment=False)
sample = next(iter(data_loader(dataset, 2, shuffle=False, num_workers=0)))
sample = {k: jnp.asarray(v) for k, v in sample.items()}
model, state, _ = create_train_state(cfg, jax.random.PRNGKey(0), sample,
                                     total_steps=1)
out_pkl = sys.argv[4] if len(sys.argv) > 4 else None
res = run_inference_eval(cfg, dataset, state, make_eval_step(model),
                         batch_size=2, out=out_pkl)
print(f"DISTEVAL_OK proc={proc_id} mAP={res['mAP']:.10f} "
      f"NDS={res['NDS']:.10f}", flush=True)
