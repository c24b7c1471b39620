"""Worker for test_multihost.py: one simulated host in a 2-process
jax.distributed cluster (CPU backend, 4 virtual devices per process).

Mirrors tools/dist_train.sh semantics: same coordinator address on every
process, distinct process_id, identical seeds -> identical params/batches,
global 8-device data mesh, one train step, prints the loss.
"""
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

import numpy as np  # noqa: E402
import jax  # noqa: E402

jax.distributed.initialize(coordinator_address=coord,
                           num_processes=num_procs,
                           process_id=proc_id)
assert jax.process_count() == num_procs
assert len(jax.local_devices()) == 4
assert len(jax.devices()) == 4 * num_procs

import dataclasses  # noqa: E402

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import __graft_entry__ as graft  # noqa: E402
from srfdet3d_tpu.configs import tiny_test_config  # noqa: E402
from srfdet3d_tpu.parallel import make_mesh, replicate, shard_batch  # noqa: E402
from srfdet3d_tpu.train import create_train_state, make_train_step  # noqa: E402

cfg = tiny_test_config(points_cap=256, voxels_cap=256, gt_cap=4)
cfg = cfg.replace(
    middle=dataclasses.replace(cfg.middle, capacities=(128, 64, 32, 32)),
    head=dataclasses.replace(cfg.head, num_proposals=8))

n_global = len(jax.devices())
mesh = make_mesh(n_global)
# every process builds the SAME global batch (seed-deterministic); _put
# slices out this process's addressable shards
batch = graft._synthetic_batch(cfg, n_global, with_gt=True, seed=0)
batch = {k: np.asarray(v) for k, v in batch.items()}

model, state, tx = create_train_state(
    cfg, jax.random.PRNGKey(0), jax.tree_util.tree_map(
        lambda x: x[:1], batch), total_steps=10)
step_fn = make_train_step(model, tx, cfg)
state = replicate(state, mesh)
batch_g = shard_batch(batch, mesh)
key = jax.random.PRNGKey(1)

# compile is process-local and can skew the two controllers by more than
# Gloo's 30-s rendezvous deadline — AOT-compile first, then align at the
# coordination-service barrier (no collectives) before executing.  The
# train step is TWO programs (trainer.py split); compile both: the apply
# program's input layout comes from the grad program's output shardings.
grad_c = step_fn.grad_prog.lower(state, batch_g, key).compile()
g_shapes = jax.eval_shape(step_fn.grad_prog, state, batch_g, key)
g_sds = jax.tree_util.tree_map(
    lambda aval, sh: jax.ShapeDtypeStruct(aval.shape, aval.dtype,
                                          sharding=sh),
    g_shapes, grad_c.output_shardings)
_, _, sds_new_bs, sds_grads = g_sds
apply_c = step_fn.apply_prog.lower(state, sds_new_bs, sds_grads).compile()


def compiled(state, batch_g, key):
    total, losses, new_bs, grads = grad_c(state, batch_g, key)
    new_state, grad_norm = apply_c(state, new_bs, grads)
    metrics = dict(losses)
    metrics["loss"] = total
    metrics["grad_norm"] = grad_norm
    return new_state, metrics
try:
    from jax._src import distributed as _dist
    _dist.global_state.client.wait_at_barrier("srfdet_mh_post_compile",
                                              600_000)
except Exception as e:  # private API moved — fall back to a grace sleep
    print(f"barrier fallback ({e})", flush=True)
    import time
    time.sleep(10)
state, metrics = compiled(state, batch_g, key)
loss = float(metrics["loss"])
gn = float(metrics["grad_norm"])
assert np.isfinite(loss) and np.isfinite(gn), (loss, gn)
assert int(state.step) == 1
print(f"MULTIHOST_OK proc={proc_id} loss={loss:.6f} grad_norm={gn:.6f}",
      flush=True)
