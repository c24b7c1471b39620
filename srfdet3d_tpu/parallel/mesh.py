"""Device-mesh utilities: GSPMD data (+ optional model) parallelism.

The reference's parallelism inventory is exactly data parallelism (SURVEY
§2.3): torch.distributed.launch + NCCL DDP (dist_train.sh:8-9), all-gather
SyncBN (ops/norm.py:9-24) and reduce_mean loss normalizers
(srfdet_head.py:873-884).  The TPU-native mapping is one `jax.sharding.Mesh`
with a `data` axis; batches are sharded on their leading dim and parameters
replicated.  Under jit, global-batch reductions inside the loss ARE the
cross-replica collectives (XLA inserts psums), so DDP/SyncBN/reduce_mean all
collapse into ordinary jnp reductions — no explicit communication code.

Beyond the reference, a second optional `model` mesh axis shards the
decoder's PROPOSAL dimension (the detection analogue of sequence
parallelism): every per-proposal computation — RoI gathers, DynamicConv,
FFN, cls/reg towers — partitions cleanly over proposals, and the one
cross-proposal op (self-attention) becomes a K/V all-gather that GSPMD
inserts from the `with_sharding_constraint` annotations in models/head.py.
Activate by tracing the jitted step inside `proposal_sharding(mesh)` with a
mesh that has a "model" axis (see `make_mesh_2d`).  Constraints bake in at
TRACE time — use a fresh function per mesh, never re-jit one traced without
the context (jit caches on the function object, PERF.md).

Multi-host: `jax.distributed.initialize()` before `make_mesh()`; the same
code then spans slices (DCN) transparently.
"""

from __future__ import annotations

import contextlib
from typing import Any, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

MODEL_AXIS = "model"
DATA_AXIS = "data"

_active_model_mesh: Optional[Mesh] = None
_sync_axis: Optional[str] = None


@contextlib.contextmanager
def data_sync(axis_name: str = DATA_AXIS):
    """Trace-time context: we are INSIDE a shard_map over `axis_name`.

    BatchNorms and loss normalizers consult `sync_axis()` to decide
    whether to insert explicit psums (SyncBN / reduce_mean semantics on
    the shard_map train path, parallel/trainer).  Outside the context
    (plain jit / GSPMD), global-batch reductions already span the mesh
    and no named-axis collectives exist, so everything stays None."""
    global _sync_axis
    prev = _sync_axis
    _sync_axis = axis_name
    try:
        yield
    finally:
        _sync_axis = prev


def sync_axis() -> Optional[str]:
    return _sync_axis


def psum_if_sync(x):
    """lax.psum over the data axis when tracing inside `data_sync`."""
    ax = _sync_axis
    return jax.lax.psum(x, ax) if ax is not None else x


def make_mesh(n_devices: Optional[int] = None,
              axis_name: str = "data") -> Mesh:
    """1-D data-parallel mesh over the first n (default: all) devices."""
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (axis_name,))


def make_mesh_2d(n_data: int, n_model: int) -> Mesh:
    """2-D (data, model) mesh over the first n_data*n_model devices.

    The model axis is the fast (adjacent-device) axis so proposal-axis
    collectives (attention K/V all-gathers) ride the shortest ICI hops.
    """
    devs = jax.devices()[:n_data * n_model]
    if len(devs) < n_data * n_model:
        raise ValueError(f"need {n_data * n_model} devices, "
                         f"have {len(jax.devices())}")
    return Mesh(np.asarray(devs).reshape(n_data, n_model),
                (DATA_AXIS, MODEL_AXIS))


@contextlib.contextmanager
def proposal_sharding(mesh: Mesh):
    """Trace-time context: `shard_proposal_axis` constraints target `mesh`.

    Wrap the FIRST call of a jitted step (tracing happens then); outside
    the context the constraints are no-ops, keeping single-device and
    pure-DP programs annotation-free.
    """
    global _active_model_mesh
    if MODEL_AXIS not in mesh.axis_names:
        raise ValueError(f"mesh {mesh.axis_names} has no '{MODEL_AXIS}' axis")
    prev = _active_model_mesh
    _active_model_mesh = mesh
    try:
        yield
    finally:
        _active_model_mesh = prev


def shard_proposal_axis(x: jax.Array, axis: int = 1) -> jax.Array:
    """Constrain `x` to shard dim `axis` over the model mesh axis.

    No-op unless tracing inside `proposal_sharding(mesh)`; silently skips
    tensors whose axis size does not divide the mesh (e.g. tiny test
    configs), mirroring the capacity discipline used everywhere else.
    Also shards the leading batch dim over `data` when divisible.
    """
    mesh = _active_model_mesh
    if mesh is None:
        return x
    n_model = mesh.shape[MODEL_AXIS]
    if x.ndim <= axis or x.shape[axis] % n_model:
        return x
    spec = [None] * x.ndim
    spec[axis] = MODEL_AXIS
    if (DATA_AXIS in mesh.axis_names and axis != 0
            and x.shape[0] % mesh.shape[DATA_AXIS] == 0):
        spec[0] = DATA_AXIS
    return jax.lax.with_sharding_constraint(
        x, NamedSharding(mesh, P(*spec)))


def _put(x: Any, sharding: NamedSharding) -> jax.Array:
    """device_put, or — when the mesh spans non-addressable devices
    (multi-host: jax.distributed across processes) — assemble the global
    array from this process's addressable shards.  Callers pass the same
    GLOBAL host value on every process (identical seeds / batches), the
    multi-controller contract of tools/dist_train.sh."""
    if sharding.is_fully_addressable:
        return jax.device_put(x, sharding)
    arr = np.asarray(x)
    return jax.make_array_from_callback(
        arr.shape, sharding, lambda idx: arr[idx])


def shard_batch(batch: Any, mesh: Mesh, axis_name: str = "data") -> Any:
    """Shard every leaf's leading (batch) dim across the mesh."""
    sharding = NamedSharding(mesh, P(axis_name))
    return jax.tree_util.tree_map(lambda x: _put(x, sharding), batch)


def replicate(tree: Any, mesh: Mesh) -> Any:
    """Fully replicate a pytree (parameters, optimizer state)."""
    sharding = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda x: _put(x, sharding), tree)
