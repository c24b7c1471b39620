"""Device-mesh utilities: GSPMD data parallelism over ICI/DCN.

The reference's parallelism inventory is exactly data parallelism (SURVEY
§2.3): torch.distributed.launch + NCCL DDP (dist_train.sh:8-9), all-gather
SyncBN (ops/norm.py:9-24) and reduce_mean loss normalizers
(srfdet_head.py:873-884).  The TPU-native mapping is one `jax.sharding.Mesh`
with a `data` axis; batches are sharded on their leading dim and parameters
replicated.  Under jit, global-batch reductions inside the loss ARE the
cross-replica collectives (XLA inserts psums), so DDP/SyncBN/reduce_mean all
collapse into ordinary jnp reductions — no explicit communication code.

Multi-host: `jax.distributed.initialize()` before `make_mesh()`; the same
code then spans slices (DCN) transparently.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None,
              axis_name: str = "data") -> Mesh:
    """1-D data-parallel mesh over the first n (default: all) devices."""
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (axis_name,))


def shard_batch(batch: Any, mesh: Mesh, axis_name: str = "data") -> Any:
    """Shard every leaf's leading (batch) dim across the mesh."""
    sharding = NamedSharding(mesh, P(axis_name))
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), batch)


def replicate(tree: Any, mesh: Mesh) -> Any:
    """Fully replicate a pytree (parameters, optimizer state)."""
    sharding = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), tree)
