from .mesh import (make_mesh, make_mesh_2d, proposal_sharding, replicate,
                   shard_batch, shard_proposal_axis)

__all__ = ["make_mesh", "make_mesh_2d", "proposal_sharding", "replicate",
           "shard_batch", "shard_proposal_axis"]
