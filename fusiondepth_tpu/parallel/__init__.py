from fusiondepth_tpu.parallel.mesh import (
    make_mesh,
    make_mesh_2d,
    batch_sharding,
    replicated_sharding,
    shard_batch,
    shard_batch_spatial,
)

__all__ = [
    "make_mesh",
    "make_mesh_2d",
    "batch_sharding",
    "replicated_sharding",
    "shard_batch",
    "shard_batch_spatial",
]
