from fusiondepth_tpu.parallel.mesh import (
    make_mesh,
    make_mesh_2d,
    batch_sharding,
    replicated_sharding,
    shard_batch,
    shard_batch_spatial,
)
from fusiondepth_tpu.parallel.multihost import (
    global_batch,
    local_batch_size,
    maybe_initialize_distributed,
    shard_lines,
)

__all__ = [
    "make_mesh",
    "make_mesh_2d",
    "batch_sharding",
    "replicated_sharding",
    "shard_batch",
    "shard_batch_spatial",
    "global_batch",
    "local_batch_size",
    "maybe_initialize_distributed",
    "shard_lines",
]
