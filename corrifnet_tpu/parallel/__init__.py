from corrifnet_tpu.parallel.mesh import default_mesh_shape, make_mesh
from corrifnet_tpu.parallel.sharding import (
    batch_sharding,
    param_partition_spec,
    put_batch,
    replicated,
    shard_params,
    shard_state,
)

__all__ = [
    "default_mesh_shape",
    "make_mesh",
    "batch_sharding",
    "param_partition_spec",
    "put_batch",
    "replicated",
    "shard_params",
    "shard_state",
]
