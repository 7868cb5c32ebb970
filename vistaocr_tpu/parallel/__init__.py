from .mesh import (
    MeshConfig,
    make_mesh,
    batch_sharding,
    replicated,
    param_shardings,
    shard_batch_arrays,
)

__all__ = [
    "MeshConfig",
    "make_mesh",
    "batch_sharding",
    "replicated",
    "param_shardings",
    "shard_batch_arrays",
]
