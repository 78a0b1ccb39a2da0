from .rays import place_ray_sharded, render_ray_sharded
from .mesh import (
    batch_sharding,
    data_parallel_jit,
    make_mesh,
    replicate,
    replicated_sharding,
    shard_batch,
)

__all__ = [
    "make_mesh",
    "batch_sharding",
    "replicated_sharding",
    "replicate",
    "shard_batch",
    "data_parallel_jit",
    "render_ray_sharded",
    "place_ray_sharded",
]
