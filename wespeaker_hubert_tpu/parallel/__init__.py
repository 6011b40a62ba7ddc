from .launch import host_rank_world, initialize_distributed
from .mesh import (
    DATA_AXIS,
    MODEL_AXIS,
    batch_sharding,
    head_weight_spec,
    make_mesh,
    param_shardings,
    replicated,
    shard_batch,
    shard_tree,
)

__all__ = [
    "host_rank_world",
    "initialize_distributed",
    "DATA_AXIS",
    "MODEL_AXIS",
    "batch_sharding",
    "head_weight_spec",
    "make_mesh",
    "param_shardings",
    "replicated",
    "shard_batch",
    "shard_tree",
]
