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
