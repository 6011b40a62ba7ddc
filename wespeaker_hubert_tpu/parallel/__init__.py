from .launch import host_rank_world, initialize_distributed
from .pipeline import (
    PIPE_AXIS,
    pipeline_apply,
    pipelined_ssl_hidden_states,
    stack_encoder_layers,
)
from .mesh import (
    DATA_AXIS,
    MODEL_AXIS,
    batch_sharding,
    head_weight_spec,
    make_mesh,
    param_shardings,
    replicated,
    sequence_parallel_constraint,
    shard_batch,
    shard_tree,
)

__all__ = [
    "host_rank_world",
    "initialize_distributed",
    "PIPE_AXIS",
    "pipeline_apply",
    "pipelined_ssl_hidden_states",
    "stack_encoder_layers",
    "DATA_AXIS",
    "MODEL_AXIS",
    "batch_sharding",
    "head_weight_spec",
    "make_mesh",
    "param_shardings",
    "replicated",
    "sequence_parallel_constraint",
    "shard_batch",
    "shard_tree",
]
