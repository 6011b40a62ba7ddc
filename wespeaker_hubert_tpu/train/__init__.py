from .executor import (
    cross_entropy,
    cast_variables_bf16,
    make_eval_embed,
    make_train_step,
    shard_train_state,
)
from .schedulers import (
    ExponentialDecrease,
    MarginSchedule,
    TriAngular2,
    get_lr_schedule,
)
from .state import TrainState, create_train_state, make_optimizer

__all__ = [
    "cross_entropy",
    "cast_variables_bf16",
    "make_eval_embed",
    "make_train_step",
    "shard_train_state",
    "ExponentialDecrease",
    "MarginSchedule",
    "TriAngular2",
    "get_lr_schedule",
    "TrainState",
    "create_train_state",
    "make_optimizer",
]
