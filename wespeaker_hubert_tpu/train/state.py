"""Train state pytree + optimizer construction.

The optimizer matches the reference's supervised recipe (reference:
wespeaker/bin/train.py:176-185 builds torch SGD(momentum, nesterov,
weight_decay) or Adam from config): torch-SGD semantics are reproduced as
optax chain(add_decayed_weights -> trace(momentum, nesterov) ->
scale_by_schedule(-lr)) — weight decay is added to the gradient BEFORE
momentum exactly like torch's coupled L2.
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import flax.struct
import jax
import jax.numpy as jnp
import optax

__all__ = ["TrainState", "make_optimizer", "create_train_state"]


class TrainState(flax.struct.PyTreeNode):
    step: jax.Array
    params: Any
    batch_stats: Any
    opt_state: Any


def make_optimizer(
    lr_schedule: Callable,
    optimizer: str = "SGD",
    momentum: float = 0.9,
    nesterov: bool = True,
    weight_decay: float = 1e-4,
) -> optax.GradientTransformation:
    parts = []
    if weight_decay:
        parts.append(optax.add_decayed_weights(weight_decay))
    if optimizer.upper() == "SGD":
        if momentum:
            parts.append(optax.trace(decay=momentum, nesterov=nesterov))
    elif optimizer.upper() == "ADAM":
        parts.append(optax.scale_by_adam())
    elif optimizer.upper() == "ADAMW":
        # decoupled decay: replace the coupled add above
        parts = [optax.scale_by_adam(), optax.add_decayed_weights(weight_decay)]
    else:
        raise ValueError(f"unknown optimizer {optimizer!r}")
    parts.append(
        optax.scale_by_schedule(lambda s: -lr_schedule(s))
    )
    return optax.chain(*parts)


def create_train_state(
    model,
    tx: optax.GradientTransformation,
    rng: jax.Array,
    example_feats: jax.Array,
    example_label: jax.Array,
) -> TrainState:
    variables = model.init(rng, example_feats, example_label, 0.0, train=True)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=batch_stats,
        opt_state=tx.init(params),
    )
