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
    freeze_paths: tuple = (),
) -> optax.GradientTransformation:
    """torch-semantics optimizer chain.  `freeze_paths`: tuple of path-key
    tuples (e.g. (("frontend", "upstream"),)); params whose tree path
    contains such a subsequence get ZERO updates — the functional analogue
    of the reference's requires_grad_(False) freeze (frontend/s3prl.py:70),
    which also keeps coupled weight decay off frozen params."""
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
    tx = optax.chain(*parts)
    if not freeze_paths:
        if optimizer.upper() == "SGD" and momentum and weight_decay:
            # Fused update+apply for the production SGD chain: the optax
            # stage-by-stage evaluation materializes intermediate update
            # trees and launches several kernels PER LEAF — profiled at
            # 4.7 ms/step for ECAPA_c1024's ~150 leaves (27% of the
            # whole train step; docs/PERF_NOTES.md round-5).  This
            # closed form computes new_momentum and new_params in two
            # tree.maps with identical semantics AND an identical
            # opt_state structure (chain(EmptyState, TraceState,
            # ScaleByScheduleState)), so checkpoints interchange with
            # the unfused path.  The executor uses .update_apply when
            # present; .init/.update stay the plain optax path.
            return _FusedTx(
                tx,
                _make_sgd_update_apply(
                    lr_schedule, momentum, nesterov, weight_decay
                ),
            )
        return tx

    def label_fn(params):
        def label(path, _):
            keys = tuple(
                getattr(p, "key", getattr(p, "name", None)) for p in path
            )
            for frozen in freeze_paths:
                if all(k in keys for k in frozen):
                    return "freeze"
            return "train"

        return jax.tree_util.tree_map_with_path(label, params)

    return optax.multi_transform(
        {"train": tx, "freeze": optax.set_to_zero()}, label_fn
    )


class _FusedTx:
    """optax-compatible (init/update) plus a fused update_apply — a
    plain object because GradientTransformation is a frozen NamedTuple."""

    def __init__(self, tx, update_apply):
        self.init = tx.init
        self.update = tx.update
        self.update_apply = update_apply


def _make_sgd_update_apply(lr_schedule, momentum, nesterov, weight_decay):
    """(grads, opt_state, params) -> (new_params, new_opt_state), equal
    to chain(add_decayed_weights, trace, scale_by_schedule) + optax.
    apply_updates but evaluated in closed form:

        u     = g + wd * p                       (coupled decay)
        m_new = u + momentum * m                 (optax.trace)
        out   = u + momentum * m_new  [nesterov] (trace's read-out)
        p_new = p - lr(count) * out
    """

    def update_apply(grads, opt_state, params):
        empty_state, trace_state, sched_state = opt_state
        count = sched_state.count
        lrv = lr_schedule(count)
        mom = trace_state.trace
        new_m = jax.tree.map(
            lambda g, p, m: (g + weight_decay * p) + momentum * m,
            grads, params, mom,
        )
        if nesterov:
            new_p = jax.tree.map(
                lambda p, g, m2: p
                - lrv * ((g + weight_decay * p) + momentum * m2),
                params, grads, new_m,
            )
        else:
            new_p = jax.tree.map(
                lambda p, m2: p - lrv * m2, params, new_m
            )
        new_state = (
            empty_state,
            trace_state._replace(trace=new_m),
            sched_state._replace(count=count + 1),
        )
        return new_p, new_state

    return update_apply


def create_train_state(
    model,
    tx: optax.GradientTransformation,
    rng: jax.Array,
    example_feats: jax.Array,
    example_label: jax.Array,
    example_wav: Optional[jax.Array] = None,
) -> TrainState:
    """Initialize params/optimizer.  `example_wav` must be provided when the
    model has an SSL frontend (its params are created by tracing the
    `features` method and merged into the tree)."""
    rng_main, rng_front = jax.random.split(rng)
    variables = model.init(
        rng_main, example_feats, example_label, 0.0, train=True
    )
    params = dict(variables["params"])
    batch_stats = dict(variables.get("batch_stats", {}))
    if getattr(model, "frontend", None) is not None:
        assert example_wav is not None, "frontend model needs example_wav"
        fvars = model.init(
            rng_front, example_wav, train=True, method=model.features
        )
        params.update(fvars["params"])
        batch_stats.update(fvars.get("batch_stats", {}))
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=batch_stats,
        opt_state=tx.init(params),
    )
