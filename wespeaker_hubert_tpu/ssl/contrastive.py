"""MoCo and SimCLR contrastive SSL training steps.

Rebuilds of the reference wrappers (reference:
wespeaker/ssl/models/moco_wrapper.py:14 — momentum key encoder + 65536
negative queue with concat_all_gather dequeue/enqueue; simclr_wrapper.py:20
— InfoNCE over the concatenated two-view batch) as jitted SPMD steps:

  * MoCo's queue is a fixed-size (K, D) buffer inside the state; the
    per-step enqueue uses the GLOBAL batch (under pjit the key embeddings
    are already a global array — the GSPMD analogue of
    concat_all_gather:193) and rolls the buffer, so K must be a multiple
    of the global batch.  DDP batch-shuffled-BN (:100-139) is unnecessary:
    with a single SPMD program, BatchNorm batch stats are computed over
    the whole global batch, which removes the intra-GPU BN leakage the
    shuffle works around.
  * SimCLR's InfoNCE builds positives/negatives masks statically.
"""

from __future__ import annotations

from typing import Any

import flax.struct
import jax
import jax.numpy as jnp
import optax

from ..models.registry import embedding_from_outputs

__all__ = [
    "MoCoState",
    "create_moco_state",
    "make_moco_train_step",
    "make_simclr_train_step",
    "info_nce_logits",
]


def _l2(x):
    return x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-12)


class MoCoState(flax.struct.PyTreeNode):
    step: jax.Array
    params_q: Any
    params_k: Any
    batch_stats_q: Any
    batch_stats_k: Any
    queue: jax.Array      # (K, D) normalized negative keys
    queue_ptr: jax.Array
    opt_state: Any


def create_moco_state(
    net,
    tx: optax.GradientTransformation,
    rng: jax.Array,
    example_feats: jax.Array,
    embed_dim: int,
    K: int = 65536,
) -> MoCoState:
    variables = net.init(rng, example_feats, train=True)
    params = variables["params"]
    stats = variables.get("batch_stats", {})
    queue = _l2(jax.random.normal(jax.random.fold_in(rng, 7), (K, embed_dim)))
    return MoCoState(
        step=jnp.zeros((), jnp.int32),
        params_q=params,
        params_k=jax.tree.map(jnp.copy, params),
        batch_stats_q=stats,
        batch_stats_k=jax.tree.map(jnp.copy, stats),
        queue=queue,
        queue_ptr=jnp.zeros((), jnp.int32),
        opt_state=tx.init(params),
    )


def make_moco_train_step(
    net,
    tx: optax.GradientTransformation,
    m: float = 0.999,
    T: float = 0.07,
    mesh=None,
    compute_dtype=None,
):
    """Batch: {'query_feat': (B, T, F), 'key_feat': (B, T, F)}.
    `compute_dtype=jnp.bfloat16` = the reference's enable_amp role:
    bf16 encoder fwd/bwd, f32 master weights, queue and InfoNCE f32."""

    def forward(params, stats, feats):
        if compute_dtype is not None:
            cast = lambda x: (
                x.astype(compute_dtype) if x.dtype == jnp.float32 else x
            )
            params = jax.tree.map(cast, params)
            feats = feats.astype(compute_dtype)
        variables = {"params": params}
        if stats:
            variables["batch_stats"] = stats
        out, updates = net.apply(
            variables, feats, train=True, mutable=["batch_stats"]
        )
        emb = embedding_from_outputs(out).astype(jnp.float32)
        return _l2(emb), updates.get("batch_stats", {})

    def step_fn(state: MoCoState, batch, rng):
        # momentum update of the key encoder FIRST (reference forward:155)
        params_k = jax.tree.map(
            lambda k, q: k * m + q * (1.0 - m), state.params_k, state.params_q
        )
        k_emb, new_stats_k = forward(
            params_k, state.batch_stats_k, batch["key_feat"]
        )
        k_emb = jax.lax.stop_gradient(k_emb)

        def loss_fn(params_q):
            q_emb, new_stats_q = forward(
                params_q, state.batch_stats_q, batch["query_feat"]
            )
            l_pos = jnp.sum(q_emb * k_emb, axis=1, keepdims=True)  # (B,1)
            l_neg = jnp.dot(
                q_emb, state.queue.T, preferred_element_type=jnp.float32
            )  # (B,K)
            logits = jnp.concatenate([l_pos, l_neg], axis=1) / T
            labels = jnp.zeros((logits.shape[0],), jnp.int32)
            loss = jnp.mean(
                optax.softmax_cross_entropy_with_integer_labels(logits, labels)
            )
            acc = jnp.mean(jnp.argmax(logits, axis=1) == 0)
            return loss, (new_stats_q, acc)

        (loss, (new_stats_q, acc)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params_q)
        updates, new_opt_state = tx.update(
            grads, state.opt_state, state.params_q
        )
        new_params_q = optax.apply_updates(state.params_q, updates)

        # dequeue/enqueue the (global) key batch
        bsz = k_emb.shape[0]
        k_total = state.queue.shape[0]
        new_queue = jax.lax.dynamic_update_slice(
            state.queue, k_emb, (state.queue_ptr, 0)
        )
        new_ptr = (state.queue_ptr + bsz) % k_total

        new_state = state.replace(
            step=state.step + 1,
            params_q=new_params_q,
            params_k=params_k,
            batch_stats_q=new_stats_q,
            batch_stats_k=new_stats_k,
            queue=new_queue,
            queue_ptr=new_ptr,
            opt_state=new_opt_state,
        )
        return new_state, {"loss": loss, "acc": acc}

    if mesh is None:
        return jax.jit(step_fn, donate_argnums=(0,))
    from jax.sharding import NamedSharding, PartitionSpec as P

    from ..parallel.mesh import DATA_AXIS

    batch_sh = NamedSharding(mesh, P(DATA_AXIS))
    return jax.jit(
        step_fn,
        donate_argnums=(0,),
        in_shardings=(None, batch_sh, NamedSharding(mesh, P())),
    )


def info_nce_logits(features: jax.Array, n_views: int, T: float):
    """(n_views*B, D) -> (logits, labels) with positives first
    (reference simclr_wrapper.prepare_for_info_nce_loss:46-85)."""
    n = features.shape[0]
    b = n // n_views
    feats = _l2(features)
    sim = jnp.dot(feats, feats.T, preferred_element_type=jnp.float32)

    ids = jnp.tile(jnp.arange(b), n_views)
    same = ids[None, :] == ids[:, None]
    eye = jnp.eye(n, dtype=bool)
    pos_mask = same & ~eye
    neg_mask = ~same

    # each row: (n_views - 1) positives then (n - n_views) negatives.
    # take_along_axis with argsorted masks keeps this fully static.
    pos_idx = jnp.argsort(~pos_mask, axis=1)[:, : n_views - 1]
    neg_idx = jnp.argsort(~neg_mask, axis=1)[:, : n - n_views]
    positives = jnp.take_along_axis(sim, pos_idx, axis=1)
    negatives = jnp.take_along_axis(sim, neg_idx, axis=1)
    logits = jnp.concatenate([positives, negatives], axis=1) / T
    labels = jnp.zeros((n,), jnp.int32)
    return logits, labels


def make_simclr_train_step(net, tx: optax.GradientTransformation,
                           T: float = 0.07, mesh=None, compute_dtype=None):
    """Batch: {'query_feat': (B, T, F), 'key_feat': (B, T, F)} (two views).
    `compute_dtype=jnp.bfloat16`: bf16 encoder fwd/bwd, f32 InfoNCE."""

    def step_fn(state, batch, rng):
        feats_in = jnp.concatenate(
            [batch["query_feat"], batch["key_feat"]], axis=0
        )

        def loss_fn(params):
            if compute_dtype is not None:
                cast = lambda x: (
                    x.astype(compute_dtype)
                    if x.dtype == jnp.float32
                    else x
                )
                variables = {"params": jax.tree.map(cast, params)}
                feats = feats_in.astype(compute_dtype)
            else:
                variables = {"params": params}
                feats = feats_in
            if state.batch_stats:
                variables["batch_stats"] = state.batch_stats
            out, updates = net.apply(
                variables, feats, train=True, mutable=["batch_stats"]
            )
            emb = embedding_from_outputs(out).astype(jnp.float32)
            logits, labels = info_nce_logits(emb, 2, T)
            loss = jnp.mean(
                optax.softmax_cross_entropy_with_integer_labels(logits, labels)
            )
            acc = jnp.mean(jnp.argmax(logits, axis=1) == 0)
            return loss, (updates.get("batch_stats", {}), acc)

        (loss, (new_stats, acc)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = state.replace(
            step=state.step + 1,
            params=new_params,
            batch_stats=new_stats,
            opt_state=new_opt_state,
        )
        return new_state, {"loss": loss, "acc": acc}

    if mesh is None:
        return jax.jit(step_fn, donate_argnums=(0,))
    from jax.sharding import NamedSharding, PartitionSpec as P

    from ..parallel.mesh import DATA_AXIS

    batch_sh = NamedSharding(mesh, P(DATA_AXIS))
    return jax.jit(
        step_fn,
        donate_argnums=(0,),
        in_shardings=(None, batch_sh, NamedSharding(mesh, P())),
    )
