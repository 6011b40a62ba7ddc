"""Explicit tensor-parallel margin-softmax: per-shard logits + collective
softmax, global logits never materialized.

This is the genuinely distributed-novel piece the reference lacks
(SURVEY §2.10: the reference replicates the (emb, num_class*K) classifier
per GPU).  The default train step relies on GSPMD to partition the same
math; this shard_map version makes the communication explicit and
minimal for very large speaker inventories:

  per chip:  cos = norm(e) @ norm(W_local)           (B, C/P) matmul
  margin     applied only on the shard owning the label class
  softmax    max   -> pmax over 'model'   (B,) floats
             denom -> psum over 'model'   (B,) floats
             target logit -> psum         (B,) floats
  loss       mean over the (data-sharded) batch -> pmean over 'data'

Total comm per step: 3 (B,)-vectors over 'model' + scalars — vs an
all-gather of (B, C) logits if the head were materialized.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from .mesh import DATA_AXIS, MODEL_AXIS

__all__ = ["make_sharded_arcmargin_loss", "init_sharded_head_weight"]


def init_sharded_head_weight(
    rng: jax.Array, embed_dim: int, num_class: int, mesh
) -> jax.Array:
    """Xavier-uniform (emb, C) weight placed column-sharded over 'model'."""
    limit = math.sqrt(6.0 / (embed_dim + num_class))
    w = jax.random.uniform(
        rng, (embed_dim, num_class), jnp.float32, -limit, limit
    )
    return jax.device_put(w, NamedSharding(mesh, P(None, MODEL_AXIS)))


def make_sharded_arcmargin_loss(
    mesh,
    num_class: int,
    scale: float = 32.0,
    easy_margin: bool = False,
):
    """Returns jitted fn(embed (B,D), weight (D,C), label (B,), margin)
    -> (loss, acc).  embed/label batch-sharded over 'data', weight
    class-sharded over 'model'."""
    n_model = mesh.shape[MODEL_AXIS]
    assert num_class % n_model == 0, (num_class, n_model)
    c_local = num_class // n_model

    def local_fn(embed, weight, label, margin):
        # embed (B_loc, D) margin scalar; weight (D, C_loc); label (B_loc,)
        e = embed / jnp.maximum(
            jnp.linalg.norm(embed, axis=-1, keepdims=True), 1e-12
        )
        w = weight / jnp.maximum(
            jnp.linalg.norm(weight, axis=0, keepdims=True), 1e-12
        )
        cosine = jnp.dot(e, w, preferred_element_type=jnp.float32)

        m = jnp.asarray(margin, jnp.float32)
        cos_m, sin_m = jnp.cos(m), jnp.sin(m)
        sine = jnp.sqrt(jnp.clip(1.0 - cosine**2, 0.0, 1.0))
        phi = cosine * cos_m - sine * sin_m
        if easy_margin:
            phi = jnp.where(cosine > 0, phi, cosine)
        else:
            th = jnp.cos(math.pi - m)
            mmm = 1.0 + jnp.cos(math.pi - m)
            phi = jnp.where(cosine > th, phi, cosine - mmm)

        shard = jax.lax.axis_index(MODEL_AXIS)
        local_label = label - shard * c_local
        in_shard = (local_label >= 0) & (local_label < c_local)
        one_hot = jax.nn.one_hot(
            jnp.where(in_shard, local_label, 0), c_local, dtype=cosine.dtype
        ) * in_shard[:, None]
        logits = jnp.where(one_hot > 0, phi, cosine) * scale

        # --- collective softmax over the class shards
        local_max = jnp.max(logits, axis=1)
        # the max is only a stability shift whose gradient cancels in
        # logsumexp; stop_gradient keeps it exact AND avoids pmax's
        # missing differentiation rule
        gmax = jax.lax.pmax(
            jax.lax.stop_gradient(local_max), MODEL_AXIS
        )  # (B,)
        denom = jax.lax.psum(
            jnp.sum(jnp.exp(logits - gmax[:, None]), axis=1), MODEL_AXIS
        )
        target = jax.lax.psum(
            jnp.sum(one_hot * logits, axis=1), MODEL_AXIS
        )
        per_sample = jnp.log(denom) + gmax - target
        loss = jax.lax.pmean(jnp.mean(per_sample), DATA_AXIS)

        # accuracy: global argmax via (value pmax, owner psum)
        local_arg = jnp.argmax(logits, axis=1) + shard * c_local
        is_winner = local_max == gmax
        pred = jax.lax.psum(
            jnp.where(is_winner, local_arg, 0), MODEL_AXIS
        )  # ties double-count; negligible for accuracy reporting
        acc = jax.lax.pmean(jnp.mean((pred == label) * 1.0), DATA_AXIS)
        return loss, acc

    mapped = jax.shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(
            P(DATA_AXIS, None),      # embed
            P(None, MODEL_AXIS),     # weight
            P(DATA_AXIS),            # label
            P(),                     # margin
        ),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return jax.jit(mapped)
