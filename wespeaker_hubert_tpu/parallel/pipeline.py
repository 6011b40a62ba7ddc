"""Pipeline parallelism (GPipe-style collective-permute pipeline).

The reference has NO pipeline parallelism — its whole multi-device story
is DDP gradient averaging (reference: wespeaker/bin/train.py:54,170-171).
On TPU pods the workload that wants more is the namesake SSL frontend
(WavLM-Large: 24 transformer layers, 4096-wide FFNs — the dominant
parameter mass), where a pod slice can hold the layer stack STAGED across
chips instead of replicated.  This module adds the canonical TPU pipeline
from the scaling playbook:

  * the L homogeneous encoder layers are STACKED on a leading axis and
    that axis is sharded over a 'pipe' mesh axis -> each chip owns a
    contiguous stage of L/S layers (weights live in 1/S-th of HBM);
  * the batch splits into M microbatches; one `lax.scan` runs M+S-1
    ticks; every tick each stage applies its layers (an inner scan over
    its local stacked weights) to its resident microbatch activation and
    `lax.ppermute`s the result to the next stage over ICI;
  * stage 0 injects microbatch t at tick t; stage S-1 finishes
    microbatch t at tick t+S-1; the bubble fraction is (S-1)/(M+S-1);
  * composes with data parallelism: under one shard_map over
    ('data','pipe') the microbatch rows are sharded over 'data' while
    ppermute/all_gather run over 'pipe' only — dp x pp on a 2-D mesh.

Per-layer hidden states (the Featurizer consumes ALL of them —
reference: wespeaker/frontend/s3prl.py:69-75) are collected per stage
during the scan and all_gathered over 'pipe' at the end, so the layer-
weighted-sum frontend path works unchanged on top of the pipelined stack.

Differentiable end-to-end: grads flow through ppermute (its transpose is
the reverse permute) and the scans, so the same pipeline serves the
joint fine-tune training step.
"""

from __future__ import annotations

import math
from typing import Callable, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

__all__ = [
    "PIPE_AXIS",
    "pipeline_apply",
    "stack_encoder_layers",
    "wavlm_position_bias",
    "pipelined_ssl_hidden_states",
]

PIPE_AXIS = "pipe"


def _shard_map(fn, mesh, in_specs, out_specs):
    """jax.shard_map with replication checking off (outputs are made
    pipe-replicated by an explicit psum/all_gather, which the vma checker
    cannot always see through)."""
    try:
        return jax.shard_map(
            fn, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
            check_vma=False,
        )
    except TypeError:  # older signature
        from jax.experimental.shard_map import shard_map as _sm

        return _sm(
            fn, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
            check_rep=False,
        )


def pipeline_apply(
    layer_fn: Callable,
    stacked_params,
    x: jax.Array,
    *,
    mesh: Mesh,
    n_micro: int,
    pipe_axis: str = PIPE_AXIS,
    data_axis: Optional[str] = None,
    extras: Sequence[jax.Array] = (),
    remat: bool = False,
) -> jax.Array:
    """Run a stacked homogeneous layer stack as an S-stage pipeline.

    layer_fn(p, h, *extras) -> h applies ONE layer; `stacked_params` is
    the per-layer param pytree stacked on a leading (L,) axis; `x` is the
    (B, ...) activation entering layer 0; `extras` are stage-invariant
    arrays passed to every layer (e.g. the WavLM shared position bias).
    `remat=True` wraps each layer in jax.checkpoint so backward
    recomputes activations instead of storing every tick's intermediates
    — the standard memory/FLOPs trade for pipelined training.

    Returns the per-layer outputs as one (L, B, ...) array (layer l's
    output for the whole batch), so callers get the final hidden state
    AND the intermediate states the SSL featurizer needs.
    """
    if remat:
        layer_fn = jax.checkpoint(layer_fn)
    S = mesh.shape[pipe_axis]
    L = jax.tree.leaves(stacked_params)[0].shape[0]
    if L % S:
        raise ValueError(f"{L} layers not divisible by {S} pipeline stages")
    B = x.shape[0]
    if B % n_micro:
        raise ValueError(f"batch {B} not divisible by {n_micro} microbatches")
    mb = B // n_micro
    xs = x.reshape(n_micro, mb, *x.shape[1:])

    mb_spec = P(None, data_axis, *([None] * (xs.ndim - 2)))
    in_specs = (
        jax.tree.map(lambda _: P(pipe_axis), stacked_params),
        mb_spec,
    ) + tuple(P() for _ in extras)
    # (M, L_loc, mb, ...) per stage -> gathered (M, L, mb, ...) global
    out_spec = P(None, None, data_axis, *([None] * (xs.ndim - 2)))

    def run(local_params, xs, *extras):
        idx = lax.axis_index(pipe_axis)
        M = xs.shape[0]
        l_loc = jax.tree.leaves(local_params)[0].shape[0]

        def apply_stage(h):
            def body(h, p):
                h = layer_fn(p, h, *extras)
                return h, h

            return lax.scan(body, h, local_params)  # (h, ys (L_loc, ...))

        zero_state = jnp.zeros_like(xs[0])
        states0 = jnp.zeros((M, l_loc) + xs.shape[1:], xs.dtype)

        def tick(carry, t):
            recv, states = carry
            inject = lax.dynamic_index_in_dim(
                xs, jnp.clip(t, 0, M - 1), 0, keepdims=False
            )
            h = jnp.where(idx == 0, inject, recv)
            out, ys = apply_stage(h)
            # stage `idx` processes microbatch t - idx at tick t
            mi = t - idx
            valid = jnp.logical_and(mi >= 0, mi < M)
            upd = lax.dynamic_update_index_in_dim(
                states, ys, jnp.clip(mi, 0, M - 1), 0
            )
            states = jnp.where(valid, upd, states)
            sent = lax.ppermute(
                out, pipe_axis, [(i, (i + 1) % S) for i in range(S)]
            )
            return (sent, states), None

        (_, states), _ = lax.scan(
            tick, (zero_state, states0), jnp.arange(M + S - 1)
        )
        # (S, M, L_loc, mb, ...): every stage ends holding the full set
        gathered = lax.all_gather(states, pipe_axis, axis=0)
        # -> (M, S, L_loc, ...) -> (M, L, mb, ...): layer s*L_loc + l
        gathered = jnp.moveaxis(gathered, 1, 0)
        return gathered.reshape((M, S * l_loc) + xs.shape[1:])

    out = _shard_map(run, mesh, in_specs, out_spec)(
        stacked_params, xs, *extras
    )
    # (M, L, mb, ...) -> (L, B, ...)
    out = jnp.moveaxis(out, 1, 0)
    return out.reshape((L, B) + x.shape[1:])


def stack_encoder_layers(encoder_params, cfg):
    """Stack layer_0..layer_{L-1} of an SSLEncoder param tree on a
    leading axis.  WavLM's layer_0 additionally owns the shared
    `rel_attn_embed` table (ssl_encoder.py:307-314) — it is split out
    (returned separately) so the stacked trees are homogeneous; the
    bias it produces is stage-invariant and rides as a pipeline extra."""
    layers = [
        encoder_params[f"layer_{i}"] for i in range(cfg.num_hidden_layers)
    ]
    rel_embed = None
    if cfg.model_type == "wavlm":
        l0 = dict(layers[0])
        attn = dict(l0["attention"])
        rel_embed = attn.pop("rel_attn_embed")
        l0["attention"] = attn
        layers = [l0] + layers[1:]
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *layers)
    return stacked, rel_embed


def wavlm_position_bias(rel_embed: jax.Array, t: int, cfg) -> jax.Array:
    """(num_buckets, h) table -> (h, T, T) shared position bias (the
    layer-0 computation at ssl_encoder.py:308-319, hoisted out of the
    stack so every pipeline stage can gate it locally)."""
    from ..frontend.ssl_encoder import _relative_positions_bucket

    pos = np.arange(t)
    buckets = _relative_positions_bucket(
        pos[None, :] - pos[:, None], cfg.num_buckets, cfg.max_distance
    )
    return jnp.transpose(rel_embed[jnp.asarray(buckets)], (2, 0, 1))


def pipelined_ssl_hidden_states(
    cfg,
    variables,
    wav: jax.Array,
    *,
    mesh: Mesh,
    n_micro: int,
    pipe_axis: str = PIPE_AXIS,
    data_axis: Optional[str] = None,
) -> List[jax.Array]:
    """SSLEncoder forward with the transformer stack pipelined.

    Mirrors SSLEncoder.__call__ (ssl_encoder.py:444-485, full-length
    extraction: lengths=None): the conv frontend / projection / pos-conv
    run data-parallel (they are <5% of FLOPs), the L-layer stack runs as
    an S-stage pipe, and the returned list matches the reference layout
    (1 + num_hidden_layers hidden states) so the Featurizer applies
    unchanged.
    """
    from ..frontend.ssl_encoder import (
        ConvFeatureEncoder,
        EncoderLayer,
        PositionalConvEmbedding,
    )
    from ..models.norm import LayerNorm

    p = variables["params"]
    ln = LayerNorm(epsilon=cfg.layer_norm_eps)

    feats = ConvFeatureEncoder(cfg).apply(
        {"params": p["feature_extractor"]}, wav
    )
    h = ln.apply({"params": p["feat_proj_layer_norm"]}, feats)
    import flax.linen as nn

    h = nn.Dense(cfg.hidden_size).apply({"params": p["feat_projection"]}, h)
    pos = PositionalConvEmbedding(cfg).apply({"params": p["pos_conv_embed"]}, h)
    h = h + pos
    if not cfg.do_stable_layer_norm:
        h = ln.apply({"params": p["encoder_layer_norm"]}, h)

    stacked, rel_embed = stack_encoder_layers(p, cfg)
    extras = ()
    if cfg.model_type == "wavlm":
        extras = (wavlm_position_bias(rel_embed, h.shape[1], cfg),)

    # layer_idx=1 so no stage re-creates the rel_attn_embed param; the
    # shared bias arrives via `extras` exactly as layers 1..L-1 see it
    # in the sequential forward.
    layer = EncoderLayer(cfg, layer_idx=1)

    if cfg.model_type == "wavlm":

        def layer_fn(lp, x, position_bias):
            out, _ = layer.apply({"params": lp}, x, None, position_bias)
            return out

    else:

        def layer_fn(lp, x):
            out, _ = layer.apply({"params": lp}, x, None, None)
            return out

    states = pipeline_apply(
        layer_fn,
        stacked,
        h,
        mesh=mesh,
        n_micro=n_micro,
        pipe_axis=pipe_axis,
        data_axis=data_axis,
        extras=extras,
    )
    hidden = [h] + [states[i] for i in range(cfg.num_hidden_layers)]
    if cfg.do_stable_layer_norm:
        hidden[-1] = ln.apply({"params": p["encoder_layer_norm"]}, hidden[-1])
    return hidden
