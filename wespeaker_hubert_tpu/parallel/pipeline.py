"""Pipeline parallelism (GPipe-style collective-permute pipeline).

The reference has NO pipeline parallelism — its whole multi-device story
is DDP gradient averaging (reference: wespeaker/bin/train.py:54,170-171).
On TPU pods the workloads that want more are the namesake SSL frontend
(WavLM-Large: 24 transformer layers, 4096-wide FFNs — the dominant
parameter mass; reference frontend/s3prl.py) and the whisper encoder
(32 blocks of width 1280 at T=1500; reference
wespeaker/frontend/whisper_encoder.py:64-220), where a pod slice can hold
the layer stack STAGED across chips instead of replicated.  This module
adds the canonical TPU pipeline from the scaling playbook:

  * the L homogeneous encoder layers are STACKED on a leading axis and
    that axis is sharded over a 'pipe' mesh axis -> each chip owns a
    contiguous stage of L/S layers (weights live in 1/S-th of HBM);
  * the batch splits into M microbatches; one `lax.scan` runs M+S-1
    ticks; every tick each stage applies its layers (an inner scan over
    its local stacked weights) to its resident microbatch activation and
    `lax.ppermute`s the result to the next stage over ICI;
  * stage 0 injects microbatch t at tick t; stage S-1 finishes
    microbatch t at tick t+S-1; the bubble fraction is (S-1)/(M+S-1);
  * COMPOSES with every GSPMD mode: the shard_map is PARTIAL-MANUAL
    (manual over 'pipe' only, `axis_names={'pipe'}`), so inside the
    pipeline body the 'data' and 'model' mesh axes stay under GSPMD —
    batch rows shard over 'data' (dp), qkv/ffn kernels over 'model'
    (tp), sequence-parallel activation constraints apply per layer (sp),
    and fsdp param sharding all-gathers per stage.  dp x tp x sp x pp
    (+fsdp) on one ('data','pipe','model') mesh.

Per-layer hidden states (the Featurizer consumes ALL of them —
reference: wespeaker/frontend/s3prl.py:69-75) are collected per stage
during the scan and emitted pipe-sharded on the stage axis (out_specs
P('pipe') — GSPMD reassembles them as downstream consumers demand), so
the layer-weighted-sum frontend path works unchanged on top of the
pipelined stack.

Differentiable end-to-end: grads flow through ppermute (its transpose is
the reverse permute) and the scans, so the same pipeline serves the
joint fine-tune training step.  Production wiring: a `pipeline_parallel`
key in the YAML s3prl_args/whisper_encoder_args (bin/train.py) routes
the frontend forward through `pipelined_frontend_features` below, with
the stacked layer params living pipe-sharded in the train state
(`stack_frontend_tree` — checkpoints stay in the canonical per-layer
layout via `unstack_frontend_tree`).
"""

from __future__ import annotations

from typing import Callable, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = [
    "PIPE_AXIS",
    "pipeline_apply",
    "stack_encoder_layers",
    "wavlm_position_bias",
    "pipelined_ssl_hidden_states",
    "pipelined_whisper_features",
    "pipelined_frontend_features",
    "stack_frontend_tree",
    "unstack_frontend_tree",
]

PIPE_AXIS = "pipe"


def _set_mesh(mesh):
    """Trace-time context mesh (lets bare-PartitionSpec sharding
    constraints inside the partial-manual body canonicalize; legal
    inside an outer jit trace, unlike jax.set_mesh)."""
    return jax.sharding.use_abstract_mesh(mesh.abstract_mesh)


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
    per_micro: Sequence[jax.Array] = (),
    remat: bool = False,
) -> jax.Array:
    """Run a stacked homogeneous layer stack as an S-stage pipeline.

    layer_fn(p, h, *per_micro_slices, *extras) -> h applies ONE layer;
    `stacked_params` is the per-layer param pytree stacked on a leading
    (L,) axis; `x` is the (B, ...) activation entering layer 0;
    `per_micro` are (B, ...) arrays split into microbatches alongside x
    and delivered to each stage sliced to ITS resident microbatch (e.g.
    the additive attention mask for padded batches); `extras` are
    stage-invariant arrays passed whole to every layer (e.g. the WavLM
    shared position bias).  `remat=True` wraps each layer in
    jax.checkpoint so backward recomputes activations instead of storing
    every tick's intermediates — the standard memory/FLOPs trade for
    pipelined training.

    The shard_map is manual over `pipe_axis` ONLY: all other mesh axes
    ('data', 'model', ...) remain under GSPMD inside the body, so batch
    sharding, tensor-parallel kernels and sequence-parallel activation
    constraints inside `layer_fn` compose with the pipeline.
    `data_axis` (when the mesh has one) adds a batch-sharding constraint
    on the microbatch rows.

    Returns the per-layer outputs as one (L, B, ...) array (layer l's
    output for the whole batch), so callers get the final hidden state
    AND the intermediate states the SSL featurizer needs.
    """
    if pipe_axis not in mesh.shape:
        raise ValueError(
            f"mesh {tuple(mesh.shape.items())} has no {pipe_axis!r} axis"
        )
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

    # Carry dtype: the scan carry must match what layer_fn RETURNS (an
    # f32-param layer applied to bf16 activations promotes — the carry
    # then lives in the promoted dtype and the input is upcast once).
    layer0 = jax.tree.map(
        lambda a: jax.ShapeDtypeStruct(a.shape[1:], a.dtype), stacked_params
    )
    pm_structs = tuple(
        jax.ShapeDtypeStruct((mb,) + e.shape[1:], e.dtype) for e in per_micro
    )
    ex_structs = tuple(
        jax.ShapeDtypeStruct(e.shape, e.dtype) for e in extras
    )
    with _set_mesh(mesh):
        out_struct = jax.eval_shape(
            layer_fn,
            layer0,
            jax.ShapeDtypeStruct((mb,) + x.shape[1:], x.dtype),
            *pm_structs,
            *ex_structs,
        )
    carry_dtype = out_struct.dtype
    x = x.astype(carry_dtype)

    if S == 1:  # degenerate single-stage: plain sequential scan (pure dp)
        if data_axis is not None and data_axis in mesh.shape:
            x = lax.with_sharding_constraint(
                x,
                NamedSharding(
                    mesh, P(data_axis, *([None] * (x.ndim - 1)))
                ),
            )

        def body(h, p):
            h = layer_fn(p, h, *per_micro, *extras).astype(carry_dtype)
            return h, h

        _, ys = lax.scan(body, x, stacked_params)
        return ys

    # Constrain the batch dim BEFORE the microbatch reshape: B is the
    # dp-divisible dim; constraining the (M, mb) layout instead can make
    # GSPMD pad/replicate mb rows across the data axis (mb < n_data),
    # and the padded layout double-counts rows in weight-grad reductions
    # of upstream (pre-pipeline) convs.
    if data_axis is not None and data_axis in mesh.shape:
        x = lax.with_sharding_constraint(
            x, NamedSharding(mesh, P(data_axis, *([None] * (x.ndim - 1))))
        )
    xs = x.reshape(n_micro, mb, *x.shape[1:])
    pms = tuple(
        e.reshape(n_micro, mb, *e.shape[1:]) for e in per_micro
    )

    in_specs = (
        jax.tree.map(lambda _: P(pipe_axis), stacked_params),
        P(),
    ) + tuple(P() for _ in pms) + tuple(P() for _ in extras)

    def run(local_params, xs, *rest):
        pms = rest[: len(per_micro)]
        exs = rest[len(per_micro):]
        idx = lax.axis_index(pipe_axis)
        M = xs.shape[0]
        l_loc = jax.tree.leaves(local_params)[0].shape[0]

        def apply_stage(h, pm_t):
            def body(h, p):
                h = layer_fn(p, h, *pm_t, *exs).astype(carry_dtype)
                return h, h

            return lax.scan(body, h, local_params)  # (h, ys (L_loc, ...))

        # the carries are pipe-VARYING (each stage holds its own resident
        # microbatch / collected states); mark the zero inits so the vma
        # checker types the scan correctly — with checking on, the
        # backward pass places its pipe psums from these types (an
        # unchecked body mis-accumulated cotangents of pre-pipeline
        # params when the batch input arrived sharded)
        zero_state = lax.pcast(
            jnp.zeros_like(xs[0]), pipe_axis, to="varying"
        )
        states0 = lax.pcast(
            jnp.zeros((M, l_loc) + xs.shape[1:], carry_dtype),
            pipe_axis,
            to="varying",
        )

        def tick(carry, t):
            recv, states = carry
            # stage `idx` processes microbatch t - idx at tick t
            mi = t - idx
            mic = jnp.clip(mi, 0, M - 1)
            inject = lax.dynamic_index_in_dim(xs, mic, 0, keepdims=False)
            h = jnp.where(idx == 0, inject, recv)
            pm_t = tuple(
                lax.dynamic_index_in_dim(pm, mic, 0, keepdims=False)
                for pm in pms
            )
            out, ys = apply_stage(h, pm_t)
            valid = jnp.logical_and(mi >= 0, mi < M)
            upd = lax.dynamic_update_index_in_dim(states, ys, mic, 0)
            states = jnp.where(valid, upd, states)
            sent = lax.ppermute(
                out, pipe_axis, [(i, (i + 1) % S) for i in range(S)]
            )
            return (sent, states), None

        (_, states), _ = lax.scan(
            tick, (zero_state, states0), jnp.arange(M + S - 1)
        )
        # per-stage (M, L_loc, mb, ...), pipe-varying: stage s holds the
        # outputs of ITS layers for every microbatch.  Emitted through
        # out_specs=P(pipe) (no explicit all_gather) — GSPMD reassembles
        # or keeps the layer axis sharded downstream as consumers demand.
        return states

    with _set_mesh(mesh):
        mapped = jax.shard_map(
            run,
            mesh=mesh,
            in_specs=in_specs,
            # stage axis stacked on dim 0: global (S*M, L_loc, mb, ...)
            out_specs=P(pipe_axis),
            axis_names={pipe_axis},
            check_vma=True,
        )
        # partial-manual shard_map only lowers under jit (an eager call
        # rejects the auto-axis out_specs completion); nested jit is
        # inlined, so this is free inside a surrounding compiled step
        out = jax.jit(mapped)(stacked_params, xs, *pms, *extras)
    # (S*M, L_loc, mb, ...) -> (S, M, L_loc, ...) -> (M, L, mb, ...)
    l_loc = L // S
    out = out.reshape((S, n_micro, l_loc) + xs.shape[1:])
    out = jnp.moveaxis(out, 1, 0).reshape((n_micro, L) + xs.shape[1:])
    # (M, L, mb, ...) -> (L, B, ...)
    out = jnp.moveaxis(out, 1, 0)
    return out.reshape((L, B) + x.shape[1:])


# --------------------------------------------------------------------------
# Stacked param layouts.
#
# Canonical (checkpoint / weight-import) layout keeps per-layer subtrees
# (layer_0..layer_{L-1} / block_0..block_{N-1}); the pipeline train state
# stores them STACKED on a leading (L,) axis under 'layer_stack' /
# 'block_stack' so the stacks can live pipe-sharded (1/S-th of HBM per
# stage) and feed pipeline_apply with zero per-step restructuring.
# --------------------------------------------------------------------------


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


def _unstack(stacked, n):
    return [jax.tree.map(lambda a, i=i: a[i], stacked) for i in range(n)]


def stack_frontend_tree(frontend_params, cfg):
    """Frontend param subtree, canonical per-layer -> pipeline stacked.

    SSL (SSLFrontend): {'upstream': {layer_i...}, 'featurizer_weights'}
      -> upstream gains 'layer_stack' (+ hoisted 'rel_attn_embed' for
         wavlm), loses layer_i.
    Whisper (WhisperEncoder): {block_i...} -> 'block_stack'.
    Idempotent on already-stacked trees."""
    fp = dict(frontend_params)
    if hasattr(cfg, "conv_kernel"):  # SSLEncoderConfig
        up = dict(fp["upstream"])
        if "layer_stack" in up:
            return frontend_params
        stacked, rel_embed = stack_encoder_layers(up, cfg)
        for i in range(cfg.num_hidden_layers):
            up.pop(f"layer_{i}")
        up["layer_stack"] = stacked
        if rel_embed is not None:
            up["rel_attn_embed"] = rel_embed
        fp["upstream"] = up
        return fp
    # whisper
    if "block_stack" in fp:
        return frontend_params
    blocks = [fp.pop(f"block_{i}") for i in range(cfg.n_layer)]
    fp["block_stack"] = jax.tree.map(lambda *xs: jnp.stack(xs), *blocks)
    return fp


def unstack_frontend_tree(frontend_params, cfg):
    """Inverse of stack_frontend_tree (stacked -> canonical per-layer),
    so checkpoints written from a pipelined run load into non-pipelined
    runs (and torch/HF converters) unchanged."""
    fp = dict(frontend_params)
    if hasattr(cfg, "conv_kernel"):  # SSLEncoderConfig
        up = dict(fp["upstream"])
        if "layer_stack" not in up:
            return frontend_params
        stacked = up.pop("layer_stack")
        layers = _unstack(stacked, cfg.num_hidden_layers)
        if cfg.model_type == "wavlm":
            rel = up.pop("rel_attn_embed")
            l0 = dict(layers[0])
            l0["attention"] = {**dict(l0["attention"]), "rel_attn_embed": rel}
            layers[0] = l0
        for i, l in enumerate(layers):
            up[f"layer_{i}"] = l
        fp["upstream"] = up
        return fp
    if "block_stack" not in fp:
        return frontend_params
    stacked = fp.pop("block_stack")
    for i, b in enumerate(_unstack(stacked, cfg.n_layer)):
        fp[f"block_{i}"] = b
    return fp


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
    lengths: Optional[jax.Array] = None,
    remat: bool = False,
) -> Tuple[List[jax.Array], Optional[jax.Array]]:
    """SSLEncoder forward with the transformer stack pipelined.

    Mirrors SSLEncoder.__call__ (ssl_encoder.py:462-504) including the
    padded-batch path: `lengths` masks the post-projection stream and
    rides an additive attention bias per microbatch (the encoder has no
    dropout, so train/eval forwards are identical).  The conv frontend /
    projection / pos-conv run data-parallel (they are <5% of FLOPs), the
    L-layer stack runs as an S-stage pipe, and the returned
    (hidden_states, feat_lengths) matches the sequential layout
    (1 + num_hidden_layers states) so the Featurizer applies unchanged.

    Accepts BOTH param layouts: canonical layer_i subtrees or the
    pipeline 'layer_stack' layout (stack_frontend_tree).
    """
    from ..frontend.ssl_encoder import (
        ConvFeatureEncoder,
        EncoderLayer,
        PositionalConvEmbedding,
        feat_extract_output_lengths,
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

    feat_lengths = None
    attn_bias = None
    if lengths is not None:
        feat_lengths = feat_extract_output_lengths(cfg, lengths)
        t = h.shape[1]
        mask = jnp.arange(t)[None, :] < feat_lengths[:, None]
        h = h * mask[:, :, None]
        attn_bias = jnp.where(mask, 0.0, -1e9)[:, None, None, :]

    pos = PositionalConvEmbedding(cfg).apply({"params": p["pos_conv_embed"]}, h)
    h = h + pos
    if not cfg.do_stable_layer_norm:
        h = ln.apply({"params": p["encoder_layer_norm"]}, h)

    if "layer_stack" in p:
        stacked = p["layer_stack"]
        rel_embed = p.get("rel_attn_embed")
    else:
        stacked, rel_embed = stack_encoder_layers(p, cfg)
    extras = ()
    if cfg.model_type == "wavlm":
        extras = (wavlm_position_bias(rel_embed, h.shape[1], cfg),)
    per_micro = (attn_bias,) if attn_bias is not None else ()

    # layer_idx=1 so no stage re-creates the rel_attn_embed param; the
    # shared bias arrives via `extras` exactly as layers 1..L-1 see it
    # in the sequential forward.
    layer = EncoderLayer(cfg, layer_idx=1)
    n_pm = len(per_micro)

    def layer_fn(lp, x, *rest):
        ab = rest[0] if n_pm else None
        pb = rest[n_pm] if extras else None
        out, _ = layer.apply({"params": lp}, x, ab, pb)
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
        per_micro=per_micro,
        remat=remat,
    )
    hidden = [h] + [states[i] for i in range(cfg.num_hidden_layers)]
    if cfg.do_stable_layer_norm:
        hidden[-1] = ln.apply({"params": p["encoder_layer_norm"]}, hidden[-1])
    return hidden, feat_lengths


def pipelined_whisper_features(
    cfg,
    frontend_params,
    wav: jax.Array,
    *,
    mesh: Mesh,
    n_micro: int,
    pipe_axis: str = PIPE_AXIS,
    data_axis: Optional[str] = None,
    lengths: Optional[jax.Array] = None,
    remat: bool = False,
) -> Tuple[jax.Array, Optional[jax.Array]]:
    """WhisperEncoder forward (frontend/whisper.py:143-183) with the
    residual block stack pipelined: mel + two convs + positions run
    data-parallel, the n_layer blocks run as an S-stage pipe, the
    [layer_st..layer_ed] per-layer outputs come from the pipeline's
    collected states, concat + ln_post2 as in the sequential forward.
    Accepts canonical block_i or stacked 'block_stack' layouts."""
    import flax.linen as nn

    from ..frontend.whisper import _Block, _sinusoids
    from ..models.norm import LayerNorm
    from ..ops.whisper_mel import whisper_log_mel

    p = frontend_params
    mel = whisper_log_mel(wav, n_mels=cfg.n_mels).astype(wav.dtype)
    approx = cfg.gelu_impl == "tanh"
    h = nn.Conv(cfg.n_state, (3,), padding=[(1, 1)]).apply(
        {"params": p["conv1"]}, mel
    )
    h = nn.gelu(h, approximate=approx)
    h = nn.Conv(cfg.n_state, (3,), strides=(2,), padding=[(1, 1)]).apply(
        {"params": p["conv2"]}, h
    )
    h = nn.gelu(h, approximate=approx)

    t = min(h.shape[1], cfg.n_ctx)
    h = h[:, :t]
    pos = jnp.asarray(_sinusoids(cfg.n_ctx, cfg.n_state))[:t]
    h = h + pos[None].astype(h.dtype)

    stacked = p["block_stack"] if "block_stack" in p else jax.tree.map(
        lambda *xs: jnp.stack(xs),
        *[p[f"block_{i}"] for i in range(cfg.n_layer)],
    )
    block = _Block(
        cfg.n_state, cfg.n_head, cfg.attn_impl, cfg.gelu_impl,
        cfg.act_constraint,
    )

    def layer_fn(bp, x):
        return block.apply({"params": bp}, x)

    states = pipeline_apply(
        layer_fn,
        stacked,
        h,
        mesh=mesh,
        n_micro=n_micro,
        pipe_axis=pipe_axis,
        data_axis=data_axis,
        remat=remat,
    )
    outs = [states[i] for i in range(cfg.layer_st, cfg.layer_ed + 1)]
    xs = jnp.concatenate(outs, axis=-1)
    xs = LayerNorm().apply({"params": p["ln_post2"]}, xs)

    feat_lengths = None
    if lengths is not None:
        feat_lengths = jnp.minimum((lengths // 160 + 1) // 2, t)
    return xs, feat_lengths


def pipelined_frontend_features(
    model,
    variables,
    wav: jax.Array,
    *,
    mesh: Mesh,
    n_micro: int,
    pipe_axis: str = PIPE_AXIS,
    data_axis: Optional[str] = None,
    lengths: Optional[jax.Array] = None,
    remat: bool = False,
) -> Tuple[jax.Array, Optional[jax.Array]]:
    """Production entry: SpeakerNet frontend forward with the layer stack
    pipelined — the drop-in for `model.apply(..., method=model.features)`
    in the train/eval step when pipeline parallelism is enabled
    (bin/train.py `pipeline_parallel`).  Replicates SSLFrontend.__call__
    (sslfrontend.py:39-75: frozen stop-gradient, layer select,
    learned-softmax featurizer mix in f32) / WhisperEncoder.__call__ on
    top of the pipelined hidden states."""
    frontend = model.frontend
    fp = variables["params"]["frontend"]
    cfg = frontend.cfg
    if not hasattr(cfg, "conv_kernel"):  # whisper
        return pipelined_whisper_features(
            cfg, fp, wav,
            mesh=mesh, n_micro=n_micro, pipe_axis=pipe_axis,
            data_axis=data_axis, lengths=lengths, remat=remat,
        )

    hidden_states, feat_lengths = pipelined_ssl_hidden_states(
        cfg, {"params": fp["upstream"]}, wav,
        mesh=mesh, n_micro=n_micro, pipe_axis=pipe_axis,
        data_axis=data_axis, lengths=lengths, remat=remat,
    )
    if frontend.frozen:
        hidden_states = [jax.lax.stop_gradient(h) for h in hidden_states]
    if frontend.layer >= 0:
        if frontend.layer >= len(hidden_states):
            raise ValueError(
                f"s3prl_args.layer={frontend.layer} out of range: upstream "
                f"has {len(hidden_states)} hidden states"
            )
        return hidden_states[frontend.layer], feat_lengths
    if not frontend.multilayer_feature:
        hidden_states = hidden_states[-1:]
    norm_w = jax.nn.softmax(fp["featurizer_weights"])
    stacked = jnp.stack(hidden_states, axis=0)  # (n, B, T, D)
    feats = jnp.einsum(
        "n,nbtd->btd", norm_w.astype(stacked.dtype), stacked,
        preferred_element_type=jnp.float32,
    ).astype(stacked.dtype)
    return feats, feat_lengths
