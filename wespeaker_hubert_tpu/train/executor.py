"""The jitted train/eval step — the hot loop.

Replaces the reference's per-iteration Python loop
(reference: wespeaker/utils/executor.py:23-89 — scheduler.step, GPU
cmvn/spec_aug, forward, AMP backward, DDP allreduce) with ONE compiled XLA
program per step:

    wav -> fbank -> cmvn -> specaug -> backbone -> margin head -> CE
        -> grads -> optimizer update

Scheduling (LR + margin) is computed in-graph from `state.step`, so the
same compiled step serves the whole run.  Data parallelism and the
class-sharded head come from jit shardings over the ('data', 'model')
mesh: batch is split over 'data' (grad averaging = GSPMD reduction), the
projection weight over 'model' (per-shard logits; softmax normalizer
reduces across shards).
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import optax
from jax.sharding import NamedSharding, PartitionSpec as P

from ..ops.augment import (
    add_reverb_noise,
    add_reverb_noise_packed,
    speed_perturb,
)
from ..ops.feature_utils import apply_cmvn
from ..ops.feature_utils import spec_aug as spec_aug_op
from ..ops.pipeline import FeaturePipelineConfig, wav_to_features
from ..parallel.mesh import DATA_AXIS
from .state import TrainState

__all__ = [
    "make_train_step",
    "make_eval_embed",
    "shard_train_state",
    "cross_entropy",
]


def cross_entropy(logits, labels):
    return jnp.mean(
        optax.softmax_cross_entropy_with_integer_labels(logits, labels)
    )


def make_train_step(
    model,
    tx: optax.GradientTransformation,
    lr_schedule: Callable,
    margin_schedule: Callable,
    feature_cfg: Optional[FeaturePipelineConfig] = None,
    mesh=None,
    chunk_samples: Optional[int] = None,
    compute_dtype=None,
    num_steps: int = 1,
    reverb_impl: str = "fft",
    aug_blocks: int = 1,
    pipeline_microbatches: Optional[int] = None,
    pipeline_remat: bool = False,
) -> Callable:
    """Build the jitted train step.

    num_steps > 1 returns a SCANNED step: (state, batches, rng) ->
    (state, metrics) where every batch leaf has a leading (num_steps,)
    axis and metrics are stacked per step — one XLA dispatch per
    num_steps optimizer steps (see comment at the scan below).

    The returned fn: (state, batch, rng) -> (state, metrics) where batch is
    {'wav': (B, W)} or {'feat': (B, T, F)}, plus 'label': (B,) and optional
    'length'.  When the batch carries augmentation fields from
    data.TrainPipeline ('speed_idx', 'aug_type', 'rir', 'noise', 'snr'),
    speed perturb + reverb/noise mixing run in-graph before fbank.
    `chunk_samples` is the post-resample chunk length (only needed when
    speed-perturbing without a noise buffer in the batch).

    PACKED aug batches (data.TrainPipelineConfig.packed_aug) carry compact
    rir (n_reverb, R) / noise (n_noise, L) / snr (n_noise,) arrays with NO
    'aug_type' field; the first n_reverb+n_noise wav rows are the
    augmented ones (counts are static from the array shapes).

    `aug_blocks` > 1 marks a MULTI-CONTROLLER packed batch: the global
    batch is the concatenation of one packed [reverb|noise|clean] block
    per host (parallel.mesh.shard_batch assembles per-host rows
    contiguously, and every host's pipeline computes identical
    deterministic slot counts), so the packed kernel is applied per
    block instead of treating the whole batch as one block.

    `pipeline_microbatches` (with a mesh carrying a 'pipe' axis, see
    parallel.mesh.make_mesh pipeline_parallel) routes the SSL/whisper
    frontend's layer stack through the GPipe collective-permute
    pipeline (parallel.pipeline) with that many microbatches; the
    frontend params are expected in the stacked pipeline layout
    (stack_frontend_tree) so each stage holds 1/S-th of the stack.
    `pipeline_remat` wraps each pipelined layer in jax.checkpoint.
    """

    use_frontend = getattr(model, "frontend", None) is not None
    if pipeline_microbatches and not use_frontend:
        raise ValueError(
            "pipeline_parallel requires an SSL/whisper frontend (the "
            "backbone families are not layer-homogeneous stacks)"
        )

    def prepare_wav(batch):
        """Device-side waveform augmentation (speed + reverb/noise)."""
        wav = batch["wav"]
        if "speed_idx" in batch:
            # noise rows (packed or unpacked) are exactly chunk_samples wide
            out_len = (
                batch["noise"].shape[1]
                if "noise" in batch and batch["noise"].shape[0]
                else chunk_samples
            )
            if out_len is None:
                raise ValueError(
                    "speed-perturbed batch without noise rows: pass "
                    "chunk_samples to make_train_step"
                )
            wav = speed_perturb(wav, batch["speed_idx"], out_len)
        if "aug_type" in batch:
            wav = add_reverb_noise(
                wav, batch["rir"], batch["noise"], batch["aug_type"],
                batch["snr"], impl=reverb_impl,
            )
        elif "rir" in batch:  # packed layout (counts static from shapes)
            if aug_blocks > 1:
                # static per-block slices (hosts are few), not vmap: the
                # FFT inside the packed kernel wants a plain dim0-major
                # 2-D operand
                b, l = wav.shape
                bb = b // aug_blocks
                nr = batch["rir"].shape[0] // aug_blocks
                nn = batch["noise"].shape[0] // aug_blocks
                wav = jnp.concatenate([
                    add_reverb_noise_packed(
                        wav[i * bb:(i + 1) * bb],
                        batch["rir"][i * nr:(i + 1) * nr],
                        batch["noise"][i * nn:(i + 1) * nn],
                        batch["snr"][i * nn:(i + 1) * nn],
                        nr,
                    )
                    for i in range(aug_blocks)
                ], axis=0)
            else:
                wav = add_reverb_noise_packed(
                    wav, batch["rir"], batch["noise"], batch["snr"],
                    batch["rir"].shape[0],
                )
        return wav

    def step_fn(state: TrainState, batch, rng):
        margin = margin_schedule(state.step)
        lr = lr_schedule(state.step)
        rng = jax.random.fold_in(rng, state.step)
        fcfg = feature_cfg or FeaturePipelineConfig()

        labels = batch["label"]
        if "feat" in batch:
            # precomputed features (data_type=feat, reference
            # dataset.py:194-199): no wav-domain aug, but CMVN + SpecAug
            # still run in-graph — the reference's GPU-side split
            # (executor.py:42-58) applies them for every data type
            feats0 = apply_cmvn(
                batch["feat"],
                norm_mean=fcfg.cmvn_norm_mean,
                norm_var=fcfg.cmvn_norm_var,
            )
            if fcfg.spec_aug:
                feats0 = spec_aug_op(
                    feats0,
                    rng,
                    num_t_mask=fcfg.spec_aug_num_t_mask,
                    num_f_mask=fcfg.spec_aug_num_f_mask,
                    max_t=fcfg.spec_aug_max_t,
                    max_f=fcfg.spec_aug_max_f,
                    prob=fcfg.spec_aug_prob,
                )
            mask0 = None
        elif not use_frontend:
            feats0, mask0 = wav_to_features(
                prepare_wav(batch),
                fcfg,
                rng=rng,
                lengths=batch.get("length"),
                train=True,
            )
        else:
            feats0 = mask0 = None  # computed inside loss_fn (frontend params)

        def loss_fn(params):
            if compute_dtype is not None:
                # bf16 mixed precision: bf16 activations/params for the
                # conv/matmul-heavy forward+backward, f32 master weights in
                # the optimizer; the margin-softmax cosine already upcasts
                # to f32 internally (projections._cosine_logits), and bf16
                # needs no loss scaling (f32 exponent range)
                cast = lambda x: (
                    x.astype(compute_dtype)
                    if x.dtype == jnp.float32
                    else x
                )
                variables = {"params": jax.tree.map(cast, params)}
            else:
                variables = {"params": params}
            if state.batch_stats:
                variables["batch_stats"] = state.batch_stats
            if feats0 is not None:
                feats, mask = feats0, mask0
            else:
                # SSL frontend path (reference executor.py:42-58): wav ->
                # frontend -> CMVN -> SpecAug -> backbone, all in-graph.
                wav = prepare_wav(batch)
                if compute_dtype is not None:
                    # the frontend follows its input dtype: f32 wav would
                    # promote the conv extractor and (via dtype promotion
                    # with the cast params) the whole transformer to f32
                    wav = wav.astype(compute_dtype)
                if pipeline_microbatches:
                    from ..parallel.pipeline import (
                        pipelined_frontend_features,
                    )

                    feats, feat_lengths = pipelined_frontend_features(
                        model,
                        variables,
                        wav,
                        mesh=mesh,
                        n_micro=pipeline_microbatches,
                        data_axis=DATA_AXIS,
                        lengths=batch.get("length"),
                        remat=pipeline_remat,
                    )
                else:
                    feats, feat_lengths = model.apply(
                        variables,
                        wav,
                        lengths=batch.get("length"),
                        train=True,
                        method=model.features,
                    )
                feats = apply_cmvn(
                    feats,
                    norm_mean=fcfg.cmvn_norm_mean,
                    norm_var=fcfg.cmvn_norm_var,
                    lengths=feat_lengths,
                )
                if fcfg.spec_aug:
                    feats = spec_aug_op(
                        feats,
                        rng,
                        num_t_mask=fcfg.spec_aug_num_t_mask,
                        num_f_mask=fcfg.spec_aug_num_f_mask,
                        max_t=fcfg.spec_aug_max_t,
                        max_f=fcfg.spec_aug_max_f,
                        prob=fcfg.spec_aug_prob,
                    )
                mask = None
                if feat_lengths is not None:
                    mask = (
                        jnp.arange(feats.shape[1])[None, :]
                        < feat_lengths[:, None]
                    )
            if compute_dtype is not None:
                feats = feats.astype(compute_dtype)
            (emb, logits, aux), updates = model.apply(
                variables,
                feats,
                labels,
                margin,
                mask=mask,
                train=True,
                mutable=["batch_stats"],
            )
            logits = logits.astype(jnp.float32)
            loss = aux if aux is not None else cross_entropy(logits, labels)
            acc = jnp.mean(jnp.argmax(logits, axis=-1) == labels)
            return loss, (updates.get("batch_stats", {}), acc)

        (loss, (new_stats, acc)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        if hasattr(tx, "update_apply"):
            # fused closed-form update+apply (train/state.py): same math
            # and opt_state as the optax chain, ~2-3 ms/step fewer
            # per-leaf kernel launches on the 150-leaf trees
            new_params, new_opt_state = tx.update_apply(
                grads, state.opt_state, state.params
            )
        else:
            updates, new_opt_state = tx.update(
                grads, state.opt_state, state.params
            )
            new_params = optax.apply_updates(state.params, updates)
        new_state = state.replace(
            step=state.step + 1,
            params=new_params,
            batch_stats=new_stats,
            opt_state=new_opt_state,
        )
        metrics = {"loss": loss, "acc": acc, "lr": lr, "margin": margin}
        return new_state, metrics

    if num_steps > 1:
        # Scan num_steps optimizer steps inside ONE compiled program:
        # the host dispatches (and optionally fetches metrics) once per
        # num_steps batches.  This amortizes per-dispatch overhead —
        # essential over remote-device links and still a win for
        # directly-attached hosts (fewer host round trips; XLA overlaps
        # the next step's prologue with the previous epilogue).  Batch
        # leaves carry a leading (num_steps, ...) axis; rng is split
        # in-graph per step.
        def multi_step_fn(state: TrainState, batches, rng):
            # the same key goes to every scanned step: step_fn folds in
            # state.step, so per-step randomness is unique AND independent
            # of scan position — a mid-epoch resume that re-aligns
            # loop_steps groups still reproduces the exact rng stream
            def body(carry, batch_k):
                return step_fn(carry, batch_k, rng)

            return jax.lax.scan(body, state, batches)

        if mesh is None:
            return jax.jit(multi_step_fn, donate_argnums=(0,))
        batch_sh = NamedSharding(mesh, P(None, DATA_AXIS))
        repl = NamedSharding(mesh, P())
        return jax.jit(
            multi_step_fn,
            donate_argnums=(0,),
            in_shardings=(None, batch_sh, repl),
        )

    if mesh is None:
        return jax.jit(step_fn, donate_argnums=(0,))

    batch_sh = NamedSharding(mesh, P(DATA_AXIS))
    repl = NamedSharding(mesh, P())
    # Shardings for state are resolved lazily at first call from the state's
    # own placement; constrain only inputs/outputs we know statically.
    return jax.jit(
        step_fn,
        donate_argnums=(0,),
        in_shardings=(None, batch_sh, repl),
    )


def shard_train_state(state: TrainState, mesh, fsdp: bool = False) -> TrainState:
    """Place the whole train state on the mesh: replicated except the
    classifier head weight and its optimizer moments (class-sharded over
    'model') and, with fsdp=True, the SSL/whisper frontend kernels +
    moments sharded over 'data' (ZeRO-3 role) — the path predicates in
    parallel.mesh.param_shardings cover the params-structured subtrees
    inside optax states too."""
    from ..parallel.mesh import shard_tree

    return shard_tree(state, mesh, fsdp=fsdp)


def cast_variables_bf16(variables):
    """Cast all f32 leaves to bf16 — the companion of compute_dtype=bf16
    in make_eval_embed / make_chunked_embed (embeddings cosine > 0.9999
    vs f32, docs/BENCH_LOCAL.md)."""
    return jax.tree.map(
        lambda x: x.astype(jnp.bfloat16)
        if hasattr(x, "dtype") and x.dtype == jnp.float32
        else x,
        variables,
    )


def make_eval_embed(
    model,
    feature_cfg: Optional[FeaturePipelineConfig] = None,
    mesh=None,
    compute_dtype=None,
    pipeline_microbatches: Optional[int] = None,
) -> Callable:
    """Jitted embedding extraction: batch -> (B, emb_dim) float32.

    Batch: {'wav': (B, W), 'length': (B,)} or {'feat': ..., 'feat_length'}.
    Equivalent of reference bin/extract.py:90-120 but batched + masked.
    `compute_dtype=jnp.bfloat16` runs the backbone in bf16 (+37% on
    ECAPA extraction; embeddings cosine > 0.9999 vs f32) — pass
    variables cast to the same dtype.
    """

    use_frontend = getattr(model, "frontend", None) is not None

    def embed_fn(variables, batch):
        fcfg = feature_cfg or FeaturePipelineConfig()
        if "feat" in batch:
            # precomputed features: CMVN still runs on device (the
            # reference applies apply_cmvn in bin/extract.py for every
            # data type after moving it out of the CPU dataset chain)
            feats = apply_cmvn(
                batch["feat"],
                norm_mean=fcfg.cmvn_norm_mean,
                norm_var=fcfg.cmvn_norm_var,
                lengths=batch.get("feat_length"),
            )
            mask = None
            if "feat_length" in batch:
                t = feats.shape[1]
                mask = jnp.arange(t)[None, :] < batch["feat_length"][:, None]
        elif use_frontend:
            wav = batch["wav"]
            if compute_dtype is not None:
                wav = wav.astype(compute_dtype)  # see make_train_step note
            if pipeline_microbatches:
                from ..parallel.pipeline import pipelined_frontend_features

                feats, feat_lengths = pipelined_frontend_features(
                    model,
                    variables,
                    wav,
                    mesh=mesh,
                    n_micro=pipeline_microbatches,
                    data_axis=DATA_AXIS,
                    lengths=batch.get("length"),
                )
            else:
                feats, feat_lengths = model.apply(
                    variables,
                    wav,
                    lengths=batch.get("length"),
                    train=False,
                    method=model.features,
                )
            feats = apply_cmvn(
                feats,
                norm_mean=fcfg.cmvn_norm_mean,
                norm_var=fcfg.cmvn_norm_var,
                lengths=feat_lengths,
            )
            mask = None
            if feat_lengths is not None:
                mask = (
                    jnp.arange(feats.shape[1])[None, :] < feat_lengths[:, None]
                )
        else:
            feats, mask = wav_to_features(
                batch["wav"],
                fcfg,
                rng=None,
                lengths=batch.get("length"),
                train=False,
            )
        if compute_dtype is not None:
            feats = feats.astype(compute_dtype)
        out = model.apply(
            variables, feats, mask=mask, train=False, method=model.embed
        )
        return out.astype(jnp.float32)

    if mesh is None:
        return jax.jit(embed_fn)
    batch_sh = NamedSharding(mesh, P(DATA_AXIS))
    return jax.jit(embed_fn, in_shardings=(None, batch_sh))
