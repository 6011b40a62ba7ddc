"""Training entry point (the reference's bin/train.py:39 rebuilt as a
single-process SPMD driver).

Where the reference launches one torch process per GPU via torchrun and
wraps the model in DDP (reference bin/train.py:49-54,170-171), this driver
is ONE process per host: a ('data','model') mesh spans every chip,
gradient sync is GSPMD's partitioning of the loss reduction, and the
classifier head is class-sharded.  Multi-host runs call
jax.distributed.initialize() first and use the same code.

Config schema mirrors the reference YAML (examples/voxceleb/v2/conf/
ecapa_tdnn.yaml): model/model_args, projection_args, dataset_args,
optimizer/optimizer_args, scheduler/scheduler_args, margin_update.
"""

from __future__ import annotations

import logging
import os
import time
from typing import Dict

import jax
import jax.numpy as jnp

import numpy as np

from ..data import (AugStore, PrefetchPipeline, TrainPipeline,
                    TrainPipelineConfig)
from ..models import get_projection, get_speaker_model
from ..models.speaker_net import SpeakerNet
from ..ops.fbank import FbankConfig
from ..ops.pipeline import FeaturePipelineConfig
from ..parallel import make_mesh, shard_batch
from ..train import (
    MarginSchedule,
    create_train_state,
    get_lr_schedule,
    make_optimizer,
    make_train_step,
    shard_train_state,
)
from ..utils.checkpoint import (
    latest_checkpoint,
    load_partial,
    save_checkpoint,
)
from ..utils.config import dump_config, parse_config_or_kwargs

__all__ = ["train", "build_speaker_net", "read_spk2id"]


def read_spk2id(train_label_path: str) -> Dict[str, int]:
    """utt spk table -> sorted spk -> id (reference utils/utils.py:76)."""
    spks = set()
    with open(train_label_path) as f:
        for line in f:
            parts = line.split()
            if len(parts) >= 2:
                spks.add(parts[1])
    return {s: i for i, s in enumerate(sorted(spks))}


def build_speaker_net(config: dict, num_class: int, mesh=None) -> SpeakerNet:
    """Assemble frontend (optional) -> backbone -> projection (reference
    bin/train.py:109-145)."""
    model_args = dict(config.get("model_args", {}))
    dataset_args = config.get("dataset_args", {})
    frontend = None
    if dataset_args.get("frontend", "fbank") == "s3prl":
        from ..frontend import SSLEncoderConfig, SSLFrontend

        s3prl_args = dataset_args.get("s3prl_args", {})
        upstream = s3prl_args.get("upstream", "wavlm_large")
        enc_cfg = getattr(SSLEncoderConfig, upstream)()
        overrides = {
            k: s3prl_args[k]
            for k in ("attn_impl", "gelu_impl")  # einsum|flash, erf|tanh
            if k in s3prl_args
        }
        if overrides:
            import dataclasses as _dc

            enc_cfg = _dc.replace(enc_cfg, **overrides)
        if s3prl_args.get("sequence_parallel") and mesh is not None:
            import dataclasses as _dc

            from ..parallel import sequence_parallel_constraint

            enc_cfg = _dc.replace(
                enc_cfg,
                # inside the partial-manual pipeline body the constraint
                # must be a bare PartitionSpec (parallel.mesh docstring)
                act_constraint=sequence_parallel_constraint(
                    mesh,
                    bare=int(s3prl_args.get("pipeline_parallel", 1)) > 1,
                ),
            )
        frontend = SSLFrontend(
            enc_cfg,
            frozen=s3prl_args.get("frozen", True),
            layer=s3prl_args.get("layer", -1),
            multilayer_feature=s3prl_args.get("multilayer_feature", True),
        )
        model_args["feat_dim"] = enc_cfg.hidden_size
    elif dataset_args.get("frontend") == "whisper_encoder":
        from ..frontend import WhisperEncoder, WhisperEncoderConfig

        wargs = dataset_args.get("whisper_encoder_args", {})
        wcfg = getattr(
            WhisperEncoderConfig, wargs.get("variant", "large_v2")
        )()
        woverrides = {
            k: wargs[k]
            for k in ("attn_impl", "gelu_impl")
            if k in wargs
        }
        if woverrides:
            import dataclasses as _dc

            wcfg = _dc.replace(wcfg, **woverrides)
        if wargs.get("sequence_parallel") and mesh is not None:
            import dataclasses as _dc

            from ..parallel import sequence_parallel_constraint

            wcfg = _dc.replace(
                wcfg,
                act_constraint=sequence_parallel_constraint(
                    mesh,
                    bare=int(wargs.get("pipeline_parallel", 1)) > 1,
                ),
            )
        frontend = WhisperEncoder(wcfg, frozen=wargs.get("frozen", False))
        model_args["feat_dim"] = wcfg.output_size
    backbone = get_speaker_model(config["model"])(**model_args)
    proj_conf = dict(config.get("projection_args", {}))
    proj_conf.setdefault("embed_dim", model_args.get("embed_dim", 192))
    proj_conf["num_class"] = num_class
    projection = get_projection(proj_conf)
    return SpeakerNet(
        backbone=backbone, projection=projection, frontend=frontend
    )


def _feature_cfg(dataset_args: dict) -> FeaturePipelineConfig:
    fb = dataset_args.get("fbank_args", {})
    sa = dataset_args.get("spec_aug_args", {})
    return FeaturePipelineConfig(
        fbank=FbankConfig(
            num_mel_bins=fb.get("num_mel_bins", 80),
            frame_shift_ms=fb.get("frame_shift", 10),
            frame_length_ms=fb.get("frame_length", 25),
            dither=fb.get("dither", 1.0),
            matmul_precision=fb.get("matmul_precision", "highest"),
        ),
        spec_aug=dataset_args.get("spec_aug", False),
        spec_aug_num_t_mask=sa.get("num_t_mask", 1),
        spec_aug_num_f_mask=sa.get("num_f_mask", 1),
        spec_aug_max_t=sa.get("max_t", 10),
        spec_aug_max_f=sa.get("max_f", 8),
        spec_aug_prob=sa.get("prob", 0.6),
    )


def train(config: str | dict, **overrides):
    """Run supervised training.  `config` is a YAML path or a dict."""
    if isinstance(config, str):
        config = parse_config_or_kwargs(config, **overrides)
    else:
        config = {**config, **overrides}

    exp_dir = config.get("exp_dir", "exp/default")
    os.makedirs(exp_dir, exist_ok=True)
    logging.basicConfig(
        level=logging.INFO, format="%(asctime)s %(levelname)s %(message)s"
    )
    logger = logging.getLogger("train")

    seed = config.get("seed", 42)
    dataset_args = config.get("dataset_args", {})
    dataloader_args = config.get("dataloader_args", {})
    batch_size = dataloader_args.get("batch_size", 64)

    # ---- mesh (+ optional multi-host init)
    from ..parallel.launch import host_rank_world, initialize_distributed

    if config.get("coordinator_address"):
        initialize_distributed(
            config["coordinator_address"],
            config.get("num_processes"),
            config.get("process_id"),
        )
    rank, world = host_rank_world()
    model_parallel = config.get("model_parallel", 1)
    # pipeline parallelism: YAML knob in the frontend args (the layer-
    # homogeneous transformer stacks are the pipelineable mass).  e.g.
    #   dataset_args.s3prl_args.pipeline_parallel: 2
    #   dataset_args.s3prl_args.pipeline_microbatches: 8   (optional)
    fe_args = {}
    if dataset_args.get("frontend") == "s3prl":
        fe_args = dataset_args.get("s3prl_args", {})
    elif dataset_args.get("frontend") == "whisper_encoder":
        fe_args = dataset_args.get("whisper_encoder_args", {})
    pipeline_parallel = int(fe_args.get("pipeline_parallel", 1))
    pipeline_remat = bool(fe_args.get("pipeline_remat", False))
    pipeline_microbatches = fe_args.get("pipeline_microbatches")
    if pipeline_parallel > 1 and pipeline_microbatches is None:
        # default: ~4 microbatches per stage bounds the bubble at
        # (S-1)/(M+S-1) < 20%, clipped to a divisor of the batch
        m = max(1, min(batch_size, 4 * pipeline_parallel))
        while batch_size % m:
            m -= 1
        pipeline_microbatches = m
    mesh = make_mesh(
        model_parallel=model_parallel, pipeline_parallel=pipeline_parallel
    )
    n_data = mesh.devices.shape[0]
    logger.info("mesh: %s", mesh)
    # batch_size is rows PER HOST (global batch = batch_size * world);
    # the global batch must split evenly over the data axis, and each
    # host's rows over its own chips
    chips_per_host = max(1, n_data // max(1, world))
    assert (batch_size * world) % n_data == 0 and batch_size % chips_per_host == 0, (
        f"per-host batch_size {batch_size} x {world} hosts must be "
        f"divisible by the data-parallel degree {n_data} "
        f"({chips_per_host} data chips per host)"
    )

    # ---- data
    spk2id = read_spk2id(config["train_label"])
    with open(config["train_data"]) as f:
        data_list = [ln.strip() for ln in f if ln.strip()]

    speed_perturb = dataset_args.get("speed_perturb", True)
    if config.get("data_type", "raw") == "feat":
        # precomputed features: no wav-domain speed perturb (reference
        # dataset.py:194-199), so the label space stays x1
        speed_perturb = False
        if dataset_args.get("frontend", "fbank") != "fbank":
            # SSL/whisper frontends consume raw wav; feat batches would
            # silently bypass them (executor's 'feat' branch feeds the
            # backbone directly)
            raise ValueError(
                "data_type=feat requires frontend=fbank (precomputed "
                "features cannot feed a wav-domain frontend)"
            )
    num_class = len(spk2id) * (3 if speed_perturb else 1)

    reverb_store = noise_store = None
    if dataset_args.get("reverb_data"):
        reverb_store = AugStore(root=dataset_args["reverb_data"])
    if dataset_args.get("noise_data"):
        noise_store = AugStore(root=dataset_args["noise_data"])

    pipe_cfg = TrainPipelineConfig(
        data_type=config.get("data_type", "raw"),
        num_frms=dataset_args.get("num_frms", 200),
        shuffle=dataset_args.get("shuffle", True),
        shuffle_size=dataset_args.get("shuffle_args", {}).get("shuffle_size", 2500),
        filter_min_frames=dataset_args.get("filter_args", {}).get(
            "min_num_frames", 100
        ),
        filter_max_frames=dataset_args.get("filter_args", {}).get(
            "max_num_frames", 800
        ),
        speed_perturb=speed_perturb,
        aug_prob=dataset_args.get("aug_prob", 0.6),
        batch_size=batch_size,
        seed=seed,
        # The packed [reverb|noise|clean] layout is per-host: every
        # host's pipeline computes identical deterministic slot counts,
        # shard_batch concatenates the blocks contiguously, and the
        # train step vmaps the packed kernel over the block axis
        # (aug_blocks=world below) — multi-host keeps both the packed
        # aug perf and the native C++ loader.
        packed_aug=dataset_args.get("packed_aug", True),
        aug_align=n_data,  # keep packed slices shard-aligned under GSPMD
    )
    num_workers = int(dataloader_args.get("num_workers", 0))
    pipe = None
    if num_workers > 0:
        # reference DataLoader(num_workers=N) role.  Preferred realization:
        # the C++ loader's worker pool (decode/filter/chunk/speed/batch with
        # no GIL, deterministic reorder-window emission).  Falls back to the
        # python thread pipeline for shard lists / VAD entries / no g++.
        try:
            from ..data import NativeTrainPipeline

            pipe = NativeTrainPipeline(
                data_list, spk2id, pipe_cfg,
                reverb_store=reverb_store, noise_store=noise_store,
                rank=rank, world_size=world,
                num_threads=num_workers,
            )
            logger.info("data: native C++ loader, %d threads", num_workers)
        except Exception as e:
            logger.info(
                "native loader unavailable (%s); python thread pipeline", e
            )
            pipe = PrefetchPipeline(
                data_list, spk2id, pipe_cfg,
                reverb_store=reverb_store, noise_store=noise_store,
                rank=rank, world_size=world,
                num_workers=num_workers,
                prefetch=int(dataloader_args.get("prefetch_factor", 4)),
            )
    if pipe is None:
        pipe = TrainPipeline(
            data_list, spk2id, pipe_cfg,
            reverb_store=reverb_store, noise_store=noise_store,
            rank=rank, world_size=world,
        )

    # ---- model
    net = build_speaker_net(config, num_class, mesh=mesh)
    feature_cfg = _feature_cfg(dataset_args)
    fe_cfg = net.frontend.cfg if net.frontend is not None else None
    if pipeline_parallel > 1:
        if net.frontend is None:
            raise ValueError(
                "pipeline_parallel requires an s3prl/whisper_encoder "
                "frontend (the backbone families are not homogeneous "
                "layer stacks)"
            )
        n_layers = getattr(
            fe_cfg, "num_hidden_layers", getattr(fe_cfg, "n_layer", None)
        )
        if n_layers % pipeline_parallel:
            raise ValueError(
                f"{n_layers} frontend layers not divisible by "
                f"pipeline_parallel={pipeline_parallel}"
            )
        if batch_size % pipeline_microbatches:
            raise ValueError(
                f"batch_size {batch_size} not divisible by "
                f"pipeline_microbatches={pipeline_microbatches}"
            )
        logger.info(
            "pipeline parallel: %d stages x %d layers, %d microbatches"
            " (bubble %.0f%%)",
            pipeline_parallel, n_layers // pipeline_parallel,
            pipeline_microbatches,
            100.0 * (pipeline_parallel - 1)
            / (pipeline_microbatches + pipeline_parallel - 1),
        )

    def _canon_params(params):
        """Pipeline-stacked -> canonical per-layer frontend layout (the
        on-disk checkpoint format, interchangeable with non-pp runs)."""
        if pipeline_parallel > 1 and "frontend" in params:
            from ..parallel import unstack_frontend_tree

            p = dict(params)
            p["frontend"] = unstack_frontend_tree(p["frontend"], fe_cfg)
            return p
        return params

    def _pipe_params(params):
        if pipeline_parallel > 1 and "frontend" in params:
            from ..parallel import stack_frontend_tree

            p = dict(params)
            p["frontend"] = stack_frontend_tree(p["frontend"], fe_cfg)
            return p
        return params

    # ---- schedules (LR batch-scaled like reference train.py:192)
    num_epochs = config.get("num_epochs", 150)
    epoch_iter = config.get("epoch_iter")
    if epoch_iter is None:
        if config.get("data_type", "raw") == "shard":
            # shard-list LINES are tar paths, not utterances — deriving
            # epoch_iter from them would silently run a tiny fraction of
            # each epoch AND desync the LR/margin schedules' total-step
            # accounting (reference configs always set epoch_iter).
            raise ValueError(
                "data_type=shard requires an explicit epoch_iter "
                "(utterances-per-tar is unknown to the driver; e.g. "
                "total_utts // batch_size)"
            )
        epoch_iter = max(1, len(data_list) * 8 // batch_size)
    sched_args = dict(config.get("scheduler_args", {}))
    sched_args.setdefault("initial_lr", 0.1)
    sched_args.setdefault("final_lr", 5e-5)
    # batch_size is rows PER HOST; the global per-step batch is
    # world x batch_size (one SPMD program, batch sharded over 'data').
    # The reference's scale is world_size x per-GPU batch / 64
    # (train.py:192) — the same global batch.  (Chips within a host do
    # NOT multiply: they shard the host's rows, they don't add rows.)
    world_batch = batch_size * world if config.get("scale_lr_by_world", True) else batch_size
    scale_ratio = max(1.0, world_batch / 64)
    lr_schedule = get_lr_schedule(
        config.get("scheduler", "ExponentialDecrease"),
        num_epochs=num_epochs,
        epoch_iter=epoch_iter,
        scale_ratio=scale_ratio,
        **sched_args,
    )
    m_args = config.get("margin_update", {})
    margin_schedule = MarginSchedule(
        epoch_iter=epoch_iter,
        increase_start_epoch=m_args.get("increase_start_epoch", 20),
        fix_start_epoch=m_args.get("fix_start_epoch", 40),
        initial_margin=m_args.get("initial_margin", 0.0),
        final_margin=m_args.get("final_margin", 0.2),
        increase_type=m_args.get("increase_type", "exp"),
        update_margin=m_args.get("update_margin", True),
    )
    opt_args = config.get("optimizer_args", {})
    freeze_paths = ()
    if net.frontend is not None and getattr(net.frontend, "frozen", False):
        # s3prl frontends nest the pretrained weights under 'upstream';
        # the whisper encoder's params live directly under 'frontend'
        if hasattr(getattr(net.frontend, "cfg", None), "conv_kernel"):
            freeze_paths = (("frontend", "upstream"),)
        else:
            freeze_paths = (("frontend",),)
    tx = make_optimizer(
        lr_schedule,
        config.get("optimizer", "SGD"),
        momentum=opt_args.get("momentum", 0.9),
        nesterov=opt_args.get("nesterov", True),
        weight_decay=opt_args.get("weight_decay", 1e-4),
        freeze_paths=freeze_paths,
    )

    # ---- state (+resume / partial init)
    example_wav = None
    if net.frontend is not None:
        from ..frontend import feat_extract_output_lengths

        chunk = pipe.chunk_samples
        example_wav = jnp.zeros((batch_size, chunk))
        if hasattr(net.frontend, "cfg") and hasattr(
            net.frontend.cfg, "conv_kernel"
        ):
            t_ex = int(feat_extract_output_lengths(net.frontend.cfg, chunk))
        else:
            t_ex = pipe_cfg.num_frms  # T doesn't affect param shapes
        feat_dim = getattr(
            net.backbone, "feat_dim",
            getattr(net.backbone, "output_size", None),
        )
        feats_ex = jnp.zeros((batch_size, t_ex, feat_dim))
    else:
        feat_dim = feature_cfg.fbank.num_mel_bins
        if config.get("data_type", "raw") == "feat":
            # feature dim comes from the precomputed matrices, not the
            # in-graph fbank; model_args.feat_dim is authoritative
            feat_dim = config.get("model_args", {}).get(
                "feat_dim", dataset_args.get("feat_dim", feat_dim)
            )
        feats_ex = jnp.zeros((batch_size, pipe_cfg.num_frms, feat_dim))
    label_ex = jnp.zeros((batch_size,), jnp.int32)
    state = create_train_state(
        net, tx, jax.random.key(seed), feats_ex, label_ex,
        example_wav=example_wav,
    )

    # HF checkpoint import for the SSL frontend (weight-for-weight)
    s3prl_args = dataset_args.get("s3prl_args", {})
    if net.frontend is not None and s3prl_args.get("hf_checkpoint"):
        from ..frontend import convert_hf_state_dict

        import numpy as _np

        sd = _np.load(s3prl_args["hf_checkpoint"], allow_pickle=True)
        sd = dict(sd.item()) if hasattr(sd, "item") else dict(sd)
        upstream_params = convert_hf_state_dict(sd, net.frontend.cfg)
        params = dict(state.params)
        frontend_params = dict(params["frontend"])
        frontend_params["upstream"] = upstream_params
        params["frontend"] = frontend_params
        state = state.replace(params=params)
        logger.info("imported SSL frontend weights from %s",
                    s3prl_args["hf_checkpoint"])

    # Whisper weight import (reference conf model_path: whisper_hub/*.pt,
    # converted offline to an npz state dict — frontend/whisper.py)
    wargs = dataset_args.get("whisper_encoder_args", {})
    if (
        net.frontend is not None
        and dataset_args.get("frontend") == "whisper_encoder"
        and wargs.get("checkpoint")
    ):
        import numpy as _np

        from ..frontend import convert_whisper_state_dict

        sd = _np.load(wargs["checkpoint"], allow_pickle=True)
        sd = dict(sd.item()) if hasattr(sd, "item") else dict(sd)
        params = dict(state.params)
        params["frontend"] = convert_whisper_state_dict(sd, net.frontend.cfg)
        state = state.replace(params=params)
        logger.info("imported whisper encoder weights from %s",
                    wargs["checkpoint"])

    if pipeline_parallel > 1:
        # stacked pipeline layout: the frontend layer params live as one
        # (L, ...) stack sharded over 'pipe' (1/S-th of HBM per stage);
        # optimizer state re-inits over the new tree (fresh momenta — the
        # reference's per-epoch checkpoints carry no optimizer state
        # either; full-state resume below restores stacked momenta)
        stacked_params = _pipe_params(state.params)
        state = state.replace(
            params=stacked_params, opt_state=tx.init(stacked_params)
        )

    start_epoch = 0
    start_batch = 0  # mid-epoch resume position (batches already consumed)
    full_state_path = os.path.join(exp_dir, "models", "train_state.ckpt")
    if config.get("save_optimizer", False) and os.path.exists(full_state_path):
        restored, missing, unexpected = load_partial(
            full_state_path,
            {
                "params": state.params,
                "batch_stats": state.batch_stats,
                "opt_state": state.opt_state,
                "step": state.step,
            },
        )
        state = state.replace(
            params=restored["params"],
            batch_stats=restored["batch_stats"],
            opt_state=restored["opt_state"],
            step=jnp.asarray(restored["step"], jnp.int32),
        )
        import json as _json

        with open(full_state_path + ".json") as f:
            meta = _json.load(f)
        start_epoch = meta.get("epoch", 0)
        # step-EXACT mid-epoch resume: the data pipeline is deterministic
        # given (seed, epoch), so skipping the first batch_in_epoch batches
        # reproduces the stream bit-identically (the reference restarts the
        # epoch and replays/skips samples — SURVEY §5 "no mid-epoch resume")
        start_batch = meta.get("batch_in_epoch", 0)
        logger.info(
            "resumed FULL train state from %s (epoch %d, batch %d, step %d)",
            full_state_path, start_epoch, start_batch, int(state.step),
        )
        ckpt = None
    else:
        ckpt = config.get("checkpoint") or latest_checkpoint(
            os.path.join(exp_dir, "models")
        )
    if ckpt:
        meta_path = ckpt + ".json"
        # checkpoints are stored in the CANONICAL per-layer layout: load
        # against a canonical template, then restack for the pipeline
        state_tree = {
            "params": _canon_params(state.params),
            "batch_stats": state.batch_stats,
        }
        restored, missing, unexpected = load_partial(ckpt, state_tree)
        state = state.replace(
            params=_pipe_params(restored["params"]),
            batch_stats=restored["batch_stats"],
        )
        if os.path.exists(meta_path):
            import json

            with open(meta_path) as f:
                start_epoch = json.load(f).get("epoch", 0)
        logger.info(
            "resumed %s (epoch %d, %d missing, %d unexpected)",
            ckpt, start_epoch, len(missing), len(unexpected),
        )
    elif config.get("model_init"):
        state_tree = {
            "params": _canon_params(state.params),
            "batch_stats": state.batch_stats,
        }
        restored, missing, unexpected = load_partial(
            config["model_init"], state_tree
        )
        state = state.replace(
            params=_pipe_params(restored["params"]),
            batch_stats=restored["batch_stats"],
        )
        logger.info(
            "model_init from %s (%d missing, %d unexpected)",
            config["model_init"], len(missing), len(unexpected),
        )

    # fsdp: true additionally shards the SSL/whisper frontend params +
    # optimizer moments over 'data' (ZeRO-3 role — 1/N HBM per chip,
    # XLA all-gathers per layer); no-op without a frontend
    state = shard_train_state(state, mesh, fsdp=bool(config.get("fsdp")))
    # loop_steps > 1 scans that many optimizer steps inside one XLA
    # dispatch (train/executor.py): fewer host round trips — the main
    # lever when the host-device link has per-dispatch latency
    loop_steps = int(config.get("loop_steps", 1))
    aug_blocks = world if pipe_cfg.packed_aug else 1
    # mixed precision: `enable_amp: true` (the reference's WavLM confs,
    # e.g. conf/ecapa_tdnn_WavLM_frozen.yaml:5) means bf16 activations/
    # params in the forward+backward with f32 master weights
    # (train/executor.py).  Default FALSE, matching the reference's
    # non-SSL confs (conf/ecapa_tdnn.yaml sets enable_amp: False) — bf16
    # is an explicit per-conf choice, not a silent default.  Like the
    # reference's CUDA-only autocast it engages only on accelerators;
    # `compute_dtype: bf16|f32` overrides either way.
    amp_default = (
        "bf16"
        if config.get("enable_amp", False)
        and jax.default_backend() not in ("cpu",)
        else "f32"
    )
    cd_name = str(config.get("compute_dtype", amp_default)).lower()
    compute_dtype = jnp.bfloat16 if cd_name in ("bf16", "bfloat16") else None
    pp_kwargs = {}
    if pipeline_parallel > 1:
        pp_kwargs = dict(
            pipeline_microbatches=pipeline_microbatches,
            pipeline_remat=pipeline_remat,
        )
    step_fn = make_train_step(
        net, tx, lr_schedule, margin_schedule,
        feature_cfg=feature_cfg, mesh=mesh,
        chunk_samples=pipe.chunk_samples,
        num_steps=loop_steps,
        aug_blocks=aug_blocks,
        compute_dtype=compute_dtype,
        **pp_kwargs,
    )
    # single-step program for the tail of an epoch when the batch count
    # isn't a multiple of loop_steps
    flush_fn = step_fn if loop_steps == 1 else make_train_step(
        net, tx, lr_schedule, margin_schedule,
        feature_cfg=feature_cfg, mesh=mesh,
        chunk_samples=pipe.chunk_samples,
        aug_blocks=aug_blocks,
        compute_dtype=compute_dtype,
        **pp_kwargs,
    )

    dump_config(config, os.path.join(exp_dir, "config.yaml"))

    from ..utils.observability import MetricsLogger, ThroughputMeter

    mlog = MetricsLogger(os.path.join(exp_dir, "metrics.jsonl"))
    meter = ThroughputMeter()
    audio_s_per_batch = batch_size * pipe_cfg.num_frms * 0.01

    # ---- epoch loop
    log_interval = config.get("log_batch_interval", 100)
    save_interval = config.get("save_epoch_interval", 5)
    # mid-epoch full-state saves every N batches (0 = end-of-epoch only);
    # stop_at_step bounds the run at a global optimizer step (full state
    # saved so a later run resumes bit-exactly)
    save_batch_interval = int(config.get("save_batch_interval", 0))
    stop_at_step = config.get("stop_at_step")

    def _save_full_state(epoch, batch_in_epoch):
        save_checkpoint(
            full_state_path,
            {
                "params": state.params,
                "batch_stats": state.batch_stats,
                "opt_state": state.opt_state,
                "step": state.step,
            },
            meta={
                "epoch": epoch,
                "batch_in_epoch": batch_in_epoch,
                "step": int(state.step),
                # full-state ckpts keep the stacked layout (resume
                # requires the same pipeline_parallel config); per-epoch
                # model ckpts below are always canonical per-layer
                "pipeline_parallel": pipeline_parallel,
            },
        )

    rng = jax.random.key(seed + 1)

    def _epoch_batches(epoch):
        """One epoch's batch stream.  Multi-host: if this rank's stripe
        exhausts before epoch_iter, cycle reshuffled passes so every rank
        executes the same number of collective steps (the reference's
        DistributedSampler pads for the same reason) — the epoch loop's
        `n_iter >= epoch_iter` break bounds consumption."""
        wrap = 0
        while True:
            yielded = 0
            for b in pipe:
                yielded += 1
                yield b
            if world <= 1 or yielded == 0:
                return
            wrap += 1
            pipe.set_epoch(epoch + 100003 * wrap)

    for epoch in range(start_epoch, num_epochs):
        pipe.set_epoch(epoch)
        t0 = time.time()
        n_iter = 0
        pending = []
        batch_iter = _epoch_batches(epoch)
        if epoch == start_epoch and start_batch:
            # deterministic fast-forward: replay the host-side selection for
            # already-consumed batches (IO-bound, no device work)
            for _ in range(start_batch):
                next(batch_iter, None)
            n_iter = start_batch
            logger.info("fast-forwarded %d batches (mid-epoch resume)",
                        start_batch)
        stopped = False
        for batch in batch_iter:
            if loop_steps > 1:
                pending.append(
                    {k: v for k, v in batch.items() if k != "keys"}
                )
                if len(pending) < loop_steps:
                    continue
                stacked = {
                    k: np.stack([p[k] for p in pending])
                    for k in pending[0]
                }
                pending = []
                batch = shard_batch(stacked, mesh, stacked=True)
                state, metrics = step_fn(state, batch, rng)
                # stacked (K,) metrics: report the last step's values
                metrics = {k: v[-1] for k, v in metrics.items()}
                n_iter += loop_steps
            else:
                batch = shard_batch(
                    {k: v for k, v in batch.items() if k != "keys"}, mesh
                )
                state, metrics = step_fn(state, batch, rng)
                n_iter += 1
            if n_iter % log_interval < loop_steps:
                jax.block_until_ready(metrics["loss"])
                meter.update(audio_s_per_batch * log_interval, log_interval)
                logger.info(
                    "epoch %d iter %d loss %.4f acc %.4f lr %.6f margin %.3f"
                    " (%.0f audio-s/s)",
                    epoch, n_iter, float(metrics["loss"]),
                    float(metrics["acc"]), float(metrics["lr"]),
                    float(metrics["margin"]), meter.audio_seconds_per_s,
                )
                mlog.log(
                    int(state.step), epoch=epoch,
                    loss=metrics["loss"], acc=metrics["acc"],
                    lr=metrics["lr"], margin=metrics["margin"],
                    audio_s_per_s=meter.audio_seconds_per_s,
                )
            if (
                save_batch_interval
                and config.get("save_optimizer", False)
                and n_iter % save_batch_interval < loop_steps
            ):
                _save_full_state(epoch, n_iter)
            if stop_at_step is not None and int(state.step) >= stop_at_step:
                stopped = True
                if config.get("save_optimizer", False):
                    _save_full_state(epoch, n_iter)
                logger.info(
                    "stop_at_step %d reached (epoch %d batch %d)",
                    stop_at_step, epoch, n_iter,
                )
                break
            if n_iter >= epoch_iter:
                break
        if stopped:
            return state
        for tail in pending:  # flush leftover (< loop_steps) batches
            state, metrics = flush_fn(state, shard_batch(tail, mesh), rng)
            n_iter += 1
        pending = []
        dt = time.time() - t0
        logger.info("epoch %d done: %d iters in %.1fs", epoch, n_iter, dt)
        if (epoch + 1) % save_interval == 0 or epoch + 1 == num_epochs:
            path = os.path.join(exp_dir, "models", f"model_{epoch + 1}.ckpt")
            save_checkpoint(
                path,
                {
                    "params": _canon_params(state.params),
                    "batch_stats": state.batch_stats,
                },
                meta={"epoch": epoch + 1, "step": int(state.step)},
            )
            logger.info("saved %s", path)
            if config.get("save_optimizer", False):
                # full-state checkpoint enables EXACT step-level resume
                # (optimizer momenta + step counter + data position; the
                # reference only saves model weights per epoch — SURVEY §5
                # notes it has no mid-epoch resume)
                _save_full_state(epoch + 1, 0)
    return state


def main():
    import argparse

    p = argparse.ArgumentParser()
    p.add_argument("--config", required=True)
    p.add_argument("overrides", nargs="*", help="key=value config overrides")
    args = p.parse_args()
    cfg = parse_config_or_kwargs(args.config, overrides=args.overrides)
    train(cfg)


if __name__ == "__main__":
    main()
