"""DINO self-supervised training entry point (reference
ssl/bin/train_dino.py:43 rebuilt as a config-driven SPMD driver).

Config schema mirrors the reference DINO YAML: dataset_args with
global/local chunk setup, model/model_args for the backbone, dino_args
(head dims, temperatures, EMA momentum schedule), optimizer SGD/LARS,
cosine LR scaled by batch/256 (reference train_dino.py:185).

Note on BatchNorm: the reference wraps the student in SyncBN
(dino_wrapper.py:257-261); here BN statistics are ALREADY global —
under pjit the batch axis is one logical array, so the partitioned mean
is the cross-replica mean by construction.
"""

from __future__ import annotations

import logging
import os
import time

import jax
import jax.numpy as jnp
import optax

from ..data import AugStore, load_data_list
from ..models import get_speaker_model
from ..ops.augment import add_reverb_noise
from ..ops.fbank import FbankConfig
from ..ops.pipeline import FeaturePipelineConfig, wav_to_features
from ..parallel import make_mesh, shard_batch, shard_tree
from ..ssl import (
    DINOHead,
    DINONet,
    SSLPipeline,
    cosine_schedule,
    create_dino_state,
    make_dino_train_step,
)
from ..utils.checkpoint import save_checkpoint
from ..utils.config import dump_config, parse_config_or_kwargs

__all__ = ["train_dino"]


def train_dino(config, **overrides):
    if isinstance(config, str):
        config = parse_config_or_kwargs(config, **overrides)
    else:
        config = {**config, **overrides}

    exp_dir = config.get("exp_dir", "exp/dino")
    os.makedirs(os.path.join(exp_dir, "models"), exist_ok=True)
    logging.basicConfig(level=logging.INFO)
    logger = logging.getLogger("train_dino")

    dataset_args = config.get("dataset_args", {})
    dino_args = config.get("dino_args", {})
    batch_size = config.get("dataloader_args", {}).get("batch_size", 64)
    num_epochs = config.get("num_epochs", 150)
    epoch_iter = config.get("epoch_iter", 1000)
    total = num_epochs * epoch_iter
    n_global = dataset_args.get("global_chunk_num", 2)
    n_local = dataset_args.get("local_chunk_num", 4)

    mesh = make_mesh(model_parallel=1)

    # ---- model
    model_args = dict(config.get("model_args", {}))
    backbone = get_speaker_model(config["model"])(**model_args)
    embed_dim = model_args.get("embed_dim", 192)
    out_dim = dino_args.get("out_dim", 65536)
    head = DINOHead(
        in_dim=embed_dim,
        out_dim=out_dim,
        hidden_dim=dino_args.get("hidden_dim", 2048),
        bottleneck_dim=dino_args.get("bottleneck_dim", 256),
        use_bn=dino_args.get("use_bn_in_head", False),
        norm_last_layer=dino_args.get("norm_last_layer", True),
    )
    net = DINONet(backbone=backbone, head=head)

    # ---- data
    reverb_store = noise_store = None
    if dataset_args.get("reverb_data"):
        reverb_store = AugStore(root=dataset_args["reverb_data"])
    if dataset_args.get("noise_data"):
        noise_store = AugStore(root=dataset_args["noise_data"])
    pipe = SSLPipeline(
        load_data_list(config["train_data"]),
        data_type=config.get("data_type", "raw"),
        global_frames=dataset_args.get("global_chunk_len", 200),
        global_num=n_global,
        local_frames=dataset_args.get("local_chunk_len", 100),
        local_num=n_local,
        batch_size=batch_size,
        aug_prob=dataset_args.get("aug_prob", 0.6),
        reverb_store=reverb_store,
        noise_store=noise_store,
        seed=config.get("seed", 42),
    )

    fb = dataset_args.get("fbank_args", {})
    fcfg = FeaturePipelineConfig(
        fbank=FbankConfig(
            num_mel_bins=fb.get("num_mel_bins", 80),
            dither=fb.get("dither", 1.0),
        ),
        spec_aug=False,
    )

    def preprocess(batch, rng):
        def group(prefix, key):
            wav = batch[f"{prefix}_wav"]
            b, n, l = wav.shape
            flat = add_reverb_noise(
                wav.reshape(b * n, l),
                batch[f"{prefix}_rir"].reshape(b * n, -1),
                batch[f"{prefix}_noise"].reshape(b * n, l),
                batch[f"{prefix}_aug_type"].reshape(-1),
                batch[f"{prefix}_snr"].reshape(-1),
            )
            feats, _ = wav_to_features(flat, fcfg, rng=key, train=True)
            return feats.reshape(b, n, feats.shape[1], feats.shape[2])

        k1, k2 = jax.random.split(rng)
        return group("global", k1), group("local", k2)

    # ---- schedules + optimizer (reference train_dino.py:162-204)
    base_lr = config.get("scheduler_args", {}).get("base_lr", 0.2)
    final_lr = config.get("scheduler_args", {}).get("final_lr", 1e-5)
    warmup_epochs = config.get("scheduler_args", {}).get("warmup_epochs", 10)
    lr_schedule = cosine_schedule(
        base_lr * batch_size / 256.0, final_lr, total,
        warmup_steps=warmup_epochs * epoch_iter,
    )
    wd_schedule = cosine_schedule(
        dino_args.get("weight_decay", 1e-4),
        dino_args.get("weight_decay_end", 1e-4), total,
    )
    momentum_schedule = cosine_schedule(
        dino_args.get("momentum_teacher", 0.996), 1.0, total
    )
    t_temp_schedule = cosine_schedule(
        dino_args.get("warmup_teacher_temp", 0.04),
        dino_args.get("teacher_temp", 0.07),
        int(total * dino_args.get("warmup_teacher_temp_epochs_ratio", 0.2)),
    )
    opt_name = config.get("optimizer", "SGD").upper()
    trace_decay = None
    if opt_name == "SGD":
        tx = optax.trace(decay=0.9)
        trace_decay = 0.9  # enables the fused update+EMA path (ssl/dino.py)
    elif opt_name == "ADAMW":
        tx = optax.scale_by_adam()
    elif opt_name == "LARS":
        # optax.lars includes lr; use unit lr so the in-graph schedule rules
        tx = optax.lars(learning_rate=1.0)
    else:
        raise ValueError(opt_name)

    step = make_dino_train_step(
        net, tx,
        lr_schedule=lr_schedule,
        wd_schedule=wd_schedule,
        momentum_schedule=momentum_schedule,
        teacher_temp_schedule=t_temp_schedule,
        n_global=n_global,
        n_local=n_local,
        student_temp=dino_args.get("student_temp", 0.1),
        center_momentum=dino_args.get("center_momentum", 0.9),
        clip_grad=dino_args.get("clip_grad", 3.0),
        freeze_last_layer_steps=dino_args.get("freeze_last_layer_epochs", 1)
        * epoch_iter,
        preprocess_fn=preprocess,
        mesh=mesh,
        trace_decay=trace_decay,
        # the reference DINO executor runs under autocast when
        # enable_amp (ssl/utils/dino_executor.py:71); same policy as
        # bin/train: explicit opt-in, accelerator-only
        compute_dtype=(
            jnp.bfloat16
            if config.get("enable_amp", False)
            and jax.default_backend() not in ("cpu",)
            else None
        ),
    )

    dump_config(config, os.path.join(exp_dir, "config.yaml"))
    state = None
    rng = jax.random.key(config.get("seed", 42))
    for epoch in range(num_epochs):
        pipe.set_epoch(epoch)
        t0, it = time.time(), 0
        for batch in pipe:
            batch = {k: jnp.asarray(v) for k, v in batch.items()}
            if state is None:
                g, _ = preprocess(batch, jax.random.key(0))
                crops_ex = g.reshape((-1,) + g.shape[2:])
                state = create_dino_state(
                    net, tx, jax.random.key(0), crops_ex, out_dim
                )
                state = shard_tree(state, mesh, head_path="__none__")
            state, metrics = step(state, shard_batch(batch, mesh), rng)
            it += 1
            if it % config.get("log_batch_interval", 100) == 0:
                logger.info(
                    "epoch %d iter %d loss %.4f lr %.5f m %.5f",
                    epoch, it, float(metrics["loss"]),
                    float(metrics["lr"]), float(metrics["teacher_momentum"]),
                )
            if it >= epoch_iter:
                break
        logger.info("epoch %d: %d iters in %.1fs", epoch, it, time.time() - t0)
        if (epoch + 1) % config.get("save_epoch_interval", 5) == 0:
            # save the TEACHER backbone — it's what gets evaluated
            # (reference ssl/bin/average_dino_model.py unwraps s_model)
            save_checkpoint(
                os.path.join(exp_dir, "models", f"model_{epoch + 1}.ckpt"),
                {
                    "params": {"backbone": state.teacher_params["backbone"]},
                    "batch_stats": {
                        "backbone": state.teacher_batch_stats.get("backbone", {})
                    },
                },
                meta={"epoch": epoch + 1},
            )
    return state


def main():
    import argparse

    p = argparse.ArgumentParser()
    p.add_argument("--config", required=True)
    p.add_argument("overrides", nargs="*")
    args = p.parse_args()
    cfg = parse_config_or_kwargs(args.config, overrides=args.overrides)
    train_dino(cfg)


if __name__ == "__main__":
    main()
