"""MoCo/SimCLR contrastive SSL training entry point (reference
ssl/bin/train_contrastive.py rebuilt).  Uses the SSLPipeline in two-view
mode: the first global chunk is the query, the second the key."""

from __future__ import annotations

import logging
import os
import time

import jax
import jax.numpy as jnp
import optax

from ..data import AugStore, load_data_list
from ..models import get_speaker_model
from ..models.registry import embedding_from_outputs
from ..ops.augment import add_reverb_noise
from ..ops.fbank import FbankConfig
from ..ops.pipeline import FeaturePipelineConfig, wav_to_features
from ..ssl import SSLPipeline, create_moco_state, make_moco_train_step
from ..ssl.contrastive import make_simclr_train_step
from ..utils.checkpoint import save_checkpoint
from ..utils.config import dump_config, parse_config_or_kwargs

__all__ = ["train_contrastive"]

import flax.linen as nn
import flax.struct


class _Encoder(nn.Module):
    backbone: nn.Module

    def __call__(self, feats, train: bool = False):
        return embedding_from_outputs(self.backbone(feats, train=train))


class _SimCLRState(flax.struct.PyTreeNode):
    step: jax.Array
    params: object
    batch_stats: object
    opt_state: object


def train_contrastive(config, **overrides):
    if isinstance(config, str):
        config = parse_config_or_kwargs(config, **overrides)
    else:
        config = {**config, **overrides}

    method = config.get("ssl_method", "moco")  # 'moco' | 'simclr'
    exp_dir = config.get("exp_dir", f"exp/{method}")
    os.makedirs(os.path.join(exp_dir, "models"), exist_ok=True)
    logging.basicConfig(level=logging.INFO)
    logger = logging.getLogger("train_contrastive")

    dataset_args = config.get("dataset_args", {})
    batch_size = config.get("dataloader_args", {}).get("batch_size", 64)
    num_epochs = config.get("num_epochs", 100)
    epoch_iter = config.get("epoch_iter", 1000)

    model_args = dict(config.get("model_args", {}))
    backbone = get_speaker_model(config["model"])(**model_args)
    net = _Encoder(backbone=backbone)
    embed_dim = model_args.get("embed_dim", 256)

    reverb_store = noise_store = None
    if dataset_args.get("reverb_data"):
        reverb_store = AugStore(root=dataset_args["reverb_data"])
    if dataset_args.get("noise_data"):
        noise_store = AugStore(root=dataset_args["noise_data"])
    pipe = SSLPipeline(
        load_data_list(config["train_data"]),
        data_type=config.get("data_type", "raw"),
        global_frames=dataset_args.get("chunk_len", 200),
        global_num=2,           # query + key views
        local_num=0,
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

    def views_to_feats(batch, rng):
        wav = batch["global_wav"]  # (B, 2, L)
        b, n, l = wav.shape
        flat = add_reverb_noise(
            wav.reshape(b * n, l),
            batch["global_rir"].reshape(b * n, -1),
            batch["global_noise"].reshape(b * n, l),
            batch["global_aug_type"].reshape(-1),
            batch["global_snr"].reshape(-1),
        )
        feats, _ = wav_to_features(flat, fcfg, rng=rng, train=True)
        feats = feats.reshape(b, n, feats.shape[1], feats.shape[2])
        return {"query_feat": feats[:, 0], "key_feat": feats[:, 1]}

    lr = config.get("scheduler_args", {}).get("initial_lr", 0.05)
    opt_args = config.get("optimizer_args", {})
    tx = optax.sgd(
        lr, momentum=opt_args.get("momentum", 0.9),
        nesterov=opt_args.get("nesterov", False),
    )

    feats_ex = jnp.zeros(
        (batch_size, dataset_args.get("chunk_len", 200),
         fb.get("num_mel_bins", 80))
    )
    # reference enable_amp role (accelerator-only, explicit opt-in)
    compute_dtype = (
        jnp.bfloat16
        if config.get("enable_amp", False)
        and jax.default_backend() not in ("cpu",)
        else None
    )
    if method == "moco":
        state = create_moco_state(
            net, tx, jax.random.key(0), feats_ex, embed_dim,
            K=config.get("moco_args", {}).get("K", 65536),
        )
        step = make_moco_train_step(
            net, tx,
            m=config.get("moco_args", {}).get("m", 0.999),
            T=config.get("moco_args", {}).get("T", 0.07),
            compute_dtype=compute_dtype,
        )
        param_key = "params_q"
    else:
        variables = net.init(jax.random.key(0), feats_ex, train=True)
        state = _SimCLRState(
            step=jnp.zeros((), jnp.int32),
            params=variables["params"],
            batch_stats=variables.get("batch_stats", {}),
            opt_state=tx.init(variables["params"]),
        )
        step = make_simclr_train_step(
            net, tx, T=config.get("simclr_args", {}).get("T", 0.07),
            compute_dtype=compute_dtype,
        )
        param_key = "params"

    dump_config(config, os.path.join(exp_dir, "config.yaml"))
    rng = jax.random.key(config.get("seed", 42))
    for epoch in range(num_epochs):
        pipe.set_epoch(epoch)
        t0, it = time.time(), 0
        for batch in pipe:
            batch = {k: jnp.asarray(v) for k, v in batch.items()}
            fbatch = views_to_feats(batch, jax.random.fold_in(rng, it))
            state, metrics = step(state, fbatch, rng)
            it += 1
            if it % config.get("log_batch_interval", 100) == 0:
                logger.info(
                    "epoch %d iter %d loss %.4f acc %.4f",
                    epoch, it, float(metrics["loss"]), float(metrics["acc"]),
                )
            if it >= epoch_iter:
                break
        logger.info("epoch %d: %d iters in %.1fs", epoch, it, time.time() - t0)
        if (epoch + 1) % config.get("save_epoch_interval", 5) == 0:
            params = getattr(state, param_key)
            stats = getattr(
                state, "batch_stats_q", getattr(state, "batch_stats", {})
            )
            save_checkpoint(
                os.path.join(exp_dir, "models", f"model_{epoch + 1}.ckpt"),
                {"params": params, "batch_stats": stats},
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
    train_contrastive(cfg)


if __name__ == "__main__":
    main()
