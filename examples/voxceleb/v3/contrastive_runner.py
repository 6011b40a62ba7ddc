#!/usr/bin/env python
"""Shared staged driver for the MoCo / SimCLR self-supervised recipes
(reference examples/voxceleb/v3/{moco,simclr}/run.sh — identical pipelines
differing only in the contrastive method: stage 2 lists -> 3
train_contrastive -> 4 average + extract with the encoder backbone ->
5 cosine score + metrics -> 6 AS-Norm).  SSL training uses no labels;
scoring uses the vox1 trial lists like the supervised v2 recipe."""

import argparse
import os

from wespeaker_hubert_tpu.bin.average_model import average_model
from wespeaker_hubert_tpu.bin.extract import extract
from wespeaker_hubert_tpu.bin.score import (
    compute_metrics,
    score_norm,
    score_trials,
)
from wespeaker_hubert_tpu.bin.tools import make_raw_list, vector_mean
from wespeaker_hubert_tpu.bin.train_contrastive import train_contrastive
from wespeaker_hubert_tpu.utils.config import load_config


def run(method: str, default_config: str):
    p = argparse.ArgumentParser()
    p.add_argument("--stage", type=int, default=3)
    p.add_argument("--stop_stage", type=int, default=6)
    p.add_argument("--config", default=default_config)
    p.add_argument("--data_root", default="data")
    p.add_argument("--trials", nargs="+", default=[])
    p.add_argument("--asnorm_top_n", type=int, default=300)
    args = p.parse_args()

    config = load_config(args.config)
    config.setdefault("ssl_method", method)
    assert config["ssl_method"] == method, (config["ssl_method"], method)
    exp_dir = config["exp_dir"]
    models_dir = os.path.join(exp_dir, "models")
    avg_ckpt = os.path.join(exp_dir, "avg_model.ckpt")
    emb_dir = os.path.join(exp_dir, "embeddings")
    score_dir = os.path.join(exp_dir, "scores")

    def in_range(s):
        return args.stage <= s <= args.stop_stage

    if in_range(2):
        print("stage 2: data lists (no labels needed for SSL)")
        for dset in ("vox2_dev", "vox1"):
            d = os.path.join(args.data_root, dset)
            make_raw_list(
                os.path.join(d, "wav.scp"),
                os.path.join(d, "utt2spk"),
                os.path.join(d, "raw.list"),
            )

    if in_range(3):
        print(f"stage 3: {method} self-supervised training")
        train_contrastive(config)

    if in_range(4):
        print("stage 4: average + extract (encoder backbone)")
        average_model(models_dir, avg_ckpt, num=config.get("num_avg", 10))
        for name in ("vox1", "vox2_dev"):
            extract(
                config,
                os.path.join(args.data_root, name, "raw.list"),
                avg_ckpt,
                os.path.join(emb_dir, f"{name}.npz"),
            )

    if in_range(5):
        print("stage 5: cosine score + metrics")
        import numpy as np

        from wespeaker_hubert_tpu.utils.embeddings import load_embeddings

        _, cohort_emb = load_embeddings(os.path.join(emb_dir, "vox2_dev.npz"))
        mean_vec_path = os.path.join(emb_dir, "vox2_dev_mean.npy")
        np.save(mean_vec_path, cohort_emb.mean(0))
        for f in score_trials(
            os.path.join(emb_dir, "vox1.npz"), args.trials, score_dir,
            mean_vec_path,
        ):
            eer, mindcf = compute_metrics(f)
            print(f"{os.path.basename(f)}: EER {eer:.3f}% minDCF {mindcf:.4f}")

    if in_range(6):
        print("stage 6: AS-Norm")
        cohort_path = os.path.join(emb_dir, "vox2_dev_spk_mean.npz")
        vector_mean(
            os.path.join(emb_dir, "vox2_dev.npz"),
            os.path.join(args.data_root, "vox2_dev", "utt2spk"),
            cohort_path,
        )
        for trial in args.trials:
            base = os.path.join(score_dir, os.path.basename(trial) + ".score")
            normed = score_norm(
                base, base + ".asnorm",
                os.path.join(emb_dir, "vox1.npz"), cohort_path,
                method="asnorm", top_n=args.asnorm_top_n,
                mean_vec_path=os.path.join(emb_dir, "vox2_dev_mean.npy"),
            )
            eer, mindcf = compute_metrics(normed)
            print(
                f"{os.path.basename(normed)}: "
                f"EER {eer:.3f}% minDCF {mindcf:.4f}"
            )
