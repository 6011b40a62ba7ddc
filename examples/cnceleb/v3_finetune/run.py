#!/usr/bin/env python
"""CN-Celeb v3 fine-tune driver: DINO self-supervised pretraining followed
by supervised ArcMargin fine-tuning (reference examples/cnceleb/
v3_finetune/run.sh + README.md:1-17 — an averaged DINO teacher backbone
initializes the supervised run via model_init, then the standard
avg/extract/score/AS-Norm chain).

Usage:
  # stage 0 (optional): DINO pretrain here, or point --model_init at an
  # averaged checkpoint from examples/voxceleb/v3/dino
  python run.py --stage 3 --stop_stage 6 --config conf/ecapa_tdnn_ft.yaml \
      --model_init exp/dino/avg_model.ckpt --data_root data
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "../../.."))

from wespeaker_hubert_tpu.bin.average_model import average_model
from wespeaker_hubert_tpu.bin.extract import extract
from wespeaker_hubert_tpu.bin.score import (
    compute_metrics,
    score_norm,
    score_trials,
)
from wespeaker_hubert_tpu.bin.tools import make_raw_list, vector_mean
from wespeaker_hubert_tpu.bin.train import train
from wespeaker_hubert_tpu.utils.config import load_config


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--stage", type=int, default=3)
    p.add_argument("--stop_stage", type=int, default=6)
    p.add_argument("--config", default="conf/ecapa_tdnn_ft.yaml")
    p.add_argument("--model_init", required=False, default=None,
                   help="averaged DINO teacher checkpoint (pretraining)")
    p.add_argument("--data_root", default="data")
    p.add_argument(
        "--trials", nargs="+",
        default=["CNC-Eval-Concat.lst", "CNC-Eval-Avg.lst"],
    )
    p.add_argument("--asnorm_top_n", type=int, default=300)
    args = p.parse_args()

    config = load_config(args.config)
    if args.model_init:
        # partial load: DINO checkpoints carry only the backbone subtree,
        # the ArcMargin head initializes fresh (bin/train load_partial)
        config["model_init"] = args.model_init
    exp_dir = config["exp_dir"]
    models_dir = os.path.join(exp_dir, "models")
    avg_ckpt = os.path.join(exp_dir, "avg_model.ckpt")
    emb_dir = os.path.join(exp_dir, "embeddings")
    score_dir = os.path.join(exp_dir, "scores")
    trial_paths = [
        t if os.path.exists(t)
        else os.path.join(args.data_root, "eval", "trials", t)
        for t in args.trials
    ]

    def in_range(s):
        return args.stage <= s <= args.stop_stage

    if in_range(2):
        print("stage 2: data lists")
        for dset in ("cnceleb_train", "eval"):
            d = os.path.join(args.data_root, dset)
            make_raw_list(
                os.path.join(d, "wav.scp"),
                os.path.join(d, "utt2spk"),
                os.path.join(d, "raw.list"),
            )

    if in_range(3):
        print("stage 3: supervised fine-tune from the DINO initialization")
        train(config)

    if in_range(4):
        print("stage 4: average + extract")
        average_model(models_dir, avg_ckpt, num=config.get("num_avg", 3))
        for name in ("eval", "cnceleb_train"):
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

        _, cohort_emb = load_embeddings(
            os.path.join(emb_dir, "cnceleb_train.npz")
        )
        mean_vec_path = os.path.join(emb_dir, "cnceleb_train_mean.npy")
        np.save(mean_vec_path, cohort_emb.mean(0))
        for f in score_trials(
            os.path.join(emb_dir, "eval.npz"), trial_paths, score_dir,
            mean_vec_path,
        ):
            eer, mindcf = compute_metrics(f)
            print(f"{os.path.basename(f)}: EER {eer:.3f}% minDCF {mindcf:.4f}")

    if in_range(6):
        print("stage 6: AS-Norm")
        cohort_path = os.path.join(emb_dir, "cnceleb_train_spk_mean.npz")
        vector_mean(
            os.path.join(emb_dir, "cnceleb_train.npz"),
            os.path.join(args.data_root, "cnceleb_train", "utt2spk"),
            cohort_path,
        )
        for trial in trial_paths:
            base = os.path.join(score_dir, os.path.basename(trial) + ".score")
            normed = score_norm(
                base, base + ".asnorm",
                os.path.join(emb_dir, "eval.npz"), cohort_path,
                method="asnorm", top_n=args.asnorm_top_n,
                mean_vec_path=os.path.join(emb_dir, "cnceleb_train_mean.npy"),
            )
            eer, mindcf = compute_metrics(normed)
            print(
                f"{os.path.basename(normed)}: "
                f"EER {eer:.3f}% minDCF {mindcf:.4f}"
            )


if __name__ == "__main__":
    main()
