#!/usr/bin/env python
"""Whisper-PMFA recipe driver (reference examples/voxceleb/v1/
Whisper-PMFA/run.sh): two-stage training — stage 3 trains the PMFA head
on a FROZEN whisper large-v2 encoder (conf/whisper_pmfa_stage0.yaml,
4 epochs), stage 4 unfreezes and trains jointly at a smaller batch
(conf/whisper_pmfa_stage1.yaml, 8 epochs, resumed from stage 0's last
checkpoint) — then the standard extract / cosine / AS-Norm chain on vox1.

Whisper weights: convert the official large-v2.pt offline with
frontend.convert_whisper_state_dict and point
dataset_args.whisper_encoder_args.checkpoint at the .npz.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "../../../.."))

from wespeaker_hubert_tpu.bin.average_model import average_model
from wespeaker_hubert_tpu.bin.extract import extract
from wespeaker_hubert_tpu.bin.score import (
    compute_metrics,
    score_norm,
    score_trials,
)
from wespeaker_hubert_tpu.bin.tools import make_raw_list, vector_mean
from wespeaker_hubert_tpu.bin.train import train
from wespeaker_hubert_tpu.utils.checkpoint import latest_checkpoint
from wespeaker_hubert_tpu.utils.config import load_config


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--stage", type=int, default=3)
    p.add_argument("--stop_stage", type=int, default=7)
    p.add_argument("--stage0_config", default="conf/whisper_pmfa_stage0.yaml")
    p.add_argument("--stage1_config", default="conf/whisper_pmfa_stage1.yaml")
    p.add_argument("--data_root", default="data")
    p.add_argument("--trials", nargs="+", default=[])
    p.add_argument("--asnorm_top_n", type=int, default=300)
    args = p.parse_args()

    cfg1 = load_config(args.stage1_config)
    exp_dir = cfg1["exp_dir"]
    models_dir = os.path.join(exp_dir, "models")
    avg_ckpt = os.path.join(exp_dir, "avg_model.ckpt")
    emb_dir = os.path.join(exp_dir, "embeddings")
    score_dir = os.path.join(exp_dir, "scores")

    def in_range(s):
        return args.stage <= s <= args.stop_stage

    if in_range(2):
        print("stage 2: data lists")
        for dset in ("vox1_dev", "vox1"):
            d = os.path.join(args.data_root, dset)
            make_raw_list(
                os.path.join(d, "wav.scp"),
                os.path.join(d, "utt2spk"),
                os.path.join(d, "raw.list"),
            )

    if in_range(3):
        print("stage 3: PMFA head training, whisper encoder FROZEN")
        train(load_config(args.stage0_config))

    if in_range(4):
        print("stage 4: joint fine-tune, whisper encoder unfrozen")
        cfg0 = load_config(args.stage0_config)
        init = latest_checkpoint(os.path.join(cfg0["exp_dir"], "models"))
        assert init, f"no stage-0 checkpoint under {cfg0['exp_dir']}"
        cfg = dict(cfg1)
        cfg["model_init"] = init
        train(cfg)

    if in_range(5):
        print("stage 5: average + extract")
        average_model(models_dir, avg_ckpt, num=cfg1.get("num_avg", 1))
        for name in ("vox1", "vox1_dev"):
            extract(
                cfg1,
                os.path.join(args.data_root, name, "raw.list"),
                avg_ckpt,
                os.path.join(emb_dir, f"{name}.npz"),
            )

    if in_range(6):
        print("stage 6: cosine score (sub mean of vox1_dev) + metrics")
        import numpy as np

        from wespeaker_hubert_tpu.utils.embeddings import load_embeddings

        _, cohort_emb = load_embeddings(os.path.join(emb_dir, "vox1_dev.npz"))
        mean_vec_path = os.path.join(emb_dir, "vox1_dev_mean.npy")
        np.save(mean_vec_path, cohort_emb.mean(0))
        for f in score_trials(
            os.path.join(emb_dir, "vox1.npz"), args.trials, score_dir,
            mean_vec_path,
        ):
            eer, mindcf = compute_metrics(f)
            print(f"{os.path.basename(f)}: EER {eer:.3f}% minDCF {mindcf:.4f}")

    if in_range(7):
        print("stage 7: AS-Norm")
        cohort_path = os.path.join(emb_dir, "vox1_dev_spk_mean.npz")
        vector_mean(
            os.path.join(emb_dir, "vox1_dev.npz"),
            os.path.join(args.data_root, "vox1_dev", "utt2spk"),
            cohort_path,
        )
        for trial in args.trials:
            base = os.path.join(score_dir, os.path.basename(trial) + ".score")
            normed = score_norm(
                base, base + ".asnorm",
                os.path.join(emb_dir, "vox1.npz"), cohort_path,
                method="asnorm", top_n=args.asnorm_top_n,
                mean_vec_path=os.path.join(emb_dir, "vox1_dev_mean.npy"),
            )
            eer, mindcf = compute_metrics(normed)
            print(
                f"{os.path.basename(normed)}: "
                f"EER {eer:.3f}% minDCF {mindcf:.4f}"
            )


if __name__ == "__main__":
    main()
