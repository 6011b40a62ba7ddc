#!/usr/bin/env python
"""CN-Celeb supervised recipe driver (reference examples/cnceleb/v2/run.sh:
stage 1 prepare -> 2 lists -> 3 train -> 4 avg+extract -> 5 cosine score ->
6 AS-Norm with the cnceleb_train cohort -> 7 score calibration -> 8 export
-> 9 large-margin fine-tune, which re-enters stages 3-8 with the lm
config (run.sh:167 --stage 3 --stop_stage 8)).

Data layout under --data_root (produced offline by the reference's
local/prepare_data.sh + combine_utt.sh enrollment concatenation):
  cnceleb_train/{wav.scp,utt2spk}   training data (CN-Celeb1 dev + CN-Celeb2)
  eval/{wav.scp,utt2spk}            eval utterances incl. combined enrolls
  eval/trials/CNC-Eval-*.lst        trial lists
  musan/wav.scp rirs/wav.scp        augmentation sources
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
from wespeaker_hubert_tpu.bin.tools import (
    build_aug_store,
    make_raw_list,
    make_shard_list,
    vector_mean,
    wav2dur,
)
from wespeaker_hubert_tpu.bin.train import train
from wespeaker_hubert_tpu.utils.config import load_config


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--stage", type=int, default=3)
    p.add_argument("--stop_stage", type=int, default=6)
    p.add_argument("--config", default="conf/resnet34.yaml")
    p.add_argument("--data_root", default="data")
    p.add_argument(
        "--trials", nargs="+",
        default=["CNC-Eval-Concat.lst", "CNC-Eval-Avg.lst"],
        help="trial files under data_root/eval/trials",
    )
    p.add_argument("--asnorm_top_n", type=int, default=300)
    p.add_argument("--calibration_trial_num", type=int, default=20000,
                   help="trial pairs for QMF training (reference "
                        "local/score_calibration.sh each_trial_num)")
    p.add_argument("--lm_config", default=None,
                   help="large-margin fine-tune config for stage 9 "
                        "(reference run.sh lm_config re-entry)")
    args = p.parse_args()

    config = load_config(args.config)
    if args.stage <= 9 <= args.stop_stage:
        # fail BEFORE hours of stages 1-8, not at the stage-9 boundary
        if not args.lm_config:
            p.error("--lm_config is required when stage 9 is in range")
        lm = load_config(args.lm_config)
        if lm.get("exp_dir") == config.get("exp_dir"):
            p.error("lm_config exp_dir must differ from the base exp_dir: "
                    "train() would resume the base run's checkpoints "
                    "instead of fine-tuning from model_init")
    run_stages(args, config, args.stage, args.stop_stage)


def run_stages(args, config, stage, stop_stage):
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
        return stage <= s <= stop_stage

    if in_range(1):
        print("stage 1: build aug stores (MUSAN + RIRs)")
        build_aug_store(
            os.path.join(args.data_root, "musan/wav.scp"),
            os.path.join(args.data_root, "musan_aug_store"),
        )
        build_aug_store(
            os.path.join(args.data_root, "rirs/wav.scp"),
            os.path.join(args.data_root, "rirs_aug_store"),
        )

    if in_range(2):
        print("stage 2: data lists")
        for dset in ("cnceleb_train", "eval"):
            d = os.path.join(args.data_root, dset)
            if (
                config.get("data_type", "shard") == "shard"
                and dset == "cnceleb_train"
            ):
                make_shard_list(
                    os.path.join(d, "wav.scp"),
                    os.path.join(d, "utt2spk"),
                    os.path.join(d, "shards"),
                    os.path.join(d, "shard.list"),
                )
            make_raw_list(
                os.path.join(d, "wav.scp"),
                os.path.join(d, "utt2spk"),
                os.path.join(d, "raw.list"),
            )

    if in_range(3):
        print("stage 3: train")
        train(config)

    if in_range(4):
        print("stage 4: average + extract")
        average_model(models_dir, avg_ckpt, num=config.get("num_avg", 10))
        for name in ("eval", "cnceleb_train"):
            extract(
                config,
                os.path.join(args.data_root, name, "raw.list"),
                avg_ckpt,
                os.path.join(emb_dir, f"{name}.npz"),
            )

    if in_range(5):
        print("stage 5: cosine score + metrics (train-mean subtracted)")
        import numpy as np

        from wespeaker_hubert_tpu.utils.embeddings import load_embeddings

        _, cohort_emb = load_embeddings(
            os.path.join(emb_dir, "cnceleb_train.npz")
        )
        mean_vec_path = os.path.join(emb_dir, "cnceleb_train_mean.npy")
        np.save(mean_vec_path, cohort_emb.mean(0))
        files = score_trials(
            os.path.join(emb_dir, "eval.npz"), trial_paths, score_dir,
            mean_vec_path,
        )
        for f in files:
            eer, mindcf = compute_metrics(f)
            print(f"{os.path.basename(f)}: EER {eer:.3f}% minDCF {mindcf:.4f}")

    if in_range(6):
        print("stage 6: AS-Norm (cnceleb_train cohort)")
        cohort_path = os.path.join(emb_dir, "cnceleb_train_spk_mean.npz")
        vector_mean(
            os.path.join(emb_dir, "cnceleb_train.npz"),
            os.path.join(args.data_root, "cnceleb_train", "utt2spk"),
            cohort_path,
        )
        for trial in trial_paths:
            base = os.path.join(
                score_dir, os.path.basename(trial) + ".score"
            )
            normed = score_norm(
                base, base + ".asnorm",
                os.path.join(emb_dir, "eval.npz"), cohort_path,
                method="asnorm", top_n=args.asnorm_top_n,
                mean_vec_path=os.path.join(
                    emb_dir, "cnceleb_train_mean.npy"
                ),
            )
            eer, mindcf = compute_metrics(normed)
            print(
                f"{os.path.basename(normed)}: "
                f"EER {eer:.3f}% minDCF {mindcf:.4f}"
            )

    if in_range(7):
        print("stage 7: score calibration (QMF)")
        from wespeaker_hubert_tpu.backend.calibration import (
            apply_calibration,
            gather_factors,
        )

        # Train the calibrator on trials generated from cnceleb_train
        # (reference local/score_calibration.sh stage 1 +
        # tools/generate_calibration_trial.py) — never on the eval
        # trials, which would leak eval labels into QMF.
        from wespeaker_hubert_tpu.bin.score_calibration import (
            train_calibration_on_train_set,
        )

        params, cal_loss, n_cal = train_calibration_on_train_set(
            os.path.join(args.data_root, "cnceleb_train"),
            os.path.join(emb_dir, "cnceleb_train.npz"),
            os.path.join(emb_dir, "cnceleb_train_spk_mean.npz"),
            os.path.join(emb_dir, "cnceleb_train_mean.npy"),
            exp_dir, score_dir,
            top_n=args.asnorm_top_n,
            each_trial_num=args.calibration_trial_num,
        )
        print(f"  calibration trained on {n_cal} trials "
              f"(Cllr {cal_loss:.4f})")

        dur_path = os.path.join(args.data_root, "eval", "utt2dur")
        if not os.path.exists(dur_path):
            wav2dur(os.path.join(args.data_root, "eval", "wav.scp"), dur_path)
        durations = {
            u: float(d) for u, d in (ln.split() for ln in open(dur_path))
        }
        for trial in trial_paths:
            normed = os.path.join(
                score_dir, os.path.basename(trial) + ".score.asnorm"
            )
            lines = list(open(normed))
            factors, meta = gather_factors(lines, durations)
            calibrated = apply_calibration(params, factors)
            out = normed + ".qmf"
            with open(out, "w") as f:
                for (e, t, lab), s in zip(meta, calibrated):
                    f.write(f"{e} {t} {s:.5f} {lab}\n")
            eer, mindcf = compute_metrics(out)
            print(
                f"{os.path.basename(out)}: "
                f"EER {eer:.3f}% minDCF {mindcf:.4f}"
            )

    if in_range(8):
        print("stage 8: export model bundle")
        # reference run.sh stage 8 exports TorchScript; here the
        # deployable is a model dir + portable StableHLO graph
        from wespeaker_hubert_tpu.bin.export_model import (
            export_model,
            export_stablehlo,
        )

        mean_vec = os.path.join(emb_dir, "cnceleb_train_mean.npy")
        out_dir = export_model(
            exp_dir, os.path.join(exp_dir, "exported"),
            checkpoint=avg_ckpt,
            mean_vec=mean_vec if os.path.exists(mean_vec) else None,
        )
        hlo = export_stablehlo(
            load_config(os.path.join(out_dir, "config.yaml")),
            avg_ckpt, os.path.join(out_dir, "model.stablehlo"),
        )
        print(f"  exported {out_dir} (+ {os.path.basename(hlo)})")

    if in_range(9):
        print("stage 9: large-margin fine-tune (re-entering stages 3-8)")
        # reference run.sh:161-178: re-enter the pipeline with the lm
        # config, initialized from the averaged base model (validated
        # up front in main())
        lm_config = load_config(args.lm_config)
        lm_config["model_init"] = avg_ckpt
        run_stages(args, lm_config, 3, min(stop_stage, 8))


if __name__ == "__main__":
    main()
