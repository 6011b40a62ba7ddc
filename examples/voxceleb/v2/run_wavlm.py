#!/usr/bin/env python
"""WavLM-frontend staged recipe (reference examples/voxceleb/v2/
run_wavlm.sh:125-160): frozen frontend -> joint fine-tune -> joint
large-margin fine-tune, each stage re-entering training with model_init
from the previous stage's averaged model."""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "../../.."))

from wespeaker_hubert_tpu.bin.average_model import average_model
from wespeaker_hubert_tpu.bin.train import train
from wespeaker_hubert_tpu.utils.config import load_config


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--config", default="conf/ecapa_tdnn_wavlm_frozen.yaml")
    p.add_argument("--stage", type=int, default=1)
    p.add_argument("--stop_stage", type=int, default=3)
    args = p.parse_args()
    base = load_config(args.config)

    def stage_dir(tag):
        return base["exp_dir"] + "-" + tag

    if args.stage <= 1 <= args.stop_stage:
        print("stage 1: frozen-frontend training")
        cfg = dict(base)
        cfg["exp_dir"] = stage_dir("frozen")
        cfg["dataset_args"] = dict(base["dataset_args"])
        cfg["dataset_args"]["s3prl_args"] = {
            **base["dataset_args"]["s3prl_args"], "frozen": True,
        }
        train(cfg)
        average_model(
            os.path.join(cfg["exp_dir"], "models"),
            os.path.join(cfg["exp_dir"], "avg_model.ckpt"),
            num=base.get("num_avg", 3),
        )

    if args.stage <= 2 <= args.stop_stage:
        print("stage 2: joint fine-tune (frontend unfrozen, low LR)")
        cfg = dict(base)
        cfg["exp_dir"] = stage_dir("joint")
        cfg["model_init"] = os.path.join(stage_dir("frozen"), "avg_model.ckpt")
        cfg["dataset_args"] = dict(base["dataset_args"])
        cfg["dataset_args"]["s3prl_args"] = {
            **base["dataset_args"]["s3prl_args"], "frozen": False,
        }
        cfg["scheduler_args"] = {
            **base.get("scheduler_args", {}), "initial_lr": 1e-4,
        }
        cfg["num_epochs"] = base.get("joint_epochs", 10)
        train(cfg)
        average_model(
            os.path.join(cfg["exp_dir"], "models"),
            os.path.join(cfg["exp_dir"], "avg_model.ckpt"),
            num=2,
        )

    if args.stage <= 3 <= args.stop_stage:
        print("stage 3: joint large-margin fine-tune")
        cfg = dict(base)
        cfg["exp_dir"] = stage_dir("joint-lmft")
        cfg["model_init"] = os.path.join(stage_dir("joint"), "avg_model.ckpt")
        cfg["dataset_args"] = dict(base["dataset_args"])
        cfg["dataset_args"]["s3prl_args"] = {
            **base["dataset_args"]["s3prl_args"], "frozen": False,
        }
        cfg["dataset_args"]["num_frms"] = 600
        cfg["dataset_args"]["speed_perturb"] = False
        cfg["margin_update"] = {
            "initial_margin": 0.5, "final_margin": 0.5,
            "increase_start_epoch": 1, "fix_start_epoch": 1,
        }
        cfg["projection_args"] = {
            **base.get("projection_args", {}), "do_lm": True,
        }
        cfg["scheduler_args"] = {
            **base.get("scheduler_args", {}), "initial_lr": 2e-5,
        }
        cfg["num_epochs"] = base.get("lmft_epochs", 3)
        train(cfg)
        average_model(
            os.path.join(cfg["exp_dir"], "models"),
            os.path.join(cfg["exp_dir"], "avg_model.ckpt"),
            num=1,
        )


if __name__ == "__main__":
    main()
