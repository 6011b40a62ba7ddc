"""Recipe-driver integration: run examples/voxceleb/v2/run.py stages 2-7
on a synthetic kaldi-style corpus — data lists, training, averaging,
extraction, cosine scoring, AS-Norm, QMF calibration all through the
actual script."""

import os
import subprocess
import sys

import numpy as np
import pytest

from wespeaker_hubert_tpu.data import write_wav
from wespeaker_hubert_tpu.utils.config import dump_config

RUN_PY = os.path.join(
    os.path.dirname(__file__), "..", "examples", "voxceleb", "v2", "run.py"
)


def _spk_wav(rng, spk, n):
    t = np.arange(n) / 16000.0
    freqs = 380.0 + 140.0 * spk + 19.0 * np.arange(2)
    x = sum(np.sin(2 * np.pi * f * t + rng.uniform(0, 6.28)) for f in freqs)
    return (x / 2 * 0.3 + rng.standard_normal(n) * 0.01).clip(-1, 1).astype(
        np.float32
    )


@pytest.fixture(scope="module")
def data_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("recipe")
    rng = np.random.default_rng(0)

    for dset, spks, utts in (("vox2_dev", 3, 6), ("vox1", 3, 3)):
        d = root / dset
        d.mkdir()
        with open(d / "wav.scp", "w") as ws, open(d / "utt2spk", "w") as us:
            for s in range(spks):
                for u in range(utts):
                    key = f"{dset}-s{s}u{u}"
                    p = str(d / f"{key}.wav")
                    write_wav(
                        p, _spk_wav(rng, s, int(rng.integers(17000, 25000)))
                    )
                    ws.write(f"{key} {p}\n")
                    us.write(f"{key} s{s}\n")

    # trials over vox1
    keys = [f"vox1-s{s}u{u}" for s in range(3) for u in range(3)]
    with open(root / "trials.txt", "w") as f:
        for i, a in enumerate(keys):
            for b in keys[i + 1 :]:
                lab = (
                    "target"
                    if a.split("-")[1][:2] == b.split("-")[1][:2]
                    else "nontarget"
                )
                f.write(f"{a} {b} {lab}\n")
    return root


@pytest.mark.parametrize("data_type", ["raw", "shard"])
def test_recipe_stages_2_to_7(data_root, tmp_path, data_type):
    """Full v2 pipeline end to end for BOTH training list formats: raw
    JSONL and tar shards (shard mode also exercises make_shard_list and
    the native C++ tar loader through the real driver)."""
    exp_dir = str(tmp_path / "exp")
    config = {
        "exp_dir": exp_dir,
        "model": "ECAPA_TDNN_c512",
        "model_args": {"feat_dim": 40, "embed_dim": 16},
        "projection_args": {"project_type": "arc_margin", "scale": 32.0},
        "data_type": data_type,
        "train_data": str(data_root / "vox2_dev" / f"{data_type}.list"),
        "train_label": str(data_root / "vox2_dev" / "utt2spk"),
        "dataloader_args": {
            "batch_size": 8,
            # shard mode: drive the native C++ tar loader through the
            # real training path
            "num_workers": 2 if data_type == "shard" else 0,
        },
        "dataset_args": {
            "num_frms": 60, "speed_perturb": False, "aug_prob": 0.0,
            "fbank_args": {"num_mel_bins": 40, "dither": 1.0},
            "filter_args": {"min_num_frames": 30},
            "shuffle_args": {"shuffle_size": 16},
        },
        "num_epochs": 2,
        "epoch_iter": 2,
        "save_epoch_interval": 1,
        "num_avg": 2,
        "scheduler_args": {"initial_lr": 0.05, "final_lr": 0.01,
                           "warm_up_epoch": 1},
        "margin_update": {"initial_margin": 0.0, "final_margin": 0.1,
                          "increase_start_epoch": 1, "fix_start_epoch": 2},
    }
    cfg_path = str(tmp_path / "conf.yaml")
    dump_config(config, cfg_path)

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    proc = subprocess.run(
        [
            sys.executable, RUN_PY,
            "--stage", "2", "--stop_stage", "7",
            "--config", cfg_path,
            "--data_root", str(data_root),
            "--trials", str(data_root / "trials.txt"),
            "--asnorm_top_n", "4",
        ],
        capture_output=True, text=True, timeout=600, env=env,
        cwd=os.path.dirname(RUN_PY),
    )
    out = proc.stdout + proc.stderr
    assert proc.returncode == 0, out[-4000:]
    # every stage ran and produced its artifacts
    assert os.path.exists(str(data_root / "vox2_dev" / "raw.list"))
    assert os.path.exists(os.path.join(exp_dir, "avg_model.ckpt"))
    assert os.path.exists(os.path.join(exp_dir, "embeddings", "vox1.npz"))
    score = os.path.join(exp_dir, "scores", "trials.txt.score")
    assert os.path.exists(score)
    assert os.path.exists(score + ".asnorm")
    assert os.path.exists(score + ".asnorm.qmf")
    assert "EER" in out


def test_recipe_stages_8_9_export_and_lm(data_root, tmp_path):
    """Stages 8-9: export the model bundle (+StableHLO) and re-enter
    stages 3-7 with a large-margin config initialized from the averaged
    base model (reference run.sh:148-163 lm_config re-entry)."""
    exp_dir = str(tmp_path / "exp")
    lm_exp_dir = str(tmp_path / "exp_lm")
    base = {
        "exp_dir": exp_dir,
        "model": "ECAPA_TDNN_c512",
        "model_args": {"feat_dim": 40, "embed_dim": 16},
        "projection_args": {"project_type": "arc_margin", "scale": 32.0},
        "data_type": "raw",
        "train_data": str(data_root / "vox2_dev" / "raw.list"),
        "train_label": str(data_root / "vox2_dev" / "utt2spk"),
        "dataloader_args": {"batch_size": 8},
        "dataset_args": {
            "num_frms": 60, "speed_perturb": False, "aug_prob": 0.0,
            "fbank_args": {"num_mel_bins": 40, "dither": 1.0},
            "filter_args": {"min_num_frames": 30},
            "shuffle_args": {"shuffle_size": 16},
        },
        "num_epochs": 1,
        "epoch_iter": 1,
        "save_epoch_interval": 1,
        "num_avg": 1,
        "scheduler_args": {"initial_lr": 0.05, "final_lr": 0.01,
                           "warm_up_epoch": 1},
        "margin_update": {"initial_margin": 0.0, "final_margin": 0.1,
                          "increase_start_epoch": 1, "fix_start_epoch": 1},
    }
    # large-margin stage: fixed 0.5 margin, longer chunks, low LR,
    # do_lm (reference conf/*_lm.yaml)
    lm = dict(
        base,
        exp_dir=lm_exp_dir,
        projection_args={"project_type": "arc_margin", "scale": 32.0,
                         "do_lm": True},
        dataset_args=dict(base["dataset_args"], num_frms=80),
        margin_update={"initial_margin": 0.5, "final_margin": 0.5,
                       "increase_start_epoch": 1, "fix_start_epoch": 1},
        scheduler_args={"initial_lr": 0.001, "final_lr": 0.0005,
                        "warm_up_epoch": 1},
    )
    cfg_path = str(tmp_path / "conf.yaml")
    lm_cfg_path = str(tmp_path / "conf_lm.yaml")
    dump_config(base, cfg_path)
    dump_config(lm, lm_cfg_path)

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    proc = subprocess.run(
        [
            sys.executable, RUN_PY,
            "--stage", "2", "--stop_stage", "9",
            "--config", cfg_path,
            "--lm_config", lm_cfg_path,
            "--data_root", str(data_root),
            "--trials", str(data_root / "trials.txt"),
            "--asnorm_top_n", "4",
        ],
        capture_output=True, text=True, timeout=900, env=env,
        cwd=os.path.dirname(RUN_PY),
    )
    out = proc.stdout + proc.stderr
    assert proc.returncode == 0, out[-4000:]
    # stage 8: deployable bundle + StableHLO graph
    exported = os.path.join(exp_dir, "exported")
    assert os.path.exists(os.path.join(exported, "config.yaml"))
    assert os.path.exists(os.path.join(exported, "avg_model.ckpt"))
    assert os.path.exists(os.path.join(exported, "model.stablehlo"))
    # stage 9: the lm re-entry trained from the base avg model and ran
    # its own extract/score/AS-Norm/QMF chain
    assert os.path.exists(os.path.join(lm_exp_dir, "avg_model.ckpt"))
    lm_score = os.path.join(lm_exp_dir, "scores", "trials.txt.score")
    assert os.path.exists(lm_score + ".asnorm.qmf")
    assert "stage 9" in out


if __name__ == "__main__":
    pytest.main([__file__, "-x", "-q"])
