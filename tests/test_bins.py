"""Recipe-level workflow test: the bin drivers chained end to end —
train -> checkpoint -> average -> extract -> cosine score -> AS-Norm ->
metrics (the reference's run.sh stages 3-6 as Python)."""

import json
import os

import numpy as np
import pytest

from wespeaker_hubert_tpu.bin.average_model import average_model
from wespeaker_hubert_tpu.bin.extract import extract
from wespeaker_hubert_tpu.bin.score import (
    compute_metrics,
    score_norm,
    score_trials,
)
from wespeaker_hubert_tpu.bin.train import train
from wespeaker_hubert_tpu.data import write_wav
from wespeaker_hubert_tpu.utils.embeddings import load_embeddings

N_SPK = 4


def _spk_wav(rng, spk, n):
    t = np.arange(n) / 16000.0
    freqs = 350.0 + 130.0 * spk + 17.0 * np.arange(2) * (spk + 1)
    x = sum(np.sin(2 * np.pi * f * t + rng.uniform(0, 6.28)) for f in freqs)
    return (x / 2 * 0.3 + rng.standard_normal(n) * 0.01).clip(-1, 1).astype(
        np.float32
    )


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    root = tmp_path_factory.mktemp("bins")
    rng = np.random.default_rng(0)
    train_entries, eval_entries, labels = [], [], []
    for spk in range(N_SPK):
        for u in range(8):
            n = int(rng.integers(17000, 25000))
            key = f"s{spk}u{u}"
            path = str(root / f"{key}.wav")
            write_wav(path, _spk_wav(rng, spk, n))
            e = {"key": key, "wav": path, "spk": f"s{spk}"}
            if u < 6:
                train_entries.append(e)
            else:
                eval_entries.append(e)
    with open(root / "train.list", "w") as f:
        for e in train_entries:
            f.write(json.dumps(e) + "\n")
    with open(root / "eval.list", "w") as f:
        for e in eval_entries:
            f.write(json.dumps(e) + "\n")
    with open(root / "train.label", "w") as f:
        for e in train_entries:
            f.write(f"{e['key']} {e['spk']}\n")
    # trials: all eval pairs
    keys = [e["key"] for e in eval_entries]
    spk_of = {e["key"]: e["spk"] for e in eval_entries}
    with open(root / "trials.txt", "w") as f:
        for i, a in enumerate(keys):
            for b in keys[i + 1 :]:
                lab = "target" if spk_of[a] == spk_of[b] else "nontarget"
                f.write(f"{a} {b} {lab}\n")
    return root


def test_full_workflow(setup):
    root = setup
    exp_dir = str(root / "exp")
    config = {
        "exp_dir": exp_dir,
        "model": "ECAPA_TDNN_c512",
        "model_args": {"feat_dim": 40, "embed_dim": 32},
        "projection_args": {
            "project_type": "arc_margin",
            "scale": 32.0,
            "easy_margin": False,
        },
        "dataset_args": {
            "num_frms": 100,
            "speed_perturb": False,
            "aug_prob": 0.0,
            "fbank_args": {"num_mel_bins": 40, "dither": 1.0},
            "spec_aug": True,
            "filter_args": {"min_num_frames": 50, "max_num_frames": 800},
            "shuffle": True,
            "shuffle_args": {"shuffle_size": 64},
        },
        "dataloader_args": {"batch_size": 16},
        "train_data": str(root / "train.list"),
        "train_label": str(root / "train.label"),
        "num_epochs": 6,
        "epoch_iter": 2,
        "save_epoch_interval": 2,
        "log_batch_interval": 100,
        "scheduler_args": {
            "initial_lr": 0.1,
            "final_lr": 0.01,
            "warm_up_epoch": 1,
        },
        "margin_update": {
            "initial_margin": 0.0,
            "final_margin": 0.1,
            "increase_start_epoch": 2,
            "fix_start_epoch": 4,
        },
        "model_parallel": 1,
    }
    # model_parallel=1 over all 8 cpu devices -> pure DP
    train(config)

    models_dir = os.path.join(exp_dir, "models")
    cpts = sorted(os.listdir(models_dir))
    assert any(c.endswith(".ckpt") for c in cpts), cpts

    avg = average_model(models_dir, os.path.join(exp_dir, "avg_model.ckpt"), num=2)

    # --min_epoch/--max_epoch bound the averaging window (reference
    # bin/average_model.py:34-42)
    from wespeaker_hubert_tpu.utils.checkpoint import load_checkpoint

    epochs = sorted(
        int(c.split("_")[1].split(".")[0])
        for c in cpts if c.endswith(".ckpt")
    )
    first = epochs[0]
    only_first = average_model(
        models_dir, os.path.join(exp_dir, "avg_first.ckpt"),
        num=10, min_epoch=first, max_epoch=first,
    )
    from wespeaker_hubert_tpu.utils.checkpoint import _flatten

    a = _flatten(load_checkpoint(os.path.join(models_dir,
                                              f"model_{first}.ckpt")))
    b = _flatten(load_checkpoint(only_first))
    assert set(a) == set(b)
    for k in a:
        if not isinstance(a[k], dict):
            np.testing.assert_array_equal(a[k], b[k], err_msg=str(k))

    emb_path = os.path.join(exp_dir, "embeddings", "eval.npz")
    keys, emb = extract(
        config, str(root / "eval.list"), avg, emb_path, batch_size=4
    )
    assert len(keys) == N_SPK * 2
    assert emb.shape[1] == 32

    # bf16 inference knob: same embeddings up to bf16 noise (cosine)
    _, emb_bf16 = extract(
        config, str(root / "eval.list"), avg,
        os.path.join(exp_dir, "embeddings", "eval_bf16.npz"),
        batch_size=4, compute_dtype="bf16",
    )
    cos = np.sum(emb * emb_bf16, axis=1) / (
        np.linalg.norm(emb, axis=1) * np.linalg.norm(emb_bf16, axis=1)
    )
    assert cos.min() > 0.99, cos.min()

    # resume path: config.yaml was dumped
    assert os.path.exists(os.path.join(exp_dir, "config.yaml"))

    score_files = score_trials(
        emb_path, [str(root / "trials.txt")], os.path.join(exp_dir, "scores")
    )
    eer, mindcf = compute_metrics(score_files[0])
    assert 0 <= eer <= 100 and 0 <= mindcf <= 1

    # AS-Norm using train-set embeddings as cohort
    cohort_path = os.path.join(exp_dir, "embeddings", "cohort.npz")
    extract(config, str(root / "train.list"), avg, cohort_path, batch_size=4)
    normed = score_norm(
        score_files[0],
        os.path.join(exp_dir, "scores", "normed.score"),
        emb_path,
        cohort_path,
        method="asnorm",
        top_n=8,
    )
    eer_n, mindcf_n = compute_metrics(normed)
    assert 0 <= eer_n <= 100


if __name__ == "__main__":
    pytest.main([__file__, "-x", "-q"])
