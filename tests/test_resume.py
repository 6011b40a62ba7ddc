"""Step-exact mid-epoch resume (VERDICT r1 #6): kill a run mid-epoch via
stop_at_step, resume from the full-state checkpoint, and the parameter /
metric stream must continue BIT-identically vs an uninterrupted run —
exceeding the reference, which restarts epochs (SURVEY §5)."""

import json

import numpy as np
import pytest

from wespeaker_hubert_tpu.bin.train import train
from wespeaker_hubert_tpu.data.wav_io import write_wav

N_SPK = 3


def _make_corpus(root, rng):
    entries = []
    for spk in range(N_SPK):
        for u in range(16):  # 48 utts = 6 batches of 8 per epoch
            n = int(rng.integers(18000, 24000))
            key = f"s{spk}u{u}"
            path = str(root / f"{key}.wav")
            t = np.arange(n) / 16000.0
            x = np.sin(2 * np.pi * (300 + 100 * spk) * t)
            write_wav(path, (x * 0.3 + rng.standard_normal(n) * 0.01)
                      .clip(-1, 1).astype(np.float32))
            entries.append({"key": key, "wav": path, "spk": f"s{spk}"})
    with open(root / "train.list", "w") as f:
        for e in entries:
            f.write(json.dumps(e) + "\n")
    with open(root / "train.label", "w") as f:
        for e in entries:
            f.write(f"{e['key']} {e['spk']}\n")


def _config(root, exp_dir, **kw):
    cfg = {
        "exp_dir": exp_dir,
        "model": "ECAPA_TDNN_c512",
        "model_args": {"feat_dim": 40, "embed_dim": 32, "channels": 32},
        "projection_args": {"project_type": "arc_margin", "scale": 32.0},
        "dataset_args": {
            "num_frms": 100,
            "speed_perturb": True,
            "aug_prob": 0.0,
            "fbank_args": {"num_mel_bins": 40, "dither": 1.0},
            "spec_aug": True,
            "filter_args": {"min_num_frames": 50, "max_num_frames": 800},
            "shuffle": True,
            "shuffle_args": {"shuffle_size": 16},
        },
        "dataloader_args": {"batch_size": 8},
        "train_data": str(root / "train.list"),
        "train_label": str(root / "train.label"),
        "num_epochs": 2,
        "epoch_iter": 6,
        "save_epoch_interval": 1,
        "save_optimizer": True,
        "log_batch_interval": 1,
        "scheduler_args": {"initial_lr": 0.05, "final_lr": 0.01,
                           "warm_up_epoch": 1},
        "margin_update": {"increase_start_epoch": 1, "fix_start_epoch": 2,
                          "final_margin": 0.2},
        "seed": 7,
    }
    cfg.update(kw)
    return cfg


def _leaves(state):
    import jax

    return [np.asarray(x) for x in jax.tree.leaves(state.params)]


def test_mid_epoch_resume_bit_exact(tmp_path):
    root = tmp_path
    _make_corpus(root, np.random.default_rng(0))

    # run A: uninterrupted 2 epochs x 6 iters
    state_a = train(_config(root, str(root / "expA")))

    # run B: stop mid-epoch (step 4 of epoch 0), then resume to completion
    state_b1 = train(_config(root, str(root / "expB"), stop_at_step=4))
    assert int(state_b1.step) == 4
    meta = json.load(open(root / "expB" / "models" / "train_state.ckpt.json"))
    assert meta["epoch"] == 0 and meta["batch_in_epoch"] == 4

    state_b = train(_config(root, str(root / "expB")))

    assert int(state_a.step) == int(state_b.step)
    for la, lb in zip(_leaves(state_a), _leaves(state_b)):
        np.testing.assert_array_equal(la, lb)

    # the post-resume metric stream matches the uninterrupted run exactly
    def metrics(exp):
        out = {}
        with open(root / exp / "metrics.jsonl") as f:
            for line in f:
                d = json.loads(line)
                out[d["step"]] = d["loss"]
        return out

    ma, mb = metrics("expA"), metrics("expB")
    after = {s: v for s, v in mb.items() if s > 4}
    assert after, "no post-resume metrics logged"
    for s, v in after.items():
        assert ma[s] == v, (s, ma[s], v)


def test_resume_across_epoch_boundary(tmp_path):
    """stop exactly at an epoch boundary -> batch_in_epoch 0 path."""
    root = tmp_path
    _make_corpus(root, np.random.default_rng(1))
    state_a = train(_config(root, str(root / "expA")))
    train(_config(root, str(root / "expB"), stop_at_step=6))
    meta = json.load(open(root / "expB" / "models" / "train_state.ckpt.json"))
    assert meta["batch_in_epoch"] in (0, 6)  # boundary save
    state_b = train(_config(root, str(root / "expB")))
    assert int(state_a.step) == int(state_b.step)
    for la, lb in zip(_leaves(state_a), _leaves(state_b)):
        np.testing.assert_array_equal(la, lb)


if __name__ == "__main__":
    pytest.main([__file__, "-x", "-q"])


def test_resume_with_native_loader(tmp_path):
    """Step-exact resume must hold with the parallel C++ host loader
    (dataloader_args.num_workers > 0): batch order is deterministic by
    construction (reorder-window emission, data/native/loader.cc)."""
    root = tmp_path
    _make_corpus(root, np.random.default_rng(4))
    dl = {"batch_size": 8, "num_workers": 2}
    state_a = train(_config(root, str(root / "expA"), dataloader_args=dl))
    train(_config(root, str(root / "expB"), dataloader_args=dl,
                  stop_at_step=3))
    state_b = train(_config(root, str(root / "expB"), dataloader_args=dl))
    assert int(state_a.step) == int(state_b.step)
    for la, lb in zip(_leaves(state_a), _leaves(state_b)):
        np.testing.assert_array_equal(la, lb)
