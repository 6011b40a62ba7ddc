"""Smoke tests for the MoCo/SimCLR contrastive training driver."""

import json
import os

import numpy as np
import pytest

from wespeaker_hubert_tpu.bin.train_contrastive import train_contrastive
from wespeaker_hubert_tpu.data import write_wav


@pytest.fixture
def corpus(tmp_path):
    rng = np.random.default_rng(0)
    lst = tmp_path / "ssl.list"
    with open(lst, "w") as f:
        for i in range(16):
            p = str(tmp_path / f"u{i}.wav")
            write_wav(p, (rng.standard_normal(40000) * 0.1).clip(-1, 1))
            f.write(json.dumps({"key": f"u{i}", "wav": p, "spk": "x"}) + "\n")
    return str(lst)


def _config(corpus, tmp_path, method):
    return {
        "ssl_method": method,
        "exp_dir": str(tmp_path / f"exp_{method}"),
        "model": "ECAPA_TDNN_c512",
        "model_args": {"feat_dim": 40, "embed_dim": 24},
        "train_data": corpus,
        "dataloader_args": {"batch_size": 8},
        "num_epochs": 1,
        "epoch_iter": 2,
        "save_epoch_interval": 1,
        "log_batch_interval": 1,
        "dataset_args": {
            "chunk_len": 60,
            "aug_prob": 0.0,
            "fbank_args": {"num_mel_bins": 40, "dither": 1.0},
        },
        "moco_args": {"K": 64},
        "scheduler_args": {"initial_lr": 0.02},
    }


@pytest.mark.parametrize("method", ["moco", "simclr"])
def test_contrastive_driver(corpus, tmp_path, method):
    state = train_contrastive(_config(corpus, tmp_path, method))
    assert int(state.step) == 2
    assert os.path.exists(
        str(tmp_path / f"exp_{method}" / "models" / "model_1.ckpt")
    )


if __name__ == "__main__":
    pytest.main([__file__, "-x", "-q"])
