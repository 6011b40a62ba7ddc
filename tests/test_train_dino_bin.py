"""Smoke test for the config-driven DINO training driver."""

import json

import numpy as np
import pytest

from wespeaker_hubert_tpu.bin.train_dino import train_dino
from wespeaker_hubert_tpu.data import write_wav


def test_train_dino_driver(tmp_path):
    rng = np.random.default_rng(0)
    with open(tmp_path / "ssl.list", "w") as f:
        for i in range(16):
            p = str(tmp_path / f"u{i}.wav")
            write_wav(
                p, (rng.standard_normal(40000) * 0.1).clip(-1, 1)
            )
            f.write(json.dumps({"key": f"u{i}", "wav": p, "spk": "x"}) + "\n")

    config = {
        "exp_dir": str(tmp_path / "exp"),
        "model": "ECAPA_TDNN_c512",
        "model_args": {"feat_dim": 40, "embed_dim": 24},
        "train_data": str(tmp_path / "ssl.list"),
        "dataloader_args": {"batch_size": 8},
        "num_epochs": 1,
        "epoch_iter": 2,
        "save_epoch_interval": 1,
        "log_batch_interval": 1,
        "dataset_args": {
            "global_chunk_len": 60,
            "local_chunk_len": 30,
            "global_chunk_num": 2,
            "local_chunk_num": 2,
            "aug_prob": 0.0,
            "fbank_args": {"num_mel_bins": 40, "dither": 1.0},
        },
        "dino_args": {
            "out_dim": 128,
            "hidden_dim": 64,
            "bottleneck_dim": 32,
            "freeze_last_layer_epochs": 0,
        },
        "scheduler_args": {"base_lr": 0.05, "warmup_epochs": 0},
        "optimizer": "SGD",
    }
    state = train_dino(config)
    assert state is not None
    assert int(state.step) == 2
    import os

    assert os.path.exists(
        str(tmp_path / "exp" / "models" / "model_1.ckpt")
    )


if __name__ == "__main__":
    pytest.main([__file__, "-x", "-q"])
