"""Whisper frontend tests: log-mel properties, slaney filterbank math,
encoder shapes + layer-concat, PMFA head."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from wespeaker_hubert_tpu.frontend.whisper import (
    WhisperEncoder,
    WhisperEncoderConfig,
    _sinusoids,
)
from wespeaker_hubert_tpu.models.whisper_pmfa import WhisperPMFA
from wespeaker_hubert_tpu.ops.whisper_mel import (
    slaney_mel_filters,
    whisper_log_mel,
)


class TestWhisperMel:
    def test_shape_and_range(self):
        rng = np.random.default_rng(0)
        wav = (rng.standard_normal((2, 16000)) * 0.1).astype(np.float32)
        mel = np.asarray(whisper_log_mel(jnp.asarray(wav)))
        assert mel.shape == (2, 100, 80)  # W // 160
        # whisper normalization bounds: (log_spec + 4) / 4 with 8-dB range
        assert mel.max() <= (np.log10(1e10) + 4) / 4  # loose sanity
        assert (mel.max() - mel.min()) <= 2.0 + 1e-5  # 8/4 = 2 range cap

    def test_tone_peaks_at_expected_mel_bin(self):
        sr = 16000
        t = np.arange(sr) / sr
        wav = np.sin(2 * np.pi * 1000.0 * t).astype(np.float32)[None]
        mel = np.asarray(whisper_log_mel(jnp.asarray(wav)))[0]
        filters = slaney_mel_filters()
        # expected bin: where filter response to 1 kHz is maximal
        freqs = np.fft.rfftfreq(400, 1 / sr)
        k = np.argmin(np.abs(freqs - 1000))
        expected_bin = int(np.argmax(filters[:, k]))
        got_bin = int(np.argmax(mel.mean(axis=0)))
        assert abs(got_bin - expected_bin) <= 1

    def test_slaney_filters_properties(self):
        f = slaney_mel_filters()
        assert f.shape == (80, 201)
        assert (f >= 0).all()
        # every filter has nonzero support; supports ascend in frequency
        peaks = np.argmax(f, axis=1)
        assert (np.diff(peaks) >= 0).all()


class TestSinusoids:
    def test_formula(self):
        pos = _sinusoids(10, 8)
        assert pos.shape == (10, 8)
        np.testing.assert_allclose(pos[0, :4], 0.0)  # sin(0)
        np.testing.assert_allclose(pos[0, 4:], 1.0)  # cos(0)
        inc = np.log(10000) / 3
        np.testing.assert_allclose(
            pos[1, 0], np.sin(1.0), rtol=1e-6
        )
        np.testing.assert_allclose(
            pos[2, 1], np.sin(2 * np.exp(-inc)), rtol=1e-5
        )


class TestWhisperEncoder:
    def test_shapes_and_concat(self):
        cfg = WhisperEncoderConfig.tiny_test()
        enc = WhisperEncoder(cfg)
        rng = np.random.default_rng(0)
        wav = jnp.asarray(
            rng.standard_normal((2, 16000)) * 0.1, jnp.float32
        )
        variables = enc.init(jax.random.key(0), wav)
        feats, fl = enc.apply(variables, wav, lengths=jnp.asarray([16000, 8000]))
        # mel T=100 -> conv stride2 -> 50
        assert feats.shape == (2, 50, cfg.output_size)
        assert cfg.output_size == 32 * 3
        assert int(fl[0]) == 50
        assert int(fl[1]) == 25

    def test_pmfa_head(self):
        cfg = WhisperEncoderConfig.tiny_test()
        head = WhisperPMFA(output_size=cfg.output_size, embed_dim=16)
        x = jnp.zeros((2, 50, cfg.output_size))
        variables = head.init(jax.random.key(0), x, train=False)
        emb = head.apply(variables, x, train=False)
        assert emb.shape == (2, 16)


if __name__ == "__main__":
    pytest.main([__file__, "-x", "-q"])


class TestWhisperTraining:
    def test_whisper_frontend_train_smoke(self, tmp_path):
        """bin/train with frontend=whisper_encoder (tiny variant)."""
        import json

        from wespeaker_hubert_tpu.bin.train import train
        from wespeaker_hubert_tpu.data import write_wav

        rng = np.random.default_rng(0)
        entries = []
        for spk in range(2):
            for u in range(4):
                key = f"s{spk}u{u}"
                p = str(tmp_path / f"{key}.wav")
                write_wav(
                    p, (rng.standard_normal(20000) * 0.1).clip(-1, 1)
                )
                entries.append({"key": key, "wav": p, "spk": f"s{spk}"})
        with open(tmp_path / "train.list", "w") as f:
            for e in entries:
                f.write(json.dumps(e) + "\n")
        with open(tmp_path / "train.label", "w") as f:
            for e in entries:
                f.write(f"{e['key']} {e['spk']}\n")

        cfg = WhisperEncoderConfig.tiny_test()
        config = {
            "exp_dir": str(tmp_path / "exp"),
            "model": "whisper_PMFA_large_v2",
            "model_args": {"feat_dim": cfg.output_size, "embed_dim": 16},
            "projection_args": {"project_type": "arc_margin", "scale": 32.0},
            "dataset_args": {
                "num_frms": 60, "speed_perturb": False, "aug_prob": 0.0,
                "frontend": "whisper_encoder",
                "whisper_encoder_args": {"variant": "tiny_test"},
                "fbank_args": {"num_mel_bins": 40, "dither": 1.0},
                "filter_args": {"min_num_frames": 30},
                "shuffle_args": {"shuffle_size": 8},
            },
            "dataloader_args": {"batch_size": 8},
            "train_data": str(tmp_path / "train.list"),
            "train_label": str(tmp_path / "train.label"),
            "num_epochs": 1,
            "epoch_iter": 1,
            "save_epoch_interval": 1,
            "scheduler_args": {"initial_lr": 0.01, "final_lr": 0.005,
                               "warm_up_epoch": 1},
            "margin_update": {"initial_margin": 0.0, "final_margin": 0.1,
                              "increase_start_epoch": 1, "fix_start_epoch": 1},
        }
        state = train(config)
        assert int(state.step) == 1
        assert "frontend" in state.params
