"""CLI Speaker API test: train a tiny model via bin.train, then exercise
embedding / similarity / register+recognize / diarization through the
Speaker class."""

import json
import os
import shutil

import numpy as np
import pytest

from wespeaker_hubert_tpu.bin.average_model import average_model
from wespeaker_hubert_tpu.bin.train import train
from wespeaker_hubert_tpu.cli.speaker import Speaker, load_model
from wespeaker_hubert_tpu.data import write_wav


def _spk_wav(rng, spk, n):
    t = np.arange(n) / 16000.0
    freqs = 400.0 + 170.0 * spk + 23.0 * np.arange(2)
    x = sum(np.sin(2 * np.pi * f * t + rng.uniform(0, 6.28)) for f in freqs)
    return (x / 2 * 0.3 + rng.standard_normal(n) * 0.01).clip(-1, 1).astype(
        np.float32
    )


@pytest.fixture(scope="module")
def model_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("cli")
    rng = np.random.default_rng(0)
    entries = []
    for spk in range(3):
        for u in range(6):
            key = f"s{spk}u{u}"
            path = str(root / f"{key}.wav")
            write_wav(path, _spk_wav(rng, spk, int(rng.integers(17000, 25000))))
            entries.append({"key": key, "wav": path, "spk": f"s{spk}"})
    with open(root / "train.list", "w") as f:
        for e in entries:
            f.write(json.dumps(e) + "\n")
    with open(root / "train.label", "w") as f:
        for e in entries:
            f.write(f"{e['key']} {e['spk']}\n")

    exp = str(root / "exp")
    config = {
        "exp_dir": exp,
        "model": "ECAPA_TDNN_c512",
        "model_args": {"feat_dim": 40, "embed_dim": 24},
        "projection_args": {"project_type": "arc_margin", "scale": 32.0},
        "dataset_args": {
            "num_frms": 100, "speed_perturb": False, "aug_prob": 0.0,
            "fbank_args": {"num_mel_bins": 40, "dither": 1.0},
            "filter_args": {"min_num_frames": 50},
            "shuffle_args": {"shuffle_size": 32},
        },
        "dataloader_args": {"batch_size": 8},
        "train_data": str(root / "train.list"),
        "train_label": str(root / "train.label"),
        "num_epochs": 4,
        "epoch_iter": 2,
        "save_epoch_interval": 2,
        "scheduler_args": {"initial_lr": 0.1, "final_lr": 0.02,
                           "warm_up_epoch": 1},
        "margin_update": {"initial_margin": 0.0, "final_margin": 0.1,
                          "increase_start_epoch": 1, "fix_start_epoch": 2},
    }
    train(config)
    average_model(
        os.path.join(exp, "models"), os.path.join(exp, "avg_model.ckpt"), num=2
    )
    return {"exp": exp, "root": root, "rng": rng}


class TestSpeakerAPI:
    def test_embedding_and_similarity(self, model_dir):
        model = load_model(model_dir["exp"])
        root = model_dir["root"]
        e = model.extract_embedding(str(root / "s0u0.wav"))
        assert e.ndim == 1 and e.shape[0] == 24

        same = model.compute_similarity(
            str(root / "s0u0.wav"), str(root / "s0u1.wav")
        )
        diff = model.compute_similarity(
            str(root / "s0u0.wav"), str(root / "s2u1.wav")
        )
        assert 0.0 <= same <= 1.0 and 0.0 <= diff <= 1.0

    def test_resample_rate_rebuilds_fbank_and_resamples_input(
        self, model_dir, tmp_path
    ):
        """set_resample_rate must flow into FbankConfig (the reference
        computes fbank at the configured rate, cli/speaker.py:158-160)
        and mismatched input audio is resampled to the target rate
        (reference :155-157), not rejected."""
        from wespeaker_hubert_tpu.data import write_wav

        model = load_model(model_dir["exp"])
        assert model.fbank_cfg.sample_rate == 16000
        model.set_resample_rate(8000)
        assert model.fbank_cfg.sample_rate == 8000

        rng = np.random.default_rng(5)
        p = str(tmp_path / "in16k.wav")
        write_wav(p, (rng.standard_normal(16000) * 0.1).astype(np.float32),
                  16000)
        wav = model._load_audio(p)  # 16k file, 8k target -> half length
        assert len(wav) == 8000
        model.set_resample_rate(16000)
        assert model.fbank_cfg.sample_rate == 16000
        assert len(model._load_audio(p)) == 16000

    def test_register_recognize(self, model_dir):
        model = load_model(model_dir["exp"])
        root = model_dir["root"]
        for spk in range(3):
            model.register(f"spk{spk}", str(root / f"s{spk}u0.wav"))
        result = model.recognize(str(root / "s1u3.wav"))
        assert result["name"] in {"spk0", "spk1", "spk2"}
        assert 0 <= result["confidence"] <= 1

    def test_diarization(self, model_dir, tmp_path):
        model = load_model(model_dir["exp"])
        rng = np.random.default_rng(7)
        # two alternating synthetic speakers with silence gaps
        parts = []
        for i in range(4):
            parts.append(_spk_wav(rng, i % 2, 32000))
            parts.append(np.zeros(8000, np.float32))
        wav = np.concatenate(parts)
        path = str(tmp_path / "diar.wav")
        write_wav(path, wav)
        segs = model.diarize(path, utt="meeting", clusterer="spectral")
        assert len(segs) >= 2
        assert all(e > b for (_, b, e, _) in segs)
        rttm = str(tmp_path / "out.rttm")
        model.make_rttm(segs, rttm)
        assert os.path.getsize(rttm) > 0

    def test_subseg_cmn_modes(self, model_dir, tmp_path):
        """subseg_cmn placement (reference make_fbank.py --subseg-cmn):
        when a VAD segment is exactly one window long, per-window CMN
        (True) and per-segment CMN (False) must coincide; and the False
        mode must run end-to-end through diarize()."""
        import jax.numpy as jnp

        model = load_model(model_dir["exp"])
        rng = np.random.default_rng(3)
        wav = (rng.standard_normal(16000 * 2) * 0.1).astype(np.float32)
        # one segment == one 1.5 s window (window CMN == segment CMN)
        (feats,) = model._segment_fbanks(wav, [(0.0, 1.5)])
        n_win = int(model.diar_window_secs * 1000
                    / model.fbank_cfg.frame_shift_ms)
        win = feats[:n_win]
        emb_window_cmn = model._embed_feats_fn(
            model.variables, jnp.asarray(win[None]), True
        )
        emb_segment_cmn = model._embed_feats_fn(
            model.variables, jnp.asarray((win - win.mean(0))[None]), False
        )
        np.testing.assert_allclose(
            np.asarray(emb_window_cmn), np.asarray(emb_segment_cmn),
            rtol=1e-4, atol=1e-4,
        )

        # the False mode drives the full pipeline
        rng2 = np.random.default_rng(8)
        parts = []
        for i in range(4):
            parts.append(_spk_wav(rng2, i % 2, 32000))
            parts.append(np.zeros(8000, np.float32))
        path = str(tmp_path / "diar_cmn.wav")
        write_wav(path, np.concatenate(parts))
        model.set_diarization_params(subseg_cmn=False)
        segs = model.diarize(path, utt="m", clusterer="spectral")
        assert len(segs) >= 2
        assert all(e > b for (_, b, e, _) in segs)

    def test_load_model_rejects_alias(self):
        with pytest.raises(ValueError):
            load_model("english")

    def test_segment_fbanks_match_per_segment(self, model_dir):
        """The bucketed/batched segment fbank (compile-count fix) must be
        bit-identical to the naive one-fbank-call-per-segment path."""
        import jax.numpy as jnp

        from wespeaker_hubert_tpu.ops.fbank import fbank

        model = load_model(model_dir["exp"])
        rng = np.random.default_rng(11)
        wav = (rng.standard_normal(16000 * 12) * 0.1).astype(np.float32)
        vad = [(0.1, 1.73), (2.0, 2.61), (3.0, 7.5), (8.0, 11.9)]
        batched = model._segment_fbanks(wav, vad)
        assert len(batched) == len(vad)
        for (b, e), got in zip(vad, batched):
            seg = wav[int(b * 16000):int(e * 16000)]
            ref, _ = fbank(jnp.asarray(seg[None]), model.fbank_cfg)
            np.testing.assert_array_equal(got, np.asarray(ref[0]))


if __name__ == "__main__":
    pytest.main([__file__, "-x", "-q"])
