"""data_type='feat' (precomputed kaldi-ark features) across the stack:
matrix-ark IO, feat-list tooling, train pipeline, train CLI and
extraction.  Reference: wespeaker/dataset/processor.py:171 parse_feat,
wespeaker/dataset/dataset.py:194-199 (feat stage chain: filter ->
shuffle -> spk2id -> random_chunk, no wav-domain aug),
tools/make_feat_list.py."""

import json
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from wespeaker_hubert_tpu.backend.kaldi_io import (
    read_kaldi_matrices,
    read_kaldi_matrix,
    write_kaldi_matrices,
)
from wespeaker_hubert_tpu.bin.tools import compute_feats, make_feat_list
from wespeaker_hubert_tpu.data import (
    EvalPipeline,
    TrainPipeline,
    TrainPipelineConfig,
    iter_feat_list,
    load_data_list,
    write_wav,
)

F = 40


def _make_ark(tmp_path, utts, rng, dim=F):
    """utts: {key: (num_frames, spk)} -> ark+scp+feat.list+utt2spk."""
    names, mats = [], []
    for key, (t, _spk) in utts.items():
        names.append(key)
        mats.append(rng.standard_normal((t, dim)).astype(np.float32))
    ark = str(tmp_path / "feats.ark")
    scp = str(tmp_path / "feats.scp")
    write_kaldi_matrices(ark, names, mats, scp)
    u2s = str(tmp_path / "utt2spk")
    with open(u2s, "w") as f:
        for key, (_t, spk) in utts.items():
            f.write(f"{key} {spk}\n")
    lst = str(tmp_path / "feat.list")
    make_feat_list(scp, u2s, lst)
    return ark, scp, lst, u2s, dict(zip(names, mats))


def test_matrix_ark_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    names = [f"u{i}" for i in range(5)]
    mats = [
        rng.standard_normal((int(rng.integers(3, 50)), F)).astype(np.float32)
        for _ in names
    ]
    ark = str(tmp_path / "m.ark")
    scp = str(tmp_path / "m.scp")
    write_kaldi_matrices(ark, names, mats, scp)
    # sequential ark read
    got = read_kaldi_matrices(ark)
    assert [k for k, _ in got] == names
    for (_, m), want in zip(got, mats):
        np.testing.assert_array_equal(m.astype(np.float32), want)
    # random access through scp offsets (the rxspecifier form the feat
    # lists carry)
    for line in open(scp):
        key, rx = line.split()
        np.testing.assert_array_equal(
            read_kaldi_matrix(rx).astype(np.float32),
            dict(zip(names, mats))[key],
        )


def test_feat_list_iteration(tmp_path):
    rng = np.random.default_rng(1)
    utts = {f"u{i}": (20 + i, f"spk{i % 2}") for i in range(4)}
    _, _, lst, _, mats = _make_ark(tmp_path, utts, rng)
    samples = list(iter_feat_list(load_data_list(lst)))
    assert [s["key"] for s in samples] == list(utts)
    for s in samples:
        assert s["spk"] == utts[s["key"]][1]
        np.testing.assert_array_equal(s["feat"], mats[s["key"]])


def test_train_pipeline_feat_batches(tmp_path):
    rng = np.random.default_rng(2)
    utts = {
        "a0": (120, "spk_a"),  # chunked down to num_frms
        "a1": (30, "spk_a"),   # tile-padded up
        "a2": (9, "spk_a"),    # dropped: < filter_min_frames
        "b0": (80, "spk_b"),
        "b1": (900, "spk_b"),  # dropped: > filter_max_frames
        "b2": (50, "spk_b"),
        "c0": (60, "spk_c"),   # dropped: unknown speaker
    }
    _, _, lst, _, mats = _make_ark(tmp_path, utts, rng)
    spk2id = {"spk_a": 0, "spk_b": 1}
    cfg = TrainPipelineConfig(
        data_type="feat", num_frms=50, batch_size=2, shuffle=False,
        filter_min_frames=10, filter_max_frames=800,
    )
    pipe = TrainPipeline(load_data_list(lst), spk2id, cfg)
    batches = list(pipe)
    assert len(batches) == 2  # 4 surviving utts / batch 2
    for b in batches:
        assert set(b) == {"feat", "label"}
        assert b["feat"].shape == (2, 50, F)
        assert b["feat"].dtype == np.float32
    # unshuffled order: a0, a1, b0, b2 with labels 0 0 1 1
    np.testing.assert_array_equal(batches[0]["label"], [0, 0])
    np.testing.assert_array_equal(batches[1]["label"], [1, 1])
    # the short utterance was tile-padded from its own frames
    a1 = batches[0]["feat"][1]
    np.testing.assert_array_equal(a1[:30], mats["a1"])
    np.testing.assert_array_equal(a1[30:50], mats["a1"][:20])


def test_train_cli_feat(tmp_path):
    """bin.train end-to-end on precomputed features: batches carry
    'feat' (the executor applies CMVN+SpecAug in-graph), speed perturb
    is forced off (x1 label space), checkpoints land."""
    from wespeaker_hubert_tpu.bin.train import train

    rng = np.random.default_rng(3)
    utts = {
        f"s{s}u{u}": (int(rng.integers(60, 120)), f"spk{s}")
        for s in range(4) for u in range(6)
    }
    _, _, lst, u2s, _ = _make_ark(tmp_path, utts, rng)
    exp = str(tmp_path / "exp")
    config = {
        "exp_dir": exp,
        "model": "ECAPA_TDNN_c512",
        "model_args": {"feat_dim": F, "embed_dim": 16},
        "projection_args": {"project_type": "arc_margin", "scale": 32.0},
        "data_type": "feat",
        "train_data": lst,
        "train_label": u2s,
        "dataloader_args": {"batch_size": 8},
        "dataset_args": {
            "num_frms": 50,
            # speed_perturb deliberately LEFT at default True: feat mode
            # must force it off (no wav domain to perturb)
            "fbank_args": {"num_mel_bins": F},
            "filter_args": {"min_num_frames": 10, "max_num_frames": 800},
            "shuffle_args": {"shuffle_size": 16},
        },
        "num_epochs": 1,
        "epoch_iter": 2,
        "save_epoch_interval": 1,
        "scheduler_args": {"initial_lr": 0.05, "final_lr": 0.01,
                           "warm_up_epoch": 1},
        "margin_update": {"initial_margin": 0.0, "final_margin": 0.1,
                          "increase_start_epoch": 1, "fix_start_epoch": 2},
    }
    train(config)
    assert os.path.exists(os.path.join(exp, "models", "model_1.ckpt"))
    # x1 label space: projection rows == 4 speakers (not 12)
    from wespeaker_hubert_tpu.utils.checkpoint import load_checkpoint

    ckpt = load_checkpoint(os.path.join(exp, "models", "model_1.ckpt"))
    w = ckpt["params"]["projection"]["weight"]
    assert 4 in np.shape(w)


def test_extract_feat_matches_wav(tmp_path):
    """Embeddings extracted from precomputed features (compute_feats ->
    feat list) match wav-path extraction on the same audio."""
    from wespeaker_hubert_tpu.bin.extract import extract
    from wespeaker_hubert_tpu.bin.train import build_speaker_net
    from wespeaker_hubert_tpu.utils.checkpoint import save_checkpoint

    config = {
        "model": "ECAPA_TDNN_c512",
        "model_args": {"feat_dim": F, "embed_dim": 16},
        "dataset_args": {"fbank_args": {"num_mel_bins": F}},
    }
    net = build_speaker_net(config, num_class=2)
    v = net.init(
        jax.random.key(0), jnp.zeros((1, 100, F)), jnp.zeros((1,), jnp.int32),
        0.0, train=False,
    )
    ckpt = str(tmp_path / "model.ckpt")
    save_checkpoint(ckpt, {
        "params": v["params"], "batch_stats": v.get("batch_stats", {}),
    })

    rng = np.random.default_rng(4)
    wav_scp = str(tmp_path / "wav.scp")
    wav_list = str(tmp_path / "wav.list")
    u2s = str(tmp_path / "utt2spk")
    with open(wav_scp, "w") as ws, open(wav_list, "w") as wl, \
            open(u2s, "w") as us:
        for i in range(6):
            p = str(tmp_path / f"u{i}.wav")
            write_wav(p, (rng.standard_normal(
                int(rng.integers(16000, 30000))) * 0.1).clip(-1, 1))
            ws.write(f"u{i} {p}\n")
            wl.write(json.dumps({"key": f"u{i}", "wav": p}) + "\n")
            us.write(f"u{i} spk0\n")

    ark = str(tmp_path / "feats.ark")
    scp = str(tmp_path / "feats.scp")
    n = compute_feats(wav_scp, ark, scp, num_mel_bins=F)
    assert n == 6
    feat_list = str(tmp_path / "feat.list")
    make_feat_list(scp, u2s, feat_list)

    kw, ew = extract(
        dict(config), wav_list, ckpt, str(tmp_path / "wav.npz"),
        batch_size=4,
    )
    kf, ef = extract(
        dict(config), feat_list, ckpt, str(tmp_path / "feat.npz"),
        batch_size=4, data_type="feat",
    )
    assert kw == kf
    cos = np.sum(ew * ef, -1) / (
        np.linalg.norm(ew, axis=-1) * np.linalg.norm(ef, axis=-1)
    )
    assert cos.min() > 0.999, cos


def test_eval_pipeline_feat_buckets(tmp_path):
    rng = np.random.default_rng(5)
    utts = {f"u{i}": (t, "s") for i, t in enumerate((50, 180, 300, 700))}
    _, _, lst, _, mats = _make_ark(tmp_path, utts, rng)
    pipe = EvalPipeline(
        load_data_list(lst), data_type="feat", batch_size=2,
        bucket_frames=(200, 400, 800),
    )
    got = {}
    for b in pipe:
        assert b["feat"].shape[1] in (200, 400, 800)
        for i, k in enumerate(b["keys"]):
            t = int(b["feat_length"][i])
            assert t == utts[k][0]
            np.testing.assert_array_equal(b["feat"][i, :t], mats[k])
            assert not b["feat"][i, t:].any()  # zero padding
            got[k] = True
    assert set(got) == set(utts)


def test_feat_rejects_wav_frontend(tmp_path):
    """data_type=feat + an SSL frontend would silently bypass the
    frontend; bin/train must refuse the combination."""
    from wespeaker_hubert_tpu.bin.train import train

    rng = np.random.default_rng(6)
    utts = {"a0": (60, "spk_a"), "b0": (60, "spk_b")}
    _, _, lst, u2s, _ = _make_ark(tmp_path, utts, rng)
    config = {
        "exp_dir": str(tmp_path / "exp"),
        "model": "ECAPA_TDNN_c512",
        "model_args": {"embed_dim": 16},
        "projection_args": {"project_type": "arc_margin"},
        "data_type": "feat",
        "train_data": lst,
        "train_label": u2s,
        "dataloader_args": {"batch_size": 8},
        "dataset_args": {
            "frontend": "s3prl",
            "s3prl_args": {"upstream": "tiny"},
        },
        "num_epochs": 1, "epoch_iter": 1,
    }
    with pytest.raises(ValueError, match="frontend=fbank"):
        train(config)




def test_extract_shard_matches_raw(tmp_path):
    """extract --data_type shard (EvalPipeline tar mode) produces the
    same embeddings as raw-list extraction on the same wavs (reference
    extract.py --data_type; local/extract_vox.sh defaults to shard)."""
    from wespeaker_hubert_tpu.bin.extract import extract
    from wespeaker_hubert_tpu.bin.tools import make_raw_list, make_shard_list
    from wespeaker_hubert_tpu.bin.train import build_speaker_net
    from wespeaker_hubert_tpu.utils.checkpoint import save_checkpoint

    config = {
        "model": "ECAPA_TDNN_c512",
        "model_args": {"feat_dim": F, "embed_dim": 16},
        "dataset_args": {"fbank_args": {"num_mel_bins": F}},
    }
    net = build_speaker_net(config, num_class=2)
    v = net.init(
        jax.random.key(0), jnp.zeros((1, 100, F)), jnp.zeros((1,), jnp.int32),
        0.0, train=False,
    )
    ckpt = str(tmp_path / "model.ckpt")
    save_checkpoint(ckpt, {
        "params": v["params"], "batch_stats": v.get("batch_stats", {}),
    })

    rng = np.random.default_rng(9)
    wav_scp = str(tmp_path / "wav.scp")
    u2s = str(tmp_path / "utt2spk")
    with open(wav_scp, "w") as ws, open(u2s, "w") as us:
        for i in range(5):
            path = str(tmp_path / f"u{i}.wav")
            write_wav(path, (rng.standard_normal(
                int(rng.integers(16000, 30000))) * 0.1).clip(-1, 1))
            ws.write(f"u{i} {path}\n")
            us.write(f"u{i} spk0\n")
    raw_list = str(tmp_path / "raw.list")
    make_raw_list(wav_scp, u2s, raw_list)
    shard_list = str(tmp_path / "shard.list")
    make_shard_list(wav_scp, u2s, str(tmp_path / "shards"), shard_list,
                    num_utts_per_shard=2, num_workers=1, shuffle=False)

    kr, er = extract(dict(config), raw_list, ckpt,
                     str(tmp_path / "raw.npz"), batch_size=4)
    ks, es = extract(dict(config), shard_list, ckpt,
                     str(tmp_path / "shard.npz"), batch_size=4,
                     data_type="shard")
    assert sorted(kr) == sorted(ks)
    er = {k: e for k, e in zip(kr, er)}
    for k, e in zip(ks, es):
        np.testing.assert_allclose(e, er[k], rtol=1e-5, atol=1e-5)



if __name__ == "__main__":
    pytest.main([__file__, "-x", "-q"])
