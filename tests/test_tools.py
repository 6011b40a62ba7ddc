"""bin/tools + export tests: raw/shard list builders, vector_mean,
wav2dur, aug store builder, model-dir export."""

import json
import os

import numpy as np
import pytest

from wespeaker_hubert_tpu.bin.tools import (
    build_aug_store,
    generate_calibration_trial,
    make_raw_list,
    make_shard_list,
    vector_mean,
    wav2dur,
)
from wespeaker_hubert_tpu.data import (
    iter_raw_list,
    iter_tar_shards,
    load_data_list,
    write_wav,
)
from wespeaker_hubert_tpu.utils.embeddings import (
    load_embeddings,
    save_embeddings,
)


@pytest.fixture
def kaldi_dir(tmp_path):
    rng = np.random.default_rng(0)
    wav_scp = tmp_path / "wav.scp"
    utt2spk = tmp_path / "utt2spk"
    with open(wav_scp, "w") as ws, open(utt2spk, "w") as us:
        for i in range(10):
            p = str(tmp_path / f"u{i}.wav")
            write_wav(p, rng.standard_normal(16000).astype(np.float32) * 0.1)
            ws.write(f"utt{i} {p}\n")
            us.write(f"utt{i} spk{i % 3}\n")
    return tmp_path


def test_make_raw_list(kaldi_dir):
    out = str(kaldi_dir / "raw.list")
    n = make_raw_list(
        str(kaldi_dir / "wav.scp"), str(kaldi_dir / "utt2spk"), out
    )
    assert n == 10
    samples = list(iter_raw_list(load_data_list(out)))
    assert len(samples) == 10
    assert samples[0]["spk"].startswith("spk")


def test_make_shard_list(kaldi_dir):
    out = str(kaldi_dir / "shard.list")
    paths = make_shard_list(
        str(kaldi_dir / "wav.scp"), str(kaldi_dir / "utt2spk"),
        str(kaldi_dir / "shards"), out,
        num_utts_per_shard=4, num_workers=2,
    )
    assert len(paths) == 3  # 10 utts / 4
    samples = list(iter_tar_shards(load_data_list(out)))
    assert len(samples) == 10
    assert all("wav" in s and "spk" in s for s in samples)


@pytest.mark.parametrize("compress,suffix", [("gz", ".tar.gz"),
                                             ("zstd", ".tar.zst")])
def test_make_shard_list_compressed(kaldi_dir, compress, suffix):
    if compress == "zstd":
        from wespeaker_hubert_tpu.data.zstd_io import zstd_available

        if not zstd_available():
            pytest.skip("libzstd unavailable")
    out = str(kaldi_dir / f"shard_{compress}.list")
    paths = make_shard_list(
        str(kaldi_dir / "wav.scp"), str(kaldi_dir / "utt2spk"),
        str(kaldi_dir / f"shards_{compress}"), out,
        num_utts_per_shard=4, num_workers=2, compress=compress,
    )
    assert len(paths) == 3 and all(p.endswith(suffix) for p in paths)
    samples = list(iter_tar_shards(load_data_list(out)))
    assert len(samples) == 10
    # content identical to the plain-tar packing
    plain = make_shard_list(
        str(kaldi_dir / "wav.scp"), str(kaldi_dir / "utt2spk"),
        str(kaldi_dir / "shards_plain"), str(kaldi_dir / "plain.list"),
        num_utts_per_shard=4, num_workers=2,
    )
    ref = list(iter_tar_shards(plain))
    for a, b in zip(sorted(samples, key=lambda s: s["key"]),
                    sorted(ref, key=lambda s: s["key"])):
        assert a["key"] == b["key"] and a["spk"] == b["spk"]
        np.testing.assert_array_equal(a["wav"], b["wav"])


def test_vector_mean(kaldi_dir):
    rng = np.random.default_rng(1)
    keys = [f"utt{i}" for i in range(10)]
    emb = rng.standard_normal((10, 8)).astype(np.float32)
    emb_path = str(kaldi_dir / "emb.npz")
    save_embeddings(emb_path, keys, emb)
    out = str(kaldi_dir / "spk_mean.npz")
    n = vector_mean(emb_path, str(kaldi_dir / "utt2spk"), out)
    assert n == 3
    spks, means = load_embeddings(out)
    assert spks == ["spk0", "spk1", "spk2"]
    want = emb[[0, 3, 6, 9]].mean(0)  # spk0 utts 0,3,6,9
    np.testing.assert_allclose(means[0], want, atol=1e-6)


def test_wav2dur(kaldi_dir):
    out = str(kaldi_dir / "utt2dur")
    durs = wav2dur(str(kaldi_dir / "wav.scp"), out)
    assert len(durs) == 10
    assert all(abs(d - 1.0) < 0.01 for d in durs.values())


def test_generate_calibration_trial(tmp_path):
    # two speakers, each with utterances in BOTH duration bands
    # (2-6 s short, >6 s long) -> the reference band logic engages
    with open(tmp_path / "utt2dur", "w") as f, \
            open(tmp_path / "utt2spk", "w") as g:
        for s in ("a", "b"):
            for i, dur in enumerate((3.0, 4.0, 8.0, 10.0)):
                f.write(f"{s}_{i} {dur}\n")
                g.write(f"{s}_{i} spk_{s}\n")
    out = str(tmp_path / "cal.trials")
    n = generate_calibration_trial(
        str(tmp_path / "utt2dur"), str(tmp_path / "utt2spk"), out,
        each_trial_num=100, seed=0,
    )
    lines = [ln.split() for ln in open(out)]
    assert n == len(lines) == 6 * (100 // 2)  # 3 pair-types x 2 labels
    spk = lambda u: u.rsplit("_", 1)[0]  # noqa: E731
    durs = {f"{s}_{i}": d for s in "ab"
            for i, d in enumerate((3.0, 4.0, 8.0, 10.0))}
    for k, (e, t, lab) in enumerate(lines):
        assert lab == ("target" if spk(e) == spk(t) else "nontarget")
        assert lab == ("target", "nontarget")[k % 2]
        # enroll side of every round's pairs: short, short, long
        assert (durs[e] < 6.0) == (k % 6 < 4)
    # determinism
    out2 = str(tmp_path / "cal2.trials")
    generate_calibration_trial(
        str(tmp_path / "utt2dur"), str(tmp_path / "utt2spk"), out2,
        each_trial_num=100, seed=0,
    )
    assert open(out).read() == open(out2).read()
    # tiny corpus (no speaker spans both bands) falls back to one pool
    with open(tmp_path / "utt2dur1", "w") as f, \
            open(tmp_path / "utt2spk1", "w") as g:
        for s, dur in (("a", 3.0), ("b", 8.0)):
            f.write(f"{s}_0 {dur}\n")
            g.write(f"{s}_0 spk_{s}\n")
    n = generate_calibration_trial(
        str(tmp_path / "utt2dur1"), str(tmp_path / "utt2spk1"),
        str(tmp_path / "cal3.trials"), each_trial_num=10, seed=0,
    )
    assert n == 30


def test_build_aug_store(kaldi_dir, tmp_path):
    # prefix keys drive SNR bands
    scp = tmp_path / "noise.scp"
    with open(scp, "w") as f:
        f.write(f"noise-1 {kaldi_dir}/u0.wav\n")
        f.write(f"music-2 {kaldi_dir}/u1.wav\n")
    store = build_aug_store(str(scp), str(tmp_path / "store"))
    assert len(store) == 2
    rng = np.random.default_rng(0)
    key, arr = store.random_one(rng)
    assert key in ("noise-1", "music-2")
    assert len(arr) == 16000


def test_export_model(tmp_path):
    from wespeaker_hubert_tpu.bin.export_model import export_model
    from wespeaker_hubert_tpu.utils.checkpoint import (
        load_checkpoint,
        save_checkpoint,
    )
    from wespeaker_hubert_tpu.utils.config import dump_config, load_config

    exp = tmp_path / "exp"
    exp.mkdir()
    dump_config({"model": "ECAPA_TDNN_c512"}, str(exp / "config.yaml"))
    save_checkpoint(
        str(exp / "avg_model.ckpt"), {"params": {"w": np.ones(3)}}
    )
    mv = tmp_path / "mean.npy"
    np.save(mv, np.zeros(3))
    out = export_model(str(exp), str(tmp_path / "deploy"), mean_vec=str(mv))
    assert load_config(os.path.join(out, "config.yaml"))["model"]
    assert load_checkpoint(os.path.join(out, "avg_model.ckpt"))
    assert os.path.exists(os.path.join(out, "mean_vec.npy"))


if __name__ == "__main__":
    pytest.main([__file__, "-x", "-q"])
