"""Host data-pipeline tests: wav IO round-trip, shard striping, raw/tar
iteration, train batching with aug fields, eval bucketing."""

import json
import os
import tarfile

import numpy as np
import pytest

from wespeaker_hubert_tpu.data import (
    AugStore,
    load_data_list,
    EvalPipeline,
    TrainPipeline,
    TrainPipelineConfig,
    chunk_samples_for_frames,
    iter_raw_list,
    iter_tar_shards,
    read_wav,
    shard_list_for_rank,
    write_wav,
)


@pytest.fixture
def corpus(tmp_path):
    """8 speakers x 4 utts of 1-3 s, raw JSONL list + one tar shard."""
    rng = np.random.default_rng(0)
    entries = []
    wav_dir = tmp_path / "wavs"
    wav_dir.mkdir()
    for spk in range(8):
        for u in range(4):
            n = rng.integers(16000, 48000)
            wav = (rng.standard_normal(n) * 0.1).clip(-1, 1)
            key = f"spk{spk}-utt{u}"
            path = str(wav_dir / f"{key}.wav")
            write_wav(path, wav)
            entries.append({"key": key, "wav": path, "spk": f"spk{spk}"})
    raw_list = tmp_path / "raw.list"
    with open(raw_list, "w") as f:
        for e in entries:
            f.write(json.dumps(e) + "\n")

    shard = tmp_path / "shard0.tar"
    with tarfile.open(shard, "w") as tf:
        for e in entries[:8]:
            tf.add(e["wav"], arcname=e["key"] + ".wav")
            spk_file = tmp_path / "tmp.spk"
            spk_file.write_text(e["spk"])
            tf.add(str(spk_file), arcname=e["key"] + ".spk")
    return {
        "raw_list": str(raw_list),
        "shard": str(shard),
        "spk2id": {f"spk{i}": i for i in range(8)},
    }


class TestWavIO:
    def test_roundtrip(self, tmp_path):
        rng = np.random.default_rng(0)
        x = (rng.standard_normal(16000) * 0.3).clip(-1, 1).astype(np.float32)
        p = str(tmp_path / "a.wav")
        write_wav(p, x)
        y, sr = read_wav(p)
        assert sr == 16000
        np.testing.assert_allclose(y, x, atol=1.0 / 32768)


class TestStriping:
    def test_rank_worker_partition(self):
        entries = [f"e{i}" for i in range(100)]
        seen = []
        for rank in range(4):
            for worker in range(2):
                seen += shard_list_for_rank(
                    entries, epoch=0, rank=rank, world_size=4,
                    worker=worker, num_workers=2,
                )
        assert sorted(seen) == sorted(entries)  # exact partition

    def test_epoch_changes_order(self):
        entries = [f"e{i}" for i in range(50)]
        a = shard_list_for_rank(entries, epoch=0)
        b = shard_list_for_rank(entries, epoch=1)
        assert a != b
        assert sorted(a) == sorted(b)


class TestIterators:
    def test_raw_list(self, corpus):
        samples = list(iter_raw_list(load_data_list(corpus["raw_list"])))
        assert len(samples) == 32
        assert all(s["sample_rate"] == 16000 for s in samples)
        assert all(s["wav"].dtype == np.float32 for s in samples)

    def test_tar_shards(self, corpus):
        samples = list(iter_tar_shards([corpus["shard"]]))
        assert len(samples) == 8
        assert all("spk" in s and "wav" in s for s in samples)


class TestTrainPipeline:
    def test_batches(self, corpus):
        rng = np.random.default_rng(3)
        noise_store = AugStore(
            arrays={
                "noise-a": rng.standard_normal(20000).astype(np.float32) * 0.1,
                "music-b": rng.standard_normal(30000).astype(np.float32) * 0.1,
            }
        )
        rir_store = AugStore(
            arrays={"rir-1": rng.standard_normal(3000).astype(np.float32)}
        )
        cfg = TrainPipelineConfig(
            num_frms=100, batch_size=8, shuffle_size=16, aug_prob=0.9
        )
        pipe = TrainPipeline(
            load_data_list(corpus["raw_list"]),
            corpus["spk2id"],
            cfg,
            reverb_store=rir_store,
            noise_store=noise_store,
        )
        batches = list(pipe)
        assert len(batches) >= 3
        b = batches[0]
        chunk = chunk_samples_for_frames(100)
        assert b["wav"].shape[0] == 8
        assert b["wav"].shape[1] >= chunk  # over-long for speed perturb
        assert b["noise"].shape == (8, chunk)
        assert set(np.unique(b["speed_idx"])) <= {0, 1, 2}
        assert set(np.unique(b["aug_type"])) <= {0, 1, 2}
        # x3 label space
        assert b["label"].max() < 3 * len(corpus["spk2id"])

    def test_deterministic_given_epoch(self, corpus):
        cfg = TrainPipelineConfig(num_frms=100, batch_size=4, speed_perturb=False)
        entries = load_data_list(corpus["raw_list"])
        p1 = TrainPipeline(entries, corpus["spk2id"], cfg)
        p2 = TrainPipeline(entries, corpus["spk2id"], cfg)
        b1 = next(iter(p1))
        b2 = next(iter(p2))
        np.testing.assert_allclose(b1["wav"], b2["wav"])


class TestEvalPipeline:
    def test_bucketing(self, corpus):
        pipe = EvalPipeline(load_data_list(corpus["raw_list"]), batch_size=8)
        keys = []
        for b in pipe:
            assert b["wav"].shape[1] in pipe.bucket_samples
            assert (b["length"] <= b["wav"].shape[1]).all()
            keys += b["keys"]
        assert len(keys) == 32
        assert len(set(keys)) == 32


if __name__ == "__main__":
    pytest.main([__file__, "-x", "-q"])
