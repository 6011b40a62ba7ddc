"""Multi-chip evaluation fan-out (VERDICT r1 #7): sharded embedding
extraction and data-parallel AS-Norm cohort statistics over the 8-device
virtual mesh must match the single-device results exactly.

Reference equivalents: tools/extract_embedding.sh:40-66 (nj x GPU
extraction fan-out), bin/score_norm.py:26-36 (cohort stats)."""

import json
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from wespeaker_hubert_tpu.backend.score import cohort_mean_std
from wespeaker_hubert_tpu.bin.extract import extract
from wespeaker_hubert_tpu.bin.score import score_norm
from wespeaker_hubert_tpu.data import write_wav
from wespeaker_hubert_tpu.parallel.mesh import make_mesh
from wespeaker_hubert_tpu.utils.checkpoint import save_checkpoint
from wespeaker_hubert_tpu.utils.embeddings import save_embeddings

CONFIG = {
    "model": "ECAPA_TDNN_c512",
    "model_args": {"feat_dim": 40, "embed_dim": 16},
    "dataset_args": {"fbank_args": {"num_mel_bins": 40}},
}


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    root = tmp_path_factory.mktemp("mc_eval")
    from wespeaker_hubert_tpu.bin.train import build_speaker_net

    net = build_speaker_net(CONFIG, num_class=2)
    v = net.init(
        jax.random.key(0), jnp.zeros((1, 100, 40)), jnp.zeros((1,), jnp.int32),
        0.0, train=False,
    )
    ckpt = str(root / "model.ckpt")
    save_checkpoint(ckpt, {
        "params": v["params"],
        "batch_stats": v.get("batch_stats", {}),
    })

    rng = np.random.default_rng(0)
    entries = []
    for i in range(10):  # 10 utts: with batch_size=4 the tail pads
        p = str(root / f"u{i}.wav")
        write_wav(p, (rng.standard_normal(
            int(rng.integers(16000, 32000))) * 0.1).clip(-1, 1))
        entries.append({"key": f"u{i}", "wav": p})
    lst = str(root / "eval.list")
    with open(lst, "w") as f:
        for e in entries:
            f.write(json.dumps(e) + "\n")
    return {"root": root, "ckpt": ckpt, "list": lst}


def test_sharded_extract_matches_single(corpus, tmp_path):
    assert len(jax.devices()) == 8
    k1, e1 = extract(
        dict(CONFIG), corpus["list"], corpus["ckpt"],
        str(tmp_path / "single.npz"), batch_size=4,
    )
    k8, e8 = extract(
        dict(CONFIG), corpus["list"], corpus["ckpt"],
        str(tmp_path / "sharded.npz"), batch_size=4, sharded=True,
    )
    assert k1 == k8
    np.testing.assert_allclose(e8, e1, rtol=0, atol=2e-5)


def test_cohort_mean_std_mesh_parity():
    rng = np.random.default_rng(3)
    emb = jnp.asarray(rng.standard_normal((13, 24)), jnp.float32)
    cohort = jnp.asarray(rng.standard_normal((50, 24)), jnp.float32)
    mean0, std0 = cohort_mean_std(emb, cohort, 10)
    mesh = make_mesh(model_parallel=1)
    mean8, std8 = cohort_mean_std(emb, cohort, 10, mesh=mesh)
    np.testing.assert_allclose(np.asarray(mean8), np.asarray(mean0),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(std8), np.asarray(std0), atol=1e-6)


def test_score_norm_sharded_file_parity(tmp_path):
    rng = np.random.default_rng(5)
    dim = 12
    keys = [f"u{i}" for i in range(9)]
    emb = rng.standard_normal((9, dim)).astype(np.float32)
    ckeys = [f"c{i}" for i in range(30)]
    cohort = rng.standard_normal((30, dim)).astype(np.float32)
    eval_npz = str(tmp_path / "eval.npz")
    cohort_npz = str(tmp_path / "cohort.npz")
    save_embeddings(eval_npz, keys, emb)
    save_embeddings(cohort_npz, ckeys, cohort)
    score_file = str(tmp_path / "raw.score")
    with open(score_file, "w") as f:
        for i in range(9):
            for j in range(i + 1, 9):
                f.write(f"u{i} u{j} {rng.uniform(-1, 1):.5f} target\n")
    out1 = score_norm(score_file, str(tmp_path / "a.score"),
                      eval_npz, cohort_npz, top_n=8)
    out8 = score_norm(score_file, str(tmp_path / "b.score"),
                      eval_npz, cohort_npz, top_n=8, sharded=True)
    assert open(out1).read() == open(out8).read()


if __name__ == "__main__":
    pytest.main([__file__, "-x", "-q"])
