"""Embedding storage: the framework's replacement for kaldi ark/scp.

The reference persists embeddings as kaldi ark/scp via kaldiio
(reference: wespeaker/bin/extract.py:90-120, consumed by score.py /
score_norm.py / vector_mean).  Here an embedding set is a single .npz:
  keys: (N,) unicode array — utterance ids
  emb:  (N, D) float32
plus helpers for speaker-level means (reference tools/vector_mean.py).
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import numpy as np

__all__ = [
    "save_embeddings",
    "load_embeddings",
    "embeddings_dict",
    "speaker_means",
]


def save_embeddings(path: str, keys: List[str], emb: np.ndarray) -> None:
    assert len(keys) == len(emb)
    np.savez_compressed(
        path, keys=np.asarray(keys), emb=np.asarray(emb, np.float32)
    )


def load_embeddings(path: str) -> Tuple[List[str], np.ndarray]:
    data = np.load(path, allow_pickle=False)
    return [str(k) for k in data["keys"]], data["emb"]


def embeddings_dict(path: str) -> Dict[str, np.ndarray]:
    keys, emb = load_embeddings(path)
    return dict(zip(keys, emb))


def speaker_means(
    keys: List[str], emb: np.ndarray, utt2spk: Dict[str, str]
) -> Tuple[List[str], np.ndarray]:
    """Average embeddings per speaker (reference tools/vector_mean.py,
    used to build the AS-Norm cohort)."""
    by_spk: Dict[str, list] = {}
    for k, e in zip(keys, emb):
        spk = utt2spk.get(k)
        if spk is not None:
            by_spk.setdefault(spk, []).append(e)
    spks = sorted(by_spk)
    means = np.stack([np.mean(by_spk[s], axis=0) for s in spks])
    return spks, means
