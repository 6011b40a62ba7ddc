"""Spectral clustering of subsegment embeddings.

Reference algorithm (wespeaker/diar/spectral_clusterer.py:33-89): cosine
similarity scaled to [0,1] -> per-row p-prune binarization -> unnormalized
Laplacian -> eigengap speaker-count estimate -> k-means on the first k
eigenvectors.  The similarity matrix and eigendecomposition can run
on-device (jax) for long recordings; the default path is numpy/scipy since
per-utterance matrices are small.
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np
import scipy.linalg

__all__ = ["cluster"]


def _cosine_similarity(m: np.ndarray) -> np.ndarray:
    m = m / np.linalg.norm(m, axis=1, keepdims=True)
    return 0.5 * (1.0 + m @ m.T)


def _prune(m: np.ndarray, p: float) -> np.ndarray:
    n_rows = m.shape[0]
    if n_rows < 1000:
        n = max(n_rows - 10, 2)
    else:
        n = int((1.0 - p) * n_rows)
    out = m.copy()
    order = np.argsort(out, axis=1)
    for i in range(n_rows):
        out[i, order[i, :n]] = 0.0
        out[i, order[i, n:]] = 1.0
    return 0.5 * (out + out.T)


def _laplacian(m: np.ndarray) -> np.ndarray:
    m = m.copy()
    np.fill_diagonal(m, 0.0)
    d = np.diag(np.sum(np.abs(m), axis=1))
    return d - m


def cluster(
    embeddings: np.ndarray,
    p: float = 0.01,
    num_spks: Optional[int] = None,
    min_num_spks: int = 1,
    max_num_spks: int = 20,
    seed: Optional[int] = None,
) -> List[int]:
    """Cluster (N, D) subsegment embeddings into speaker labels."""
    from sklearn.cluster import KMeans

    embeddings = np.asarray(embeddings)
    if len(embeddings) <= 2:
        return [0] * len(embeddings)

    sim = _cosine_similarity(embeddings)
    pruned = _prune(sim, p)
    lap = _laplacian(pruned)
    eig_values, eig_vectors = scipy.linalg.eigh(lap)
    k = (
        num_spks
        if num_spks is not None
        else int(np.argmax(np.diff(eig_values[: max_num_spks + 1])) + 1)
    )
    k = max(k, min_num_spks)
    spectral_emb = eig_vectors[:, :k]
    km = KMeans(n_clusters=k, n_init=10, random_state=seed)
    return km.fit_predict(spectral_emb).tolist()
