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
    impl: str = "auto",
) -> List[int]:
    """Cluster (N, D) subsegment embeddings into speaker labels.

    impl: 'host' (numpy/scipy/sklearn — the reference-exact path),
    'device' (jax: cosine matrix, p-prune, Laplacian, eigh and the
    eigengap all on the accelerator — hour-scale recordings put
    thousands of windows through an O(N^3) eigh, which is dense linear
    algebra the chip does in milliseconds), or 'auto' (device above
    2,000 windows when an accelerator is present AND num_spks is
    fixed).  'auto' never routes the eigengap speaker-count ESTIMATE
    to the device: the estimate compares adjacent f32 eigenvalues from
    a different eigensolver and can flip on near-degenerate gaps,
    which would silently change the speaker count vs the host path —
    pass impl='device' to opt in explicitly for estimation too."""
    from sklearn.cluster import KMeans

    embeddings = np.asarray(embeddings)
    if len(embeddings) <= 2:
        return [0] * len(embeddings)

    use_device = impl == "device"
    if impl == "auto" and num_spks is not None and len(embeddings) >= 2000:
        import jax

        use_device = jax.default_backend() not in ("cpu",)
    if use_device:
        spectral_emb, k = _spectral_embedding_device(
            embeddings, p, num_spks, min_num_spks, max_num_spks
        )
    else:
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


def _spectral_embedding_device(
    embeddings: np.ndarray,
    p: float,
    num_spks: Optional[int],
    min_num_spks: int,
    max_num_spks: int,
):
    """The spectral pipeline on the accelerator via jax: one dispatch for
    similarity -> prune -> Laplacian -> eigh; only the (N, k) spectral
    embedding returns to host for (tiny) k-means.  Numerically it mirrors
    the host path (same prune rule, unnormalized Laplacian, ascending
    eigh); eigenvector sign/rotation may differ between LAPACK and the
    device solver, which k-means is invariant to."""
    import jax
    import jax.numpy as jnp

    n = len(embeddings)
    # match the host _prune exactly: zero the n_zero smallest per row and
    # one the rest, n_zero = N-10 below 1000 rows else (1-p)*N
    n_zero = max(n - 10, 2) if n < 1000 else int((1.0 - p) * n)

    @jax.jit
    def pipeline(m):
        m = m / jnp.linalg.norm(m, axis=1, keepdims=True)
        sim = 0.5 * (1.0 + m @ m.T)
        order = jnp.argsort(sim, axis=1)
        out = jnp.zeros_like(sim)
        rows = jnp.arange(n)[:, None]
        out = out.at[rows, order[:, n_zero:]].set(1.0)
        out = 0.5 * (out + out.T)
        out = out.at[jnp.diag_indices(n)].set(0.0)
        lap = jnp.diag(jnp.sum(jnp.abs(out), axis=1)) - out
        return jnp.linalg.eigh(lap)

    eig_values, eig_vectors = pipeline(jnp.asarray(embeddings, jnp.float32))
    eig_values = np.asarray(eig_values)
    k = (
        num_spks
        if num_spks is not None
        else int(np.argmax(np.diff(eig_values[: max_num_spks + 1])) + 1)
    )
    k = max(k, min_num_spks)
    return np.asarray(eig_vectors[:, :k]), k
