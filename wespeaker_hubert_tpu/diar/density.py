"""Density-based clustering path (reference umap_clusterer.py:224-244:
UMAP -> HDBSCAN -> PAHC).

The umap package is optional; when unavailable the dimensionality
reduction falls back to a cosine-metric spectral embedding (normalized-
Laplacian eigenvectors), which plays the same role of pulling the
embedding manifold apart before density clustering.  HDBSCAN comes from
sklearn (sklearn.cluster.HDBSCAN) when the hdbscan package is absent.
"""

from __future__ import annotations

from typing import List

import numpy as np

from .pahc import PAHC

__all__ = ["cluster"]


def _reduce(embeddings: np.ndarray, n_components: int, n_neighbors: int,
            min_dist: float, seed: int) -> np.ndarray:
    try:
        import umap  # optional

        return umap.UMAP(
            n_components=n_components,
            metric="cosine",
            n_neighbors=n_neighbors,
            min_dist=min_dist,
            random_state=seed,
            n_jobs=1,
        ).fit_transform(embeddings)
    except ImportError:
        # spectral embedding fallback on the cosine-affinity graph
        from sklearn.manifold import SpectralEmbedding

        aff = embeddings / np.linalg.norm(embeddings, axis=1, keepdims=True)
        sim = np.clip(0.5 * (1.0 + aff @ aff.T), 0.0, 1.0)
        n_components = min(n_components, len(embeddings) - 2)
        se = SpectralEmbedding(
            n_components=n_components, affinity="precomputed",
            random_state=seed,
        )
        return se.fit_transform(sim)


def _hdbscan_labels(reduced: np.ndarray, min_cluster_size: int) -> np.ndarray:
    try:
        import hdbscan  # optional

        return hdbscan.HDBSCAN(
            allow_single_cluster=True,
            min_cluster_size=min_cluster_size,
            approx_min_span_tree=False,
            core_dist_n_jobs=1,
        ).fit_predict(reduced)
    except ImportError:
        from sklearn.cluster import HDBSCAN

        return HDBSCAN(
            allow_single_cluster=True, min_cluster_size=min_cluster_size
        ).fit_predict(reduced)


def cluster(
    embeddings: np.ndarray,
    n_neighbors: int = 16,
    min_dist: float = 0.05,
    seed: int = 2023,
) -> List[int]:
    embeddings = np.asarray(embeddings)
    # below HDBSCAN's min_cluster_size/min_samples floor (4) there is
    # nothing to cluster — short recordings yield a single speaker
    # instead of a min_samples ValueError
    if len(embeddings) <= 4:
        return [0] * len(embeddings)
    reduced = _reduce(
        embeddings,
        n_components=min(32, len(embeddings) - 2),
        n_neighbors=n_neighbors,
        min_dist=min_dist,
        seed=seed,
    )
    labels = _hdbscan_labels(reduced, min_cluster_size=4)
    return PAHC(merge_cutoff=0.3, min_cluster_size=3, absorb_cutoff=0.0).fit_predict(
        labels, embeddings
    )
