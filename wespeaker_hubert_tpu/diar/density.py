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
            min_dist: float, seed: int):
    """Returns (reduced, used_umap)."""
    try:
        import umap  # optional

        return umap.UMAP(
            n_components=n_components,
            metric="cosine",
            n_neighbors=n_neighbors,
            min_dist=min_dist,
            random_state=seed,
            n_jobs=1,
        ).fit_transform(embeddings), True
    except ImportError:
        # Spectral-embedding fallback on the cosine-affinity graph.
        # Dimensionality matters: umap packs the manifold into however
        # many components it is given, but a Laplacian eigenbasis is
        # only informative in its first couple of directions — higher
        # components are noise that DILUTES the density hdbscan needs
        # (measured on separable data: 32 comps -> 90% of points marked
        # noise; even 4 comps collapses a clean 4-speaker set to purity
        # 0.25 while 2 comps + PAHC reaches 0.97).  So the fallback uses
        # a 2-component embedding row-normalized Ng-Jordan-Weiss style
        # (angular density, like umap's cosine metric) and lets the
        # PAHC repair assemble speakers from the over-segmented pieces —
        # DER-pinned against the spectral path on constructed
        # conversations (tests/test_quality_gates.py).
        from sklearn.manifold import SpectralEmbedding

        aff = embeddings / np.linalg.norm(embeddings, axis=1, keepdims=True)
        sim = np.clip(0.5 * (1.0 + aff @ aff.T), 0.0, 1.0)
        n_components = int(np.clip(2, 2, len(embeddings) - 2))
        se = SpectralEmbedding(
            n_components=n_components, affinity="precomputed",
            random_state=seed,
        )
        red = se.fit_transform(sim)
        return (
            red / (np.linalg.norm(red, axis=1, keepdims=True) + 1e-12),
            False,
        )


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

        import inspect

        kw = {}
        if "copy" in inspect.signature(HDBSCAN.__init__).parameters:
            kw["copy"] = True  # silence the sklearn 1.10 default flip
        return HDBSCAN(
            allow_single_cluster=True, min_cluster_size=min_cluster_size,
            **kw,
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
    reduced, used_umap = _reduce(
        embeddings,
        n_components=min(32, len(embeddings) - 2),
        n_neighbors=n_neighbors,
        min_dist=min_dist,
        seed=seed,
    )
    # umap concentrates clusters tightly -> the reference's fixed
    # min_cluster_size 4 (umap_clusterer.py:236-239); the spectral-
    # embedding fallback spreads them, so the floor scales with the
    # recording (bounded so long recordings keep small-speaker
    # sensitivity) — calibration in tests/test_quality_gates.py
    mcs = 4 if used_umap else max(4, min(len(embeddings) // 4, 20))
    labels = _hdbscan_labels(reduced, min_cluster_size=mcs)
    return PAHC(merge_cutoff=0.3, min_cluster_size=3, absorb_cutoff=0.0).fit_predict(
        labels, embeddings
    )
