"""On-device trial scoring: cosine + AS-Norm/S-Norm as batched matmuls.

TPU-first redesign of the reference's scoring stage: instead of per-line
python cosine (reference: wespeaker/bin/score.py:54-72 loops trial lines
through sklearn cosine_similarity) and numpy cohort sort
(reference: wespeaker/bin/score_norm.py:26-36), the whole trial list is
scored as gathers + one normalized matmul on the MXU, and the cohort
top-N selection is jax.lax.top_k on device.  Score files & EER math stay
host-side (backend/metrics.py).

The cohort statistics match reference get_mean_std exactly: normalize,
emb @ cohort.T, take top_n scores, mean/std (population std, ddof=0).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "l2_normalize",
    "cosine_scores",
    "trial_cosine_scores",
    "cohort_mean_std",
    "apply_asnorm",
]


def l2_normalize(x, axis=-1, eps=1e-12):
    return x / jnp.maximum(jnp.linalg.norm(x, axis=axis, keepdims=True), eps)


@jax.jit
def cosine_scores(enroll: jax.Array, test: jax.Array) -> jax.Array:
    """Row-paired cosine similarity: (N, D), (N, D) -> (N,)."""
    e = l2_normalize(enroll.astype(jnp.float32))
    t = l2_normalize(test.astype(jnp.float32))
    return jnp.sum(e * t, axis=-1)


def trial_cosine_scores(
    embeddings: jax.Array,
    enroll_idx: jax.Array,
    test_idx: jax.Array,
    mean_vec: Optional[jax.Array] = None,
    batch_size: int = 1_000_000,
) -> np.ndarray:
    """Score a trial list against an embedding matrix.

    embeddings: (U, D) all unique utterance embeddings;
    enroll_idx/test_idx: (N,) int32 rows per trial.  The train-set mean
    subtraction mirrors reference score.py:42-52.
    """
    emb = jnp.asarray(embeddings, jnp.float32)
    if mean_vec is not None:
        emb = emb - jnp.asarray(mean_vec, jnp.float32)
    emb = l2_normalize(emb)

    @jax.jit
    def _score(e_idx, t_idx):
        return jnp.sum(emb[e_idx] * emb[t_idx], axis=-1)

    out = []
    n = len(enroll_idx)
    for s in range(0, n, batch_size):
        out.append(
            np.asarray(
                _score(
                    jnp.asarray(enroll_idx[s : s + batch_size]),
                    jnp.asarray(test_idx[s : s + batch_size]),
                )
            )
        )
    return np.concatenate(out) if out else np.zeros((0,), np.float32)


def cohort_mean_std(
    emb: jax.Array, cohort: jax.Array, top_n: int, mesh=None
) -> Tuple[jax.Array, jax.Array]:
    """Per-embedding mean/std of its top-N cohort cosine scores
    (reference score_norm.py:26-36).  S-Norm = top_n == len(cohort);
    top_n is clamped to the cohort size.

    With a mesh, embedding rows are sharded over the 'data' axis and the
    cohort is replicated, so the (N, M) score matmul and top-k run
    data-parallel across chips (the multi-GPU fan-out of the reference's
    tools/extract_embedding.sh applied to scoring)."""
    top_n = min(top_n, cohort.shape[0])
    if mesh is None:
        return _cohort_mean_std(emb, cohort, top_n)
    from ..parallel.mesh import DATA_AXIS, batch_sharding, replicated

    emb = jnp.asarray(emb)
    n = emb.shape[0]
    d = mesh.shape[DATA_AXIS]
    pad = (-n) % d
    if pad:
        emb = jnp.concatenate(
            [emb, jnp.zeros((pad, emb.shape[1]), emb.dtype)]
        )
    fn = jax.jit(
        functools.partial(_cohort_mean_std.__wrapped__, top_n=top_n),
        in_shardings=(batch_sharding(mesh), replicated(mesh)),
        out_shardings=replicated(mesh),
    )
    mean, std = fn(emb, jnp.asarray(cohort))
    return mean[:n], std[:n]


@functools.partial(jax.jit, static_argnames=("top_n",))
def _cohort_mean_std(
    emb: jax.Array, cohort: jax.Array, top_n: int
) -> Tuple[jax.Array, jax.Array]:
    e = l2_normalize(emb.astype(jnp.float32))
    c = l2_normalize(cohort.astype(jnp.float32))
    scores = jnp.dot(e, c.T, preferred_element_type=jnp.float32)  # (N, M)
    top, _ = jax.lax.top_k(scores, top_n)
    mean = jnp.mean(top, axis=1)
    std = jnp.std(top, axis=1)
    return mean, std


def apply_asnorm(
    scores: np.ndarray,
    enroll_idx: np.ndarray,
    test_idx: np.ndarray,
    enroll_mean: np.ndarray,
    enroll_std: np.ndarray,
    test_mean: np.ndarray,
    test_std: np.ndarray,
) -> np.ndarray:
    """AS-Norm: 0.5 * ((s - mu_e)/sig_e + (s - mu_t)/sig_t)
    (reference score_norm.py:96-101)."""
    s = np.asarray(scores, np.float64)
    em = np.asarray(enroll_mean)[enroll_idx]
    es = np.maximum(np.asarray(enroll_std)[enroll_idx], 1e-8)
    tm = np.asarray(test_mean)[test_idx]
    ts = np.maximum(np.asarray(test_std)[test_idx], 1e-8)
    return 0.5 * ((s - em) / es + (s - tm) / ts)
