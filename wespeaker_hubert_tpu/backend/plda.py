"""Two-covariance PLDA backend (Kaldi-compatible semantics).

Rebuild of the reference PLDA stack (reference:
wespeaker/utils/plda/two_cov_plda.py — PldaStats.add_samples:47,
em_one_iter:112, get_output:142, log_likelihood_ratio:165, eval_sv:186,
adapt:258 (BUT unsupervised domain adaptation), save/load :311-363; helpers
in plda_utils.py — norm_embeddings:46 kaldi-style sqrt(dim) length norm,
compute_normalizing_transform:81 Cholesky-inverse whitening, sort_svd:90).

Differences by design:
  * model persistence is .npz instead of h5 (no h5py dependency);
  * trial scoring is fully vectorized: embeddings are transformed with one
    matmul and the LLR evaluates over whole trial arrays (the reference
    loops trial lines one by one at two_cov_plda.py:245-256);
  * embeddings come from .npz sets (utils/embeddings.py) not kaldi scp.
EM itself stays numpy: the per-class loop is tiny (num_speakers
iterations over (D, D) solves) and runs once offline.
"""

from __future__ import annotations

import math
from typing import Dict, List, Optional, Tuple

import numpy as np

M_LOG_2PI = 1.8378770664093454835606594728112

__all__ = ["TwoCovPLDA", "norm_embeddings"]


def norm_embeddings(emb: np.ndarray, kaldi_style: bool = True) -> np.ndarray:
    """Unit-length (or sqrt(dim)-length, kaldi-style) normalization."""
    scale = math.sqrt(emb.shape[-1]) if kaldi_style else 1.0
    norms = np.linalg.norm(emb, axis=-1, keepdims=True)
    return scale * emb / np.maximum(norms, 1e-12)


def _normalizing_transform(covar: np.ndarray) -> np.ndarray:
    try:
        c = np.linalg.cholesky(covar)
    except np.linalg.LinAlgError:
        c = np.linalg.cholesky(covar + np.eye(covar.shape[0]) * 1e-6)
    return np.linalg.inv(c)


def _sort_eigh_desc(s, u):
    idx = np.argsort(-s)
    return s[idx], u[:, idx]


class TwoCovPLDA:
    """mu/transform/psi parameterization: `transform` simultaneously
    whitens the within-class and diagonalizes the across-class covariance;
    `psi` is the across-class variance diagonal in that space."""

    def __init__(self, dim: int = 0, normalize_length: bool = False,
                 subtract_train_set_mean: bool = False):
        self.dim = dim
        self.normalize_length = normalize_length
        self.subtract_train_set_mean = subtract_train_set_mean
        self.mu = np.zeros(dim)
        self.transform = np.zeros((dim, dim))
        self.psi = np.zeros(dim)
        self.offset = np.zeros(dim)
        # training state
        self._B = np.eye(dim)
        self._W = np.eye(dim)
        self._class_means: List[np.ndarray] = []
        self._class_counts: List[int] = []
        self._offset_scatter = np.zeros((dim, dim))
        self._sum = np.zeros(dim)

    # ------------------------------------------------------ stats + EM
    def accumulate(self, spk_to_embeddings: Dict[str, np.ndarray]) -> None:
        """Collect per-speaker statistics (reference add_samples:47)."""
        all_vecs = np.vstack([np.asarray(v) for v in spk_to_embeddings.values()])
        train_mean = (
            all_vecs.mean(0)
            if self.subtract_train_set_mean
            else np.zeros(self.dim)
        )
        for vecs in spk_to_embeddings.values():
            mat = np.atleast_2d(np.asarray(vecs, np.float64)) - train_mean
            if self.normalize_length:
                mat = norm_embeddings(mat)
            mean = mat.mean(0)
            diff = mat - mean
            self._offset_scatter += diff.T @ diff
            self._class_means.append(mean)
            self._class_counts.append(len(mat))
            self._sum += mean
        self.mu = self._sum / len(self._class_means)

    def em_one_iter(self) -> None:
        """One EM step (reference em_one_iter:112)."""
        d = self.dim
        n_classes = len(self._class_means)
        b_stats, b_count = np.zeros((d, d)), 0.0
        w_stats = self._offset_scatter.copy()
        w_count = float(sum(self._class_counts) - n_classes)
        global_mean = self._sum / n_classes
        b_inv = np.linalg.inv(self._B)
        w_inv = np.linalg.inv(self._W)
        for mean, n in zip(self._class_means, self._class_counts):
            m = mean - global_mean
            mix_var = np.linalg.inv(b_inv + n * w_inv)
            w = mix_var @ (n * (w_inv @ m))
            m_w = m - w
            b_stats += mix_var + np.outer(w, w)
            b_count += 1.0
            w_stats += n * (mix_var + np.outer(m_w, m_w))
        w_count_total = w_count + n_classes
        self._W = w_stats / w_count_total
        self._B = b_stats / b_count
        self._W = 0.5 * (self._W + self._W.T)
        self._B = 0.5 * (self._B + self._B.T)

    def finalize(self) -> None:
        """Diagonalize into (transform, psi) (reference get_output:142)."""
        n_classes = len(self._class_means)
        self.mu = self._sum / n_classes
        t1 = _normalizing_transform(self._W)
        b_proj = t1 @ self._B @ t1.T
        s, u = np.linalg.eigh(b_proj)
        s = np.where(s > 0.0, s, 0.0)
        s, u = _sort_eigh_desc(s, u)
        self.transform = u.T @ t1
        self.psi = s
        self.offset = -self.transform @ self.mu

    def train(self, spk_to_embeddings: Dict[str, np.ndarray], num_em_iters: int = 5):
        self.accumulate(spk_to_embeddings)
        for _ in range(num_em_iters):
            self.em_one_iter()
        self.finalize()
        return self

    # ------------------------------------------------------ scoring
    def transform_embeddings(self, emb: np.ndarray) -> np.ndarray:
        """Project into the diagonalized space (+ optional kaldi length
        norm) — reference transform_embedding:152, vectorized."""
        emb = np.atleast_2d(np.asarray(emb, np.float64))
        out = emb @ self.transform.T + self.offset
        if self.normalize_length:
            factors = math.sqrt(self.dim) / np.linalg.norm(out, axis=1)
            out = out * factors[:, None]
        return out

    def llr(
        self,
        enroll_t: np.ndarray,
        test_t: np.ndarray,
        counts: Optional[np.ndarray] = None,
    ) -> np.ndarray:
        """Vectorized log-likelihood ratio for row-paired transformed
        embeddings (reference log_likelihood_ratio:165)."""
        enroll_t = np.atleast_2d(enroll_t)
        test_t = np.atleast_2d(test_t)
        n = (
            np.ones(len(enroll_t))
            if counts is None
            else np.asarray(counts, np.float64)
        )[:, None]
        psi = self.psi[None, :]
        mean = n * psi / (n * psi + 1.0) * enroll_t
        var_given = 1.0 + psi / (n * psi + 1.0)
        logdet_given = np.sum(np.log(var_given), axis=1)
        ll_given = -0.5 * (
            logdet_given
            + M_LOG_2PI * self.dim
            + np.sum((test_t - mean) ** 2 / var_given, axis=1)
        )
        var_no = self.psi + 1.0
        logdet_no = np.sum(np.log(var_no))
        ll_no = -0.5 * (
            logdet_no + M_LOG_2PI * self.dim + np.sum(test_t**2 / var_no, axis=1)
        )
        return ll_given - ll_no

    def score_trials(
        self,
        enroll_emb: Dict[str, np.ndarray],
        test_emb: Dict[str, np.ndarray],
        trials: List[Tuple[str, str]],
        multisession_avg: bool = True,
        mean_vec: Optional[np.ndarray] = None,
    ) -> np.ndarray:
        """Score (enroll_key, test_key) trials.  enroll values may be
        (N, D) multi-session stacks — averaged, with counts used in the
        LLR when multisession_avg=False (reference eval_sv:186)."""
        mean_vec = np.zeros(self.dim) if mean_vec is None else mean_vec
        e_keys = sorted(enroll_emb)
        t_keys = sorted(test_emb)
        e_t, counts = {}, {}
        for k in e_keys:
            v = np.atleast_2d(np.asarray(enroll_emb[k])) - mean_vec
            counts[k] = 1 if multisession_avg else len(v)
            m = v.mean(0)
            if self.normalize_length:
                m = norm_embeddings(m)
            e_t[k] = self.transform_embeddings(m)[0]
        t_t = {}
        for k in t_keys:
            v = np.asarray(test_emb[k]) - mean_vec
            if self.normalize_length:
                v = norm_embeddings(v)
            t_t[k] = self.transform_embeddings(v)[0]
        enroll_arr = np.stack([e_t[a] for a, _ in trials])
        test_arr = np.stack([t_t[b] for _, b in trials])
        n_arr = np.asarray([counts[a] for a, _ in trials], np.float64)
        return self.llr(enroll_arr, test_arr, n_arr)

    # ------------------------------------------------------ adaptation
    def adapt(
        self, adapt_data: np.ndarray, ac_scale: float = 0.5, wc_scale: float = 0.5
    ) -> "TwoCovPLDA":
        """Unsupervised domain adaptation (BUT recipe, reference adapt:258):
        excess variance of the adaptation data over the total covariance is
        split into across/within parts by ac_scale/wc_scale."""
        import scipy.linalg as spl

        adp = np.asarray(adapt_data, np.float64)
        mean_vec = adp.mean(0)
        adp = adp - mean_vec
        if self.normalize_length:
            adp = norm_embeddings(adp)

        w = np.linalg.inv(self.transform.T @ self.transform)
        w = (w + w.T) / 2
        b = np.linalg.inv((self.transform.T / self.psi) @ self.transform)
        b = (b + b.T) / 2
        t = b + w
        data_cov = np.cov(adp.T)
        v, e = spl.eigh(data_cov, (t + t.T) / 2)
        iet = np.linalg.inv(e.T)
        excess = iet[:, v > 1] @ np.diag(np.sqrt(v[v > 1] - 1))
        b_adp = b + (excess * math.sqrt(ac_scale)) @ (excess * math.sqrt(ac_scale)).T
        w_adp = w + (excess * math.sqrt(wc_scale)) @ (excess * math.sqrt(wc_scale)).T
        mu_adp = adp.mean(0) + mean_vec  # == mean of raw adaptation data

        a = (b_adp + b_adp.T) / 2
        bb = (w_adp + w_adp.T) / 2
        eps = 1e-9
        d_eig, v_eig = np.linalg.eigh(bb)
        t1 = np.diag(1.0 / np.sqrt(d_eig + eps)) @ v_eig.T
        a1 = t1 @ a @ t1.T
        d2, t2 = np.linalg.eigh(a1)
        t_joint = t2.T @ t1
        a2 = t_joint @ a @ t_joint.T

        out = TwoCovPLDA(self.dim, self.normalize_length,
                         self.subtract_train_set_mean)
        out.mu = mu_adp
        out.transform = t_joint
        out.psi = np.diag(a2).copy()
        out.offset = -out.transform @ out.mu
        return out

    # ------------------------------------------------------ persistence
    def save(self, path: str) -> None:
        np.savez(
            path,
            mu=self.mu,
            transform=self.transform,
            psi=self.psi,
            offset=self.offset,
            normalize_length=int(self.normalize_length),
            subtract_train_set_mean=int(self.subtract_train_set_mean),
        )

    @staticmethod
    def load(path: str) -> "TwoCovPLDA":
        data = np.load(path)
        plda = TwoCovPLDA(
            dim=len(data["mu"]),
            normalize_length=bool(data["normalize_length"]),
            subtract_train_set_mean=bool(data["subtract_train_set_mean"]),
        )
        plda.mu = data["mu"]
        plda.transform = data["transform"]
        plda.psi = data["psi"]
        plda.offset = data["offset"]
        return plda
