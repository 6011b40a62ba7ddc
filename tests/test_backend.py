"""Scoring backend tests: metric formulas vs hand-built score sets, and
on-device scoring vs numpy."""

import numpy as np
import pytest

from wespeaker_hubert_tpu.backend import (
    apply_asnorm,
    cohort_mean_std,
    compute_c_norm,
    compute_eer,
    compute_pmiss_pfa,
    cosine_scores,
    eer_from_scores,
    trial_cosine_scores,
)


class TestMetrics:
    def test_eer_separable(self):
        # perfectly separable -> EER ~ 0
        scores = np.concatenate([np.full(100, 0.9), np.full(100, 0.1)])
        labels = np.concatenate([np.ones(100), np.zeros(100)])
        fnr, fpr = compute_pmiss_pfa(scores, labels)
        assert compute_eer(fnr, fpr) < 0.02

    def test_eer_random_is_half(self):
        rng = np.random.default_rng(0)
        scores = rng.standard_normal(20000)
        labels = rng.integers(0, 2, 20000)
        eer, _, _ = eer_from_scores(scores, labels)
        assert 0.47 < eer < 0.53

    def test_eer_known_overlap(self):
        # targets ~ N(1,1), imposters ~ N(-1,1): EER = Phi(-1) ~ 15.87%
        rng = np.random.default_rng(1)
        n = 100000
        scores = np.concatenate(
            [rng.normal(1, 1, n), rng.normal(-1, 1, n)]
        )
        labels = np.concatenate([np.ones(n), np.zeros(n)])
        eer, mindcf, _ = eer_from_scores(scores, labels)
        assert abs(eer - 0.1587) < 0.01
        assert 0 < mindcf <= 1

    def test_c_norm_bounds(self):
        scores = np.concatenate([np.full(50, 0.9), np.full(50, 0.1)])
        labels = np.concatenate([np.ones(50), np.zeros(50)])
        fnr, fpr = compute_pmiss_pfa(scores, labels)
        assert compute_c_norm(fnr, fpr, 0.01) == pytest.approx(0.0, abs=1e-9)


class TestScoring:
    def test_cosine_scores(self):
        rng = np.random.default_rng(0)
        a = rng.standard_normal((10, 16)).astype(np.float32)
        b = rng.standard_normal((10, 16)).astype(np.float32)
        got = np.asarray(cosine_scores(a, b))
        want = np.sum(
            a / np.linalg.norm(a, axis=1, keepdims=True)
            * (b / np.linalg.norm(b, axis=1, keepdims=True)),
            axis=1,
        )
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)

    def test_trial_scores_with_mean(self):
        rng = np.random.default_rng(1)
        emb = rng.standard_normal((20, 8)).astype(np.float32)
        mean = emb.mean(axis=0)
        e_idx = np.array([0, 3, 5])
        t_idx = np.array([1, 4, 6])
        got = trial_cosine_scores(emb, e_idx, t_idx, mean_vec=mean)
        c = emb - mean
        c = c / np.linalg.norm(c, axis=1, keepdims=True)
        want = np.sum(c[e_idx] * c[t_idx], axis=1)
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)

    def test_cohort_mean_std_matches_numpy(self):
        rng = np.random.default_rng(2)
        emb = rng.standard_normal((12, 8)).astype(np.float32)
        cohort = rng.standard_normal((50, 8)).astype(np.float32)
        top_n = 10
        mean, std = cohort_mean_std(emb, cohort, top_n)

        e = emb / np.linalg.norm(emb, axis=1, keepdims=True)
        c = cohort / np.linalg.norm(cohort, axis=1, keepdims=True)
        s = np.sort(e @ c.T, axis=1)[:, ::-1][:, :top_n]
        np.testing.assert_allclose(np.asarray(mean), s.mean(1), rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(std), s.std(1), rtol=1e-3, atol=1e-5)

    def test_asnorm_improves_shifted_cohort(self):
        # AS-Norm should recenter scores; formula check
        scores = np.array([0.5, 0.7])
        e_idx = np.array([0, 1])
        t_idx = np.array([0, 1])
        em = np.array([0.2, 0.3])
        es = np.array([0.1, 0.1])
        tm = np.array([0.1, 0.2])
        ts = np.array([0.2, 0.2])
        got = apply_asnorm(scores, e_idx, t_idx, em, es, tm, ts)
        want = 0.5 * ((scores - em) / es + (scores - tm) / ts)
        np.testing.assert_allclose(got, want)


if __name__ == "__main__":
    pytest.main([__file__, "-x", "-q"])
