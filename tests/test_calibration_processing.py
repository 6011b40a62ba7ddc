"""QMF calibration + embedding-processing-chain tests."""

import numpy as np
import pytest

from wespeaker_hubert_tpu.backend.calibration import (
    apply_calibration,
    cllr,
    gather_factors,
    reorder_values,
    train_calibration,
)
from wespeaker_hubert_tpu.backend.processing import (
    EmbeddingProcessingChain,
    parse_chain_string,
)


class TestCalibration:
    def test_reorder_values(self):
        assert reorder_values(2.0, 4.0) == [2.0, 4.0, 2.0, 2.0]
        assert reorder_values(4.0, 2.0) == [2.0, 4.0, 2.0, 2.0]

    def test_cllr_perfect_scores(self):
        # strongly separated LLRs -> cllr ~ 0; zeros -> cllr = 1 bit
        assert cllr(np.full(10, 20.0), np.full(10, -20.0)) < 1e-6
        assert cllr(np.zeros(10), np.zeros(10)) == pytest.approx(1.0)

    def test_training_improves_cllr(self):
        rng = np.random.default_rng(0)
        n = 2000
        # informative score + 2 quality features (one useful, one noise)
        t_score = rng.normal(2.0, 1.0, n)
        n_score = rng.normal(-2.0, 1.0, n)
        t_q = rng.normal(1.0, 0.5, n)
        n_q = rng.normal(0.0, 0.5, n)
        xt = np.stack([t_score, t_q, rng.normal(size=n)], 1)
        xn = np.stack([n_score, n_q, rng.normal(size=n)], 1)
        x = np.concatenate([xt, xn])
        y = np.concatenate([np.ones(n), np.zeros(n)])

        params, final = train_calibration(x, y)
        base = cllr(xt.sum(1) / 3, xn.sum(1) / 3)  # init = mean of factors
        assert final < base
        out = apply_calibration(params, x)
        # calibrated scores separate classes
        assert out[:n].mean() > out[n:].mean() + 1.0

    def test_gather_factors(self):
        lines = [
            "e1 t1 1.50000 target 10.0 12.0 0.30 0.20",
            "e2 t2 -0.80000 nontarget 8.0 9.0 0.10 0.40",
        ]
        durs = {"e1": 3.0, "t1": 5.0, "e2": 30.0, "t2": 2.0}
        factors, meta = gather_factors(lines, durations=durs, max_dur=20.0)
        assert factors.shape == (2, 1 + 4 + 4 + 4)
        assert meta[0] == ("e1", "t1", "target")
        assert factors[0, 0] == pytest.approx(1.5)
        # durations capped at max_dur
        assert factors[1, 1] == pytest.approx(2.0)
        assert factors[1, 2] == pytest.approx(20.0)


class TestProcessingChain:
    def test_parse(self):
        spec = parse_chain_string(
            "mean-subtract --scp a.scp | length-norm | lda --dim 8"
        )
        assert spec[0][0] == "mean-subtract"
        assert spec[1] == ["length-norm", {}]
        assert spec[2] == ["lda", {"dim": "8"}]

    def _data(self, d=16, n_spk=10, n_utt=20):
        rng = np.random.default_rng(0)
        centers = rng.standard_normal((n_spk, d)) * 3 + 5.0
        keys, embs, utt2spk = [], [], {}
        for s in range(n_spk):
            for u in range(n_utt):
                k = f"s{s}u{u}"
                keys.append(k)
                utt2spk[k] = f"s{s}"
                embs.append(centers[s] + rng.standard_normal(d))
        return keys, np.stack(embs), utt2spk

    def test_mean_lengthnorm(self):
        keys, embs, utt2spk = self._data()
        chain = EmbeddingProcessingChain().fit(
            "mean-subtract | length-norm", embs
        )
        out = chain(embs)
        np.testing.assert_allclose(
            np.linalg.norm(out, axis=1), 1.0, atol=1e-9
        )

    def test_lda_improves_separation(self):
        keys, embs, utt2spk = self._data()
        chain = EmbeddingProcessingChain().fit(
            "mean-subtract | length-norm | lda --dim 6 | length-norm",
            embs, utt2spk=utt2spk, keys=keys,
        )
        out = chain(embs)
        assert out.shape == (len(keys), 6)

        def fisher(x):
            labs = np.asarray([utt2spk[k] for k in keys])
            means = np.stack([x[labs == s].mean(0) for s in set(labs)])
            within = np.mean([x[labs == s].var(0).sum() for s in set(labs)])
            between = means.var(0).sum()
            return between / within

        base = chain.links[1][1](embs - embs.mean(0))
        assert fisher(out) > fisher(base[:, :6])

    def test_whitening(self):
        keys, embs, utt2spk = self._data()
        chain = EmbeddingProcessingChain().fit("whitening", embs)
        out = chain(embs)
        cov = np.cov(out, rowvar=False, bias=True)
        np.testing.assert_allclose(cov, np.eye(cov.shape[0]), atol=1e-6)

    def test_save_load_roundtrip(self, tmp_path):
        keys, embs, utt2spk = self._data()
        chain = EmbeddingProcessingChain().fit(
            "mean-subtract | length-norm | lda --dim 4",
            embs, utt2spk=utt2spk, keys=keys,
        )
        p = str(tmp_path / "chain.npz")
        chain.save(p)
        loaded = EmbeddingProcessingChain.load(p)
        np.testing.assert_allclose(chain(embs), loaded(embs), atol=1e-12)


if __name__ == "__main__":
    pytest.main([__file__, "-x", "-q"])


class TestEmbdProcBins:
    def test_prep_apply_update(self, tmp_path):
        from wespeaker_hubert_tpu.bin.embd_proc import (
            apply_chain,
            prep_chain,
            update_chain,
        )
        from wespeaker_hubert_tpu.utils.embeddings import (
            load_embeddings,
            save_embeddings,
        )

        rng = np.random.default_rng(0)
        keys = [f"u{i}" for i in range(40)]
        emb = (rng.standard_normal((40, 8)) + 3.0).astype(np.float32)
        emb_path = str(tmp_path / "emb.npz")
        save_embeddings(emb_path, keys, emb)
        with open(tmp_path / "utt2spk", "w") as f:
            for i, k in enumerate(keys):
                f.write(f"{k} s{i % 4}\n")

        chain_path = str(tmp_path / "chain.npz")
        prep_chain(
            "mean-subtract | length-norm", emb_path, chain_path,
            utt2spk=str(tmp_path / "utt2spk"),
        )
        out_path = str(tmp_path / "out.npz")
        n = apply_chain(chain_path, emb_path, out_path)
        assert n == 40
        _, out = load_embeddings(out_path)
        np.testing.assert_allclose(np.linalg.norm(out, axis=1), 1.0, atol=1e-5)

        # update: refit mean on shifted domain
        emb2 = emb + 10.0
        emb2_path = str(tmp_path / "emb2.npz")
        save_embeddings(emb2_path, keys, emb2)
        chain2_path = str(tmp_path / "chain2.npz")
        update_chain(chain_path, emb2_path, chain2_path)
        apply_chain(chain2_path, emb2_path, out_path)
        _, out2 = load_embeddings(out_path)
        np.testing.assert_allclose(
            np.linalg.norm(out2, axis=1), 1.0, atol=1e-5
        )
