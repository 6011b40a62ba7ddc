"""Diarization tests: subsegmentation math, spectral + density clustering
on separable synthetic embeddings, PAHC repair, RTTM merge, DER metric."""

import numpy as np
import pytest

from wespeaker_hubert_tpu.diar import (
    PAHC,
    density_cluster,
    der,
    der_details,
    energy_vad,
    merge_segments,
    oracle_sad,
    parse_subseg_id,
    read_rttm,
    spectral_cluster,
    subsegment_fbank,
    write_rttm,
)


def _clusters(rng, n_spk=3, n_per=30, d=32, spread=0.15):
    centers = rng.standard_normal((n_spk, d))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    embs, labels = [], []
    for i in range(n_spk):
        e = centers[i] + rng.standard_normal((n_per, d)) * spread
        embs.append(e)
        labels += [i] * n_per
    return np.concatenate(embs), np.asarray(labels)


def _purity(pred, true):
    pred = np.asarray(pred)
    acc = 0
    for lab in np.unique(pred):
        members = true[pred == lab]
        acc += np.bincount(members).max()
    return acc / len(true)


class TestSubsegment:
    def test_long_segment_windows(self):
        fbank = np.random.default_rng(0).standard_normal((448, 80)).astype(
            np.float32
        )
        # 4.5 s segment: id length 450 frames
        subsegs, mats = subsegment_fbank(fbank, "utt1-00001000-00005500")
        assert all(m.shape == (150, 80) for m in mats)
        assert len(subsegs) == 5  # range(0, 450-150+75, 75) = 0,75,...,300
        utt, b, e = parse_subseg_id(subsegs[0])
        assert utt == "utt1"
        assert b == pytest.approx(1.0)
        assert e == pytest.approx(2.5)

    def test_short_segment_tiled(self):
        fbank = np.ones((48, 80), np.float32)
        subsegs, mats = subsegment_fbank(fbank, "u-00000000-00000500")
        assert len(subsegs) == 1
        assert mats[0].shape == (150, 80)


class TestClustering:
    def test_spectral_recovers_speakers(self):
        rng = np.random.default_rng(0)
        emb, true = _clusters(rng)
        labels = spectral_cluster(emb, seed=0)
        assert len(set(labels)) == 3
        assert _purity(labels, true) > 0.95

    def test_spectral_fixed_k(self):
        rng = np.random.default_rng(1)
        emb, true = _clusters(rng, n_spk=4)
        labels = spectral_cluster(emb, num_spks=4, seed=0)
        assert len(set(labels)) == 4
        assert _purity(labels, true) > 0.9

    def test_trivial(self):
        assert spectral_cluster(np.zeros((2, 8))) == [0, 0]

    def test_density_cluster(self):
        rng = np.random.default_rng(2)
        emb, true = _clusters(rng, n_per=40, spread=0.1)
        labels = density_cluster(emb)
        assert _purity(labels, true) > 0.9

    def test_density_tiny_inputs_single_speaker(self):
        # below HDBSCAN's min_samples floor: one speaker, not a crash
        rng = np.random.default_rng(4)
        for n in (1, 2, 3, 4):
            assert density_cluster(
                rng.standard_normal((n, 16))
            ) == [0] * n


class TestPAHC:
    def test_non_contiguous_labels(self):
        # public API: gaps in the labeling (e.g. HDBSCAN output filtered
        # upstream) must not collide with the noise renumbering
        rng = np.random.default_rng(5)
        emb, _ = _clusters(rng, n_spk=2, n_per=3, spread=0.05)
        out = PAHC(merge_cutoff=0.3).fit_predict(
            [0, 0, 2, 2, -1, -1], emb
        )
        assert len(out) == 6 and min(out) >= 0

    def test_merges_unlabeled_singletons(self):
        rng = np.random.default_rng(3)
        emb, true = _clusters(rng, n_spk=2, n_per=10, spread=0.05)
        labels = list(true.copy())
        labels[0] = -1
        labels[10] = -1  # one unlabeled point per cluster
        out = PAHC(merge_cutoff=0.3).fit_predict(labels, emb)
        # unlabeled points must join their true cluster
        assert out[0] == out[1]
        assert out[10] == out[11]
        assert len(set(out)) == 2


class TestRttm:
    def test_merge_segments(self):
        utt_labels = {
            "u": [
                (0.0, 1.5, "A"),
                (0.75, 2.25, "A"),   # contiguous same label -> extend
                (2.0, 3.5, "B"),     # overlap different label -> midpoint
                (5.0, 6.0, "B"),     # gap -> new segment
            ]
        }
        merged = merge_segments(utt_labels)
        assert merged[0][3] == "A"
        assert merged[0][1] == 0.0
        assert merged[0][2] == pytest.approx((2.0 + 2.25) / 2)
        assert merged[1][3] == "B"
        assert merged[-1] == ("u", 5.0, 6.0, "B")

    def test_rttm_roundtrip(self, tmp_path):
        segs = [("u1", 0.0, 1.5, "spk0"), ("u1", 2.0, 4.0, "spk1")]
        p = str(tmp_path / "x.rttm")
        write_rttm(p, segs)
        turns = read_rttm(p)
        assert turns["u1"][0] == (0.0, 1.5, "spk0")
        assert turns["u1"][1][1] == pytest.approx(4.0)


class TestDER:
    def test_perfect_match(self):
        ref = {"u": [(0.0, 10.0, "A"), (12.0, 20.0, "B")]}
        assert der(ref, ref, collar=0.25) == pytest.approx(0.0)

    def test_label_permutation_is_free(self):
        ref = {"u": [(0.0, 10.0, "A"), (12.0, 20.0, "B")]}
        hyp = {"u": [(0.0, 10.0, "x9"), (12.0, 20.0, "x7")]}
        assert der(ref, hyp, collar=0.0) == pytest.approx(0.0)

    def test_hyp_only_utterance_is_false_alarm(self):
        # an utt present only in the hypothesis is pure FA, not ignored
        ref = {"u1": [(0.0, 10.0, "A")]}
        hyp = {"u1": [(0.0, 10.0, "A")], "u2": [(0.0, 100.0, "B")]}
        from wespeaker_hubert_tpu.diar.der import der_details

        d = der_details(ref, hyp, collar=0.0)
        assert d["fa"] == pytest.approx(100.0)
        assert d["der"] == pytest.approx(10.0)

    def test_empty_reference_defined(self):
        from wespeaker_hubert_tpu.diar.der import der_details

        d = der_details({"u": []}, {"u": [(0.0, 5.0, "a")]}, collar=0.0)
        assert d["total"] == 0.0 and d["der"] == float("inf")
        d = der_details({"u": []}, {"u": []}, collar=0.0)
        assert d["der"] == 0.0

    def test_miss_and_fa(self):
        ref = {"u": [(0.0, 10.0, "A")]}
        hyp = {"u": [(0.0, 5.0, "A")]}
        d = der_details(ref, hyp, collar=0.0)
        assert d["miss"] == pytest.approx(5.0)
        assert d["fa"] == pytest.approx(0.0)
        assert d["der"] == pytest.approx(0.5)

        hyp2 = {"u": [(0.0, 15.0, "A")]}
        d2 = der_details(ref, hyp2, collar=0.0)
        assert d2["fa"] == pytest.approx(5.0)

    def test_confusion_with_mapping(self):
        ref = {"u": [(0.0, 10.0, "A"), (10.0, 20.0, "B")]}
        # hyp swaps the second half of B to a third speaker
        hyp = {"u": [(0.0, 10.0, "1"), (10.0, 15.0, "2"), (15.0, 20.0, "3")]}
        d = der_details(ref, hyp, collar=0.0)
        assert d["confusion"] == pytest.approx(5.0)
        assert d["der"] == pytest.approx(0.25)

    def test_collar_forgives_boundaries(self):
        ref = {"u": [(0.0, 10.0, "A")]}
        hyp = {"u": [(0.2, 9.8, "A")]}  # boundary error within 0.25 collar
        assert der(ref, hyp, collar=0.25) == pytest.approx(0.0)
        assert der(ref, hyp, collar=0.0) > 0


class TestSAD:
    def test_oracle(self):
        turns = {"u": [(0.0, 1.0, "A"), (0.5, 2.0, "B"), (5.0, 5.1, "A")]}
        sad = oracle_sad(turns, min_duration=0.255)
        assert sad["u"] == [(0.0, 2.0)]  # merged; short segment dropped

    def test_energy_vad(self):
        rng = np.random.default_rng(0)
        sr = 16000
        sil = np.zeros(sr)
        speech = rng.standard_normal(sr).astype(np.float32) * 0.3
        wav = np.concatenate([sil, speech, sil, speech, sil])
        segs = energy_vad(wav, sr)
        assert len(segs) == 2
        assert segs[0][0] == pytest.approx(1.0, abs=0.1)
        assert segs[0][1] == pytest.approx(2.0, abs=0.1)


if __name__ == "__main__":
    pytest.main([__file__, "-x", "-q"])


class TestDeviceSpectral:
    def test_device_impl_matches_host_labels(self):
        """The jax spectral path (cosine/prune/Laplacian/eigh on the
        accelerator) must produce the same clustering as the host path
        up to label permutation — eigenvector sign/rotation differences
        between solvers are k-means-invariant on separated clusters."""
        from wespeaker_hubert_tpu.diar.spectral import cluster

        rng = np.random.default_rng(0)
        centers = rng.standard_normal((3, 32)) * 3.0
        emb = np.concatenate([
            centers[i] + rng.standard_normal((40, 32)) * 0.2
            for i in range(3)
        ])
        host = cluster(emb, seed=5, impl="host")
        dev = cluster(emb, seed=5, impl="device")
        assert len(set(host)) == len(set(dev)) == 3
        # same partition up to permutation
        mapping = {}
        for a, b in zip(host, dev):
            mapping.setdefault(a, b)
            assert mapping[a] == b, (a, b, mapping)

    def test_device_impl_num_spks_fixed(self):
        from wespeaker_hubert_tpu.diar.spectral import cluster

        rng = np.random.default_rng(1)
        emb = rng.standard_normal((30, 16))
        labels = cluster(emb, num_spks=2, seed=3, impl="device")
        assert len(labels) == 30 and set(labels) <= {0, 1}

    def test_auto_never_routes_estimation_to_device(self, monkeypatch):
        """'auto' may only switch to the device eigh when num_spks is
        FIXED: the eigengap estimate from f32 device eigenvalues can
        diverge from the host path on near-degenerate gaps (ADVICE r3),
        so estimation stays reference-exact unless the user passes
        impl='device' explicitly."""
        import jax

        from wespeaker_hubert_tpu.diar import spectral

        monkeypatch.setattr(jax, "default_backend", lambda: "tpu")

        calls = []
        real = spectral._spectral_embedding_device

        def traced(emb, p, num_spks, lo, hi):
            calls.append(num_spks)
            # avoid a 2000^3 device eigh in the unit test
            return np.ones((len(emb), num_spks or 1), np.float32), (
                num_spks or 1
            )

        monkeypatch.setattr(spectral, "_spectral_embedding_device", traced)
        emb = np.random.default_rng(0).standard_normal((2048, 8))
        # estimation (num_spks None): auto must stay on host
        spectral.cluster(emb[:128], impl="auto", seed=0)
        assert calls == []
        # a fixed speaker count: auto uses the device above the floor
        spectral.cluster(emb, num_spks=2, impl="auto", seed=0)
        assert calls == [2]
        spectral._spectral_embedding_device = real
