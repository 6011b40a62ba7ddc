"""Multi-conversation (batched) diarization must match the sequential
path bit-for-bit.

The throughput design (cli/speaker.diarize_pcm_batch) pools device work
across conversations — one silero dispatch per length bucket, shared
fbank buckets, pooled embedding batches — and the whole claim is that
this is a pure scheduling change: every per-conversation artifact (VAD
probabilities, segment boundaries, window embeddings, merged RTTM
segments) is identical to one-at-a-time `diarize_pcm`.  Reference role:
runtime/server/diarization_gpu/model_repo/run/1/model.py:9 (the Triton
ensemble's batch entry).
"""

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest


def _conversation(rng, seconds, sr=16000):
    parts, t, spk = [], 0.0, 0
    while t < seconds:
        dur = float(rng.uniform(1.0, 3.0))
        n = int(dur * sr)
        tt = np.arange(n) / sr
        f0 = 150 + 90 * spk
        x = np.sin(2 * np.pi * f0 * tt) * 0.3
        x += np.sin(2 * np.pi * 2.1 * f0 * tt) * 0.12
        parts.append((x + rng.standard_normal(n) * 0.01).astype(np.float32))
        gap = int(rng.uniform(0.4, 0.9) * sr)
        parts.append(np.zeros(gap, np.float32))
        t += dur + gap / sr
        spk = 1 - spk
    return np.concatenate(parts)[: int(seconds * sr)]


@pytest.fixture(scope="module")
def speaker(tmp_path_factory):
    from wespeaker_hubert_tpu.bin.train import build_speaker_net
    from wespeaker_hubert_tpu.cli.speaker import Speaker
    from wespeaker_hubert_tpu.utils.checkpoint import save_checkpoint
    from wespeaker_hubert_tpu.utils.config import dump_config

    root = str(tmp_path_factory.mktemp("diar_batch_model"))
    config = {
        "model": "ECAPA_TDNN_c512",
        "model_args": {"feat_dim": 80, "embed_dim": 32},
        "dataset_args": {"fbank_args": {"num_mel_bins": 80}},
    }
    net = build_speaker_net(config, num_class=2)
    variables = net.init(
        jax.random.key(0), jnp.zeros((1, 100, 80)),
        jnp.zeros((1,), jnp.int32), 0.0, train=False,
    )
    dump_config(config, os.path.join(root, "config.yaml"))
    save_checkpoint(os.path.join(root, "avg_model.ckpt"), {
        "params": variables["params"],
        "batch_stats": variables.get("batch_stats", {}),
    })
    return Speaker(root)


class TestSileroBatch:
    def test_batch_matches_single(self):
        from wespeaker_hubert_tpu.diar.silero import (
            silero_init_params,
            silero_probs,
            silero_probs_batch,
        )

        params = silero_init_params(np.random.default_rng(3))
        rng = np.random.default_rng(0)
        wavs = [
            (rng.standard_normal(int(s * 16000)) * 0.1).astype(np.float32)
            for s in (1.2, 4.7, 4.7, 9.3)
        ]
        batched = silero_probs_batch(params, wavs)
        for w, got in zip(wavs, batched):
            ref = silero_probs(params, w)
            np.testing.assert_allclose(got, ref, rtol=0, atol=1e-6)
            assert got.shape == ref.shape


class TestDiarizeBatch:
    def _seeded_spectral(self, monkeypatch):
        # KMeans inside spectral_cluster is randomly seeded by default;
        # pin it in BOTH paths so label assignment is reproducible
        import wespeaker_hubert_tpu.cli.speaker as sp
        from wespeaker_hubert_tpu.diar import spectral_cluster

        monkeypatch.setattr(
            sp, "spectral_cluster",
            functools.partial(spectral_cluster, seed=7),
        )

    def test_batch_matches_sequential(self, speaker, monkeypatch):
        self._seeded_spectral(monkeypatch)
        rng = np.random.default_rng(1)
        wavs = [_conversation(rng, s) for s in (6.0, 11.0, 8.5)]
        utts = ["a", "b", "c"]

        sequential = [
            speaker.diarize_pcm(w, utt=u, clusterer="spectral")
            for w, u in zip(wavs, utts)
        ]
        batched = speaker.diarize_pcm_batch(
            wavs, utts=utts, clusterer="spectral"
        )
        assert batched == sequential

    def test_batch_matches_sequential_pcm16(self, speaker, monkeypatch):
        """PCM16-exact input (the file-decode case) engages the int16
        upload + on-device dequantize; results must still match the
        sequential f32 path bit for bit (the /32768 dequant is exact)."""
        self._seeded_spectral(monkeypatch)
        from wespeaker_hubert_tpu.data.wav_io import pcm16_lossless

        rng = np.random.default_rng(6)
        wavs = [
            np.rint(_conversation(rng, s) * 32768.0).clip(-32768, 32767)
            .astype(np.float32) / np.float32(32768.0)
            for s in (6.0, 9.0)
        ]
        assert all(pcm16_lossless(w) is not None for w in wavs)
        utts = ["p", "q"]
        sequential = [
            speaker.diarize_pcm(w, utt=u, clusterer="spectral")
            for w, u in zip(wavs, utts)
        ]
        batched = speaker.diarize_pcm_batch(
            wavs, utts=utts, clusterer="spectral"
        )
        assert batched == sequential

    def test_vad_segments_batch_matches(self, speaker):
        rng = np.random.default_rng(2)
        wavs = [_conversation(rng, s) for s in (5.0, 9.0)]
        seq = [speaker._vad_segments(w) for w in wavs]
        assert speaker._vad_segments_batch(wavs) == seq

    def test_empty_and_silent_conversations(self, speaker, monkeypatch):
        self._seeded_spectral(monkeypatch)
        rng = np.random.default_rng(4)
        wavs = [
            np.zeros(16000, np.float32),           # silence -> no segments
            _conversation(rng, 6.0),
        ]
        out = speaker.diarize_pcm_batch(wavs, utts=["sil", "ok"],
                                        clusterer="spectral")
        assert out[0] == speaker.diarize_pcm(wavs[0], utt="sil",
                                             clusterer="spectral")
        assert out[1] == speaker.diarize_pcm(wavs[1], utt="ok",
                                             clusterer="spectral")

    def test_diarize_list_batched(self, speaker, tmp_path, monkeypatch):
        self._seeded_spectral(monkeypatch)
        from wespeaker_hubert_tpu.data import write_wav

        rng = np.random.default_rng(5)
        scp = tmp_path / "wav.scp"
        lines = []
        for i in range(3):
            p = str(tmp_path / f"c{i}.wav")
            write_wav(p, _conversation(rng, 5.0 + 2 * i))
            lines.append(f"c{i} {p}")
        scp.write_text("\n".join(lines) + "\n")
        res = speaker.diarize_list(str(scp), clusterer="spectral", batch=2)
        assert set(res) == {"c0", "c1", "c2"}
        for u, segs in res.items():
            ref = speaker.diarize(
                str(tmp_path / f"{u}.wav"), utt=u, clusterer="spectral"
            )
            assert segs == ref


class TestFlatPoolLimit:
    """The pooled fbank upload gathers with int32 device indices, so a
    pool past _FLAT_SAMPLE_LIMIT must split into sub-pools (with batch
    indices offset) rather than wrap offsets and read wrong samples."""

    def test_split_pool_matches_single_upload(self, speaker, monkeypatch):
        import wespeaker_hubert_tpu.cli.speaker as sp

        rng = np.random.default_rng(11)
        segs = [
            (rng.standard_normal(n) * 0.1).astype(np.float32)
            for n in (20000, 45000, 31000, 17000, 52000)
        ]

        def feats_per_seg(batches, meta):
            return [
                np.asarray(batches[bi][row, :nf])
                for bi, row, nf in meta
            ]

        ref = feats_per_seg(*speaker._fbank_slices_device(segs))
        # force splitting after ~two segments per pool
        monkeypatch.setattr(sp, "_FLAT_SAMPLE_LIMIT", 70000)
        split = feats_per_seg(*speaker._fbank_slices_device(segs))
        assert len(ref) == len(split)
        for a, b in zip(ref, split):
            np.testing.assert_array_equal(a, b)

    def test_single_oversize_segment_refuses(self, speaker, monkeypatch):
        import wespeaker_hubert_tpu.cli.speaker as sp

        monkeypatch.setattr(sp, "_FLAT_SAMPLE_LIMIT", 1000)
        seg = np.zeros(1001, np.float32)
        with pytest.raises(ValueError, match="int32"):
            speaker._fbank_slices_device([seg])


class TestClusterImplPlumbing:
    """diar_cluster_impl must reach diar/spectral.cluster from every
    Speaker diarization entry (ADVICE r3: users could not force the
    reference-exact host path for long recordings)."""

    def _capture(self, monkeypatch):
        import wespeaker_hubert_tpu.cli.speaker as sp

        seen = []

        def fake(emb, impl="auto", **kw):
            seen.append(impl)
            return [0] * len(emb)

        monkeypatch.setattr(sp, "spectral_cluster", fake)
        return seen

    def test_diarize_pcm_passes_impl(self, speaker, monkeypatch):
        seen = self._capture(monkeypatch)
        rng = np.random.default_rng(12)
        wav = _conversation(rng, 5.0)
        speaker.set_diarization_params(cluster_impl="host")
        try:
            speaker.diarize_pcm(wav, clusterer="spectral")
            speaker.diarize_pcm_batch([wav], clusterer="spectral")
        finally:
            speaker.set_diarization_params()  # restore defaults
        assert seen == ["host", "host"]

    def test_invalid_impl_rejected(self, speaker):
        with pytest.raises(ValueError, match="auto|host|device"):
            speaker.set_diarization_params(cluster_impl="gpu")
