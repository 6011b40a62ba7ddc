"""Chunked-extraction tests: chunk layout semantics (tail re-read),
masked averaging, and similarity to whole-utterance embeddings."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from wespeaker_hubert_tpu.models import get_speaker_model
from wespeaker_hubert_tpu.ops.fbank import FbankConfig
from wespeaker_hubert_tpu.train.chunked import (
    chunk_features,
    make_chunked_embed,
)


class TestChunkFeatures:
    def test_layout_and_tail_reread(self):
        t, f, chunk = 500, 4, 198
        feats = jnp.asarray(
            np.arange(t, dtype=np.float32)[:, None].repeat(f, 1)
        )
        out = np.asarray(chunk_features(feats, jnp.asarray(450), chunk, 3))
        assert out.shape == (3, 198, 4)
        # chunk 0 starts at 0, chunk 1 at 198; chunk 2 (tail) at 450-198=252
        assert out[0, 0, 0] == 0
        assert out[1, 0, 0] == 198
        assert out[2, 0, 0] == 252
        assert out[2, -1, 0] == 449  # tail ends at the last valid frame

    def test_short_utterance(self):
        feats = jnp.ones((300, 4))
        out = np.asarray(chunk_features(feats, jnp.asarray(100), 198, 2))
        # start clamped to 0 for both chunks
        assert out.shape == (2, 198, 4)


class TestChunkedEmbed:
    def test_matches_whole_utterance_direction(self):
        model = get_speaker_model("ECAPA_TDNN_c512")(
            feat_dim=40, embed_dim=32
        )
        cfg = FbankConfig(num_mel_bins=40, dither=0.0)
        rng = np.random.default_rng(0)
        # tonal signal so embeddings are stable
        t = np.arange(64000) / 16000.0
        wav = (
            np.sin(2 * np.pi * 500 * t) * 0.3
            + rng.standard_normal(64000) * 0.01
        ).astype(np.float32)

        variables = model.init(
            jax.random.key(0), jnp.zeros((1, 198, 40)), train=False
        )
        chunked = make_chunked_embed(model, cfg, chunk_frames=198)
        e_chunked = np.asarray(
            chunked(
                variables,
                {"wav": jnp.asarray(wav[None]),
                 "length": jnp.asarray([64000])},
            )
        )[0]

        # whole-utterance embedding for comparison
        from wespeaker_hubert_tpu.ops.fbank import fbank
        from wespeaker_hubert_tpu.ops.feature_utils import apply_cmvn

        feats, _ = fbank(jnp.asarray(wav[None]), cfg)
        feats = apply_cmvn(feats)
        e_whole = np.asarray(
            model.apply(variables, feats, train=False)
        )[0]
        cos = np.dot(e_chunked, e_whole) / (
            np.linalg.norm(e_chunked) * np.linalg.norm(e_whole)
        )
        assert cos > 0.95, cos

    def test_padded_batch_consistency(self):
        model = get_speaker_model("ECAPA_TDNN_c512")(
            feat_dim=40, embed_dim=32
        )
        cfg = FbankConfig(num_mel_bins=40, dither=0.0)
        rng = np.random.default_rng(1)
        wav_a = (rng.standard_normal(48000) * 0.1).astype(np.float32)
        variables = model.init(
            jax.random.key(0), jnp.zeros((1, 198, 40)), train=False
        )
        chunked = make_chunked_embed(model, cfg, chunk_frames=198)
        # same audio alone vs padded inside a longer buffer
        e1 = np.asarray(
            chunked(
                variables,
                {"wav": jnp.asarray(wav_a[None]),
                 "length": jnp.asarray([48000])},
            )
        )[0]
        padded = np.zeros(80000, np.float32)
        padded[:48000] = wav_a
        e2 = np.asarray(
            chunked(
                variables,
                {"wav": jnp.asarray(padded[None]),
                 "length": jnp.asarray([48000])},
            )
        )[0]
        cos = np.dot(e1, e2) / (np.linalg.norm(e1) * np.linalg.norm(e2))
        assert cos > 0.999, cos


if __name__ == "__main__":
    pytest.main([__file__, "-x", "-q"])
