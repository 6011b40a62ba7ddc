import jax
import jax.numpy as jnp
import numpy as np
import pytest

from wespeaker_hubert_tpu.ops import FbankConfig, apply_cmvn, fbank, spec_aug
from tests.golden_fbank import golden_fbank


def _rand_wav(rng, n):
    return (rng.standard_normal(n) * 0.1).clip(-1, 1).astype(np.float32)


class TestFbank:
    def test_matches_golden_scalar_implementation(self):
        rng = np.random.default_rng(0)
        wav = _rand_wav(rng, 16000)  # 1 s
        want = golden_fbank(wav)
        got, _ = fbank(wav[None], FbankConfig(dither=0.0))
        got = np.asarray(got[0])
        assert got.shape == want.shape == (98, 80)
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-3)

    def test_batch_consistency(self):
        rng = np.random.default_rng(1)
        wavs = np.stack([_rand_wav(rng, 16000) for _ in range(4)])
        batched, _ = fbank(wavs, FbankConfig())
        for i in range(4):
            single, _ = fbank(wavs[i : i + 1], FbankConfig())
            np.testing.assert_allclose(
                np.asarray(batched[i]), np.asarray(single[0]), rtol=1e-4, atol=2e-3
            )

    def test_frame_count(self):
        cfg = FbankConfig()
        wav = np.zeros((1, 16000), np.float32)
        feats, _ = fbank(wav, cfg)
        # kaldi snip_edges: 1 + (16000-400)//160 = 98
        assert feats.shape == (1, 98, 80)

    def test_lengths(self):
        cfg = FbankConfig()
        wav = np.zeros((2, 16000), np.float32)
        lengths = np.array([16000, 8000])
        feats, fl = fbank(wav, cfg, lengths=jnp.asarray(lengths))
        assert list(np.asarray(fl)) == [98, 48]

    def test_dither_changes_output_only_with_rng(self):
        wav = np.random.default_rng(2).standard_normal((1, 8000)).astype(np.float32)
        cfg = FbankConfig(dither=1.0)
        a, _ = fbank(wav, cfg, rng=jax.random.key(0))
        b, _ = fbank(wav, cfg, rng=jax.random.key(1))
        c, _ = fbank(wav, cfg, rng=None)
        d, _ = fbank(wav, FbankConfig(dither=0.0))
        assert not np.allclose(np.asarray(a), np.asarray(b))
        np.testing.assert_allclose(np.asarray(c), np.asarray(d))

    def test_matmul_and_fft_spectra_agree(self):
        rng = np.random.default_rng(5)
        wav = _rand_wav(rng, 16000)
        a, _ = fbank(wav[None], FbankConfig(spectrum_impl="matmul"))
        b, _ = fbank(wav[None], FbankConfig(spectrum_impl="fft"))
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=2e-3
        )

    def test_povey_window(self):
        rng = np.random.default_rng(3)
        wav = _rand_wav(rng, 8000)
        want = golden_fbank(wav, window_type="povey")
        got, _ = fbank(wav[None], FbankConfig(window_type="povey"))
        np.testing.assert_allclose(np.asarray(got[0]), want, rtol=1e-4, atol=1e-3)


class TestCmvn:
    def test_mean_norm(self):
        x = np.random.default_rng(0).standard_normal((3, 50, 8)).astype(np.float32)
        y = np.asarray(apply_cmvn(jnp.asarray(x)))
        np.testing.assert_allclose(y.mean(axis=1), 0.0, atol=1e-5)
        np.testing.assert_allclose(y, x - x.mean(axis=1, keepdims=True), atol=1e-5)

    def test_var_norm(self):
        x = np.random.default_rng(1).standard_normal((2, 100, 4)).astype(np.float32)
        y = np.asarray(apply_cmvn(jnp.asarray(x), norm_var=True))
        np.testing.assert_allclose(y.std(axis=1), 1.0, atol=1e-2)

    def test_masked_matches_trimmed(self):
        x = np.random.default_rng(2).standard_normal((1, 60, 4)).astype(np.float32)
        full = np.asarray(apply_cmvn(jnp.asarray(x[:, :40])))
        padded = np.asarray(
            apply_cmvn(jnp.asarray(x), lengths=jnp.asarray([40]))
        )
        np.testing.assert_allclose(padded[:, :40], full, atol=1e-5)
        np.testing.assert_allclose(padded[:, 40:], 0.0, atol=1e-6)


class TestSpecAug:
    def test_masks_zero_bands(self):
        x = np.ones((4, 100, 80), np.float32)
        y = np.asarray(spec_aug(jnp.asarray(x), jax.random.key(0), prob=1.0))
        assert y.shape == x.shape
        # some entries zeroed, rest untouched
        assert ((y == 0) | (y == 1)).all()
        assert (y == 0).any()

    def test_prob_zero_identity(self):
        x = np.random.default_rng(0).standard_normal((2, 50, 80)).astype(np.float32)
        y = np.asarray(spec_aug(jnp.asarray(x), jax.random.key(0), prob=0.0))
        np.testing.assert_allclose(y, x)

    def test_per_sample_masks_differ(self):
        x = np.ones((8, 200, 80), np.float32)
        y = np.asarray(
            spec_aug(jnp.asarray(x), jax.random.key(3), prob=1.0, max_t=50)
        )
        patterns = {tuple(np.where(y[i] == 0)[0][:5]) for i in range(8)}
        assert len(patterns) > 1

    def test_jittable(self):
        f = jax.jit(lambda x, k: spec_aug(x, k))
        x = jnp.ones((2, 50, 80))
        f(x, jax.random.key(0))


if __name__ == "__main__":
    pytest.main([__file__, "-x", "-q"])
