"""Pallas fused fbank kernel vs the XLA path (interpret mode on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from wespeaker_hubert_tpu.ops.fbank import FbankConfig, fbank
from wespeaker_hubert_tpu.ops.fbank_pallas import fbank_pallas


@pytest.mark.parametrize("samples", [16000, 32240])
def test_matches_xla_path(samples):
    rng = np.random.default_rng(0)
    wav = (rng.standard_normal((2, samples)) * 0.1).astype(np.float32)
    cfg = FbankConfig(dither=0.0)
    want, _ = fbank(jnp.asarray(wav), cfg)
    got = fbank_pallas(jnp.asarray(wav), cfg, interpret=True)
    assert got.shape == want.shape
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-4, atol=2e-3
    )


def test_40mel(samples=16000):
    rng = np.random.default_rng(1)
    wav = (rng.standard_normal((1, samples)) * 0.1).astype(np.float32)
    cfg = FbankConfig(dither=0.0, num_mel_bins=40)
    want, _ = fbank(jnp.asarray(wav), cfg)
    got = fbank_pallas(jnp.asarray(wav), cfg, interpret=True)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-4, atol=2e-3
    )


def test_rejects_dither():
    with pytest.raises(AssertionError):
        fbank_pallas(jnp.zeros((1, 16000)), FbankConfig(dither=1.0),
                     interpret=True)


def test_spectrum_impl_pallas_dispatch_cpu_fallback():
    """spectrum_impl='pallas' must fall back to the matmul path off-TPU
    (and when dithering) and produce identical features."""
    rng = np.random.default_rng(2)
    wav = (rng.standard_normal((2, 16000)) * 0.1).astype(np.float32)
    want, _ = fbank(jnp.asarray(wav), FbankConfig(dither=0.0))
    got, _ = fbank(
        jnp.asarray(wav), FbankConfig(dither=0.0, spectrum_impl="pallas")
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-4, atol=2e-3
    )


@pytest.mark.skipif(
    jax.default_backend() in ("cpu", "gpu"),
    reason="compiled Mosaic kernel needs a real TPU",
)
def test_compiled_on_tpu():
    """The kernel COMPILES (no interpret) and matches the XLA path."""
    rng = np.random.default_rng(3)
    wav = (rng.standard_normal((4, 32240)) * 0.1).astype(np.float32)
    cfg = FbankConfig(dither=0.0)
    want, _ = fbank(jnp.asarray(wav), cfg)
    got = fbank_pallas(jnp.asarray(wav), cfg)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-4, atol=2e-3
    )
