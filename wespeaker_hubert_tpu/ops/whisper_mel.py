"""Whisper-style log-mel spectrogram (batched, jittable).

Reference: wespeaker/frontend/whisper_encoder.py:310-315 calls
whisper.log_mel_spectrogram per utterance on CPU; here the whole batch is
one XLA program.  Whisper's definition: 400-pt hann STFT hop 160 with
reflect-centering, |.|^2, slaney-normalized mel filterbank (librosa
filters.mel defaults: HTK=False), log10 clamped at 1e-10, dynamic-range
compression max(x, x.max()-8), then (x+4)/4.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["whisper_log_mel", "slaney_mel_filters"]

N_FFT = 400
HOP = 160


def slaney_mel_filters(
    sr: int = 16000, n_fft: int = N_FFT, n_mels: int = 80
) -> np.ndarray:
    """librosa.filters.mel(..., htk=False, norm='slaney') reimplemented:
    mel scale linear below 1 kHz then logarithmic, triangle weights with
    slaney area normalization.  Returns (n_mels, n_fft//2 + 1)."""
    f_min, f_max = 0.0, sr / 2.0

    def hz_to_mel(f):
        f = np.asarray(f, dtype=np.float64)
        f_sp = 200.0 / 3
        mels = f / f_sp
        min_log_hz = 1000.0
        min_log_mel = min_log_hz / f_sp
        logstep = np.log(6.4) / 27.0
        return np.where(
            f >= min_log_hz,
            min_log_mel + np.log(np.maximum(f, 1e-10) / min_log_hz) / logstep,
            mels,
        )

    def mel_to_hz(m):
        m = np.asarray(m, dtype=np.float64)
        f_sp = 200.0 / 3
        freqs = f_sp * m
        min_log_hz = 1000.0
        min_log_mel = min_log_hz / f_sp
        logstep = np.log(6.4) / 27.0
        return np.where(
            m >= min_log_mel,
            min_log_hz * np.exp(logstep * (m - min_log_mel)),
            freqs,
        )

    mel_pts = np.linspace(hz_to_mel(f_min), hz_to_mel(f_max), n_mels + 2)
    hz_pts = mel_to_hz(mel_pts)
    fft_freqs = np.fft.rfftfreq(n_fft, 1.0 / sr)

    weights = np.zeros((n_mels, len(fft_freqs)))
    fdiff = np.diff(hz_pts)
    ramps = hz_pts[:, None] - fft_freqs[None, :]
    for i in range(n_mels):
        lower = -ramps[i] / fdiff[i]
        upper = ramps[i + 2] / fdiff[i + 1]
        weights[i] = np.maximum(0, np.minimum(lower, upper))
    # slaney normalization: 2 / bandwidth
    enorm = 2.0 / (hz_pts[2 : n_mels + 2] - hz_pts[:n_mels])
    weights *= enorm[:, None]
    return weights.astype(np.float32)


@functools.partial(jax.jit, static_argnames=("n_mels",))
def whisper_log_mel(wav: jax.Array, n_mels: int = 80) -> jax.Array:
    """(B, W) float wav [-1,1] -> (B, T, n_mels), T = W // HOP."""
    if wav.ndim == 1:
        wav = wav[None]
    pad = N_FFT // 2
    x = jnp.pad(wav, ((0, 0), (pad, pad)), mode="reflect")
    b, w = x.shape
    t = 1 + (w - N_FFT) // HOP
    idx = (
        np.arange(t, dtype=np.int32)[:, None] * HOP
        + np.arange(N_FFT, dtype=np.int32)[None, :]
    )
    frames = x[:, idx]  # (B, T, N_FFT)
    window = jnp.asarray(np.hanning(N_FFT + 1)[:-1].astype(np.float32))
    spec = jnp.fft.rfft(frames * window, n=N_FFT, axis=-1)
    mag = jnp.abs(spec) ** 2
    mag = mag[:, :-1]  # whisper drops the last frame

    mel_f = jnp.asarray(slaney_mel_filters(n_mels=n_mels))  # (M, F)
    mel = jnp.einsum(
        "btf,mf->btm", mag, mel_f,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    log_spec = jnp.log10(jnp.maximum(mel, 1e-10))
    max_val = jnp.max(log_spec, axis=(1, 2), keepdims=True)
    log_spec = jnp.maximum(log_spec, max_val - 8.0)
    return (log_spec + 4.0) / 4.0
