"""Batched, jittable Kaldi-compatible log-mel filterbank frontend.

TPU-first design: instead of the reference's per-utterance CPU paths
(python: torchaudio kaldi fbank called per sample in a dataloader worker,
wespeaker/dataset/processor.py:472-501; C++: scalar frame loop in
runtime/core/frontend/fbank.h:138-198), the whole feature extraction is one
fused XLA program over a (B, W) waveform batch:

    frame gather -> dither -> DC removal -> preemphasis -> window
        -> zero-pad to fft_size -> rFFT -> power -> mel matmul -> log

Everything after framing is elementwise/FFT/matmul, which XLA fuses and maps
onto the VPU/MXU; the mel projection is a single (B*T, F+1) @ (F+1, M)
matmul.  Variable-length batches are handled with static shapes + masks
(num_frames computed from lengths), never with dynamic shapes.

Numerical semantics match Kaldi with snip_edges=True, round-to-pow2 FFT:
  - num_frames = 1 + (W - frame_len) // frame_shift
  - per-frame: optional dither (gaussian, matches torchaudio kaldi),
    optional DC offset removal, preemphasis 0.97 with first-sample
    self-subtraction, hamming window
  - power spectrum of the zero-padded frame, 257 bins for 16 kHz/25 ms
  - triangular mel bins between 20 Hz and nyquist
  - log with epsilon floor (float32 eps, matching torchaudio)
The reference scales waveforms to int16 range before fbank
(processor.py:493 `waveform * (1 << 15)`); `scale_to_int16=True` reproduces
that so log-mel values are directly comparable.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .signal import mel_banks, next_pow2, window_function

__all__ = ["FbankConfig", "fbank", "num_frames", "frame_signal"]

_LOG_EPS = float(np.finfo(np.float32).eps)  # 1.1920929e-07


@dataclasses.dataclass(frozen=True)
class FbankConfig:
    sample_rate: int = 16000
    num_mel_bins: int = 80
    frame_length_ms: float = 25.0
    frame_shift_ms: float = 10.0
    dither: float = 0.0
    preemph_coeff: float = 0.97
    remove_dc_offset: bool = True
    window_type: str = "hamming"
    low_freq: float = 20.0
    high_freq: float = 0.0  # <=0 means nyquist + high_freq
    use_log: bool = True
    scale_to_int16: bool = True
    compute_dtype: jnp.dtype = jnp.float32
    # 'fft': XLA rFFT; 'matmul': DFT as two (frame_len, n_bins) matmuls —
    # the MXU-native form (a 400x257 DFT matrix is tiny; the systolic
    # array eats it, and it fuses with the windowing elementwise ops,
    # avoiding TPU's comparatively slow FFT op); 'pallas': the fused
    # single-kernel path (ops/fbank_pallas.py, ~17% faster than 'matmul'
    # on TPU v5e) — dither-free eval only, falls back to 'matmul' when a
    # dither rng is passed or when not running on TPU.
    spectrum_impl: str = "matmul"
    # 'highest': exact f32 matmuls (golden-test parity); 'default': TPU
    # fast path (bf16 passes on the MXU) — ~3 decimal digits of mel
    # precision, plenty for training (dither already injects noise) and
    # serving; downstream embedding cosine vs exact is > 0.9999.
    matmul_precision: str = "highest"

    @property
    def frame_length(self) -> int:
        return int(self.sample_rate * self.frame_length_ms * 1e-3)

    @property
    def frame_shift(self) -> int:
        return int(self.sample_rate * self.frame_shift_ms * 1e-3)

    @property
    def fft_size(self) -> int:
        return next_pow2(self.frame_length)


def _precision(cfg: FbankConfig):
    return (
        jax.lax.Precision.HIGHEST
        if cfg.matmul_precision == "highest"
        else jax.lax.Precision.DEFAULT
    )


def num_frames(num_samples, frame_length: int, frame_shift: int):
    """Kaldi snip_edges frame count; works on ints or arrays."""
    return 1 + (num_samples - frame_length) // frame_shift


def frame_signal(wav: jax.Array, frame_length: int, frame_shift: int) -> jax.Array:
    """(B, W) -> (B, T, frame_length) overlapping frames (snip_edges).

    Implemented as ceil(L/shift) static strided slices + reshapes (each
    slab j is wav[j*shift : j*shift + T*shift] viewed as (T, shift)) —
    pure data movement XLA copies at HBM speed, instead of an (T, L)
    index gather, which TPUs lower to a slow scalar-indexed loop.
    """
    b, w = wav.shape
    t = num_frames(w, frame_length, frame_shift)
    k = -(-frame_length // frame_shift)  # slabs per frame
    need = (t + k - 1) * frame_shift
    x = jnp.pad(wav, ((0, 0), (0, need - w))) if w < need else wav
    slabs = [
        x[:, j * frame_shift : (j + t) * frame_shift].reshape(
            b, t, frame_shift
        )
        for j in range(k)
    ]
    return jnp.concatenate(slabs, axis=-1)[:, :, :frame_length]


@functools.partial(jax.jit, static_argnames=("cfg",))
def _fbank_impl(
    wav: jax.Array,
    cfg: FbankConfig,
    rng: Optional[jax.Array],
) -> jax.Array:
    frame_len = cfg.frame_length
    fft_size = cfg.fft_size

    x = wav.astype(jnp.float32)
    if cfg.scale_to_int16:
        x = x * 32768.0

    frames = frame_signal(x, frame_len, cfg.frame_shift)  # (B, T, L)

    if cfg.dither != 0.0 and rng is not None:
        frames = frames + cfg.dither * jax.random.normal(
            rng, frames.shape, dtype=jnp.float32
        )

    if cfg.remove_dc_offset:
        frames = frames - jnp.mean(frames, axis=-1, keepdims=True)

    if cfg.preemph_coeff != 0.0:
        # out[0] = f[0] - c*f[0]; out[i] = f[i] - c*f[i-1]
        prev = jnp.concatenate([frames[..., :1], frames[..., :-1]], axis=-1)
        frames = frames - cfg.preemph_coeff * prev

    window = jnp.asarray(
        window_function(cfg.window_type, frame_len), dtype=jnp.float32
    )
    frames = frames * window

    if cfg.spectrum_impl == "matmul":
        # Real DFT as two matmuls: power[k] = (f @ cos_k)^2 + (f @ sin_k)^2.
        # The (frame_len, 2*(fft/2+1)) coefficient matrix is a compile-time
        # constant; XLA maps this straight onto the MXU and fuses the
        # square/add, which profiles faster than the TPU FFT op for these
        # tiny transforms.
        n_bins = fft_size // 2 + 1
        k = np.arange(n_bins)[None, :]  # only first frame_len rows matter
        n = np.arange(frame_len)[:, None]
        ang = 2.0 * np.pi * n * k / fft_size
        coeffs = np.concatenate(
            [np.cos(ang), -np.sin(ang)], axis=1
        ).astype(np.float32)  # (frame_len, 2*n_bins)
        proj = jnp.einsum(
            "btl,lk->btk",
            frames.astype(cfg.compute_dtype),
            jnp.asarray(coeffs),
            preferred_element_type=jnp.float32,
            precision=_precision(cfg),
        )
        power = proj[..., :n_bins] ** 2 + proj[..., n_bins:] ** 2
    else:
        spec = jnp.fft.rfft(frames, n=fft_size, axis=-1)  # (B, T, fft/2+1)
        power = jnp.real(spec) ** 2 + jnp.imag(spec) ** 2

    mel_w = jnp.asarray(
        mel_banks(
            cfg.num_mel_bins,
            fft_size,
            float(cfg.sample_rate),
            cfg.low_freq,
            cfg.high_freq,
        )
    )
    # The hot matmul: (B, T, F+1) @ (F+1, M) on the MXU.
    mel = jnp.einsum(
        "btf,fm->btm",
        power.astype(cfg.compute_dtype),
        mel_w.astype(cfg.compute_dtype),
        preferred_element_type=jnp.float32,
        precision=_precision(cfg),
    )
    if cfg.use_log:
        mel = jnp.log(jnp.maximum(mel, _LOG_EPS))
    return mel


def fbank(
    wav: jax.Array,
    cfg: FbankConfig = FbankConfig(),
    *,
    rng: Optional[jax.Array] = None,
    lengths: Optional[jax.Array] = None,
) -> Tuple[jax.Array, Optional[jax.Array]]:
    """Compute log-mel fbank features for a batch of waveforms.

    Args:
      wav: (B, W) float waveform batch in [-1, 1] (int16-scaled internally
        when cfg.scale_to_int16, matching the reference pipeline).
      cfg: static FbankConfig.
      rng: PRNG key for dither; dither is skipped when None (eval mode).
      lengths: optional (B,) valid sample counts for padded batches.

    Returns:
      (feats, feat_lengths): feats (B, T, num_mel_bins) float32 where
      T = 1 + (W - frame_len) // frame_shift; feat_lengths (B,) valid frame
      counts (None when lengths is None).  Frames past feat_lengths are
      garbage and must be masked by the consumer.
    """
    if wav.ndim == 1:
        wav = wav[None]
    if (
        cfg.spectrum_impl == "pallas"
        and (rng is None or cfg.dither == 0.0)
        and cfg.use_log
        and jax.default_backend() not in ("cpu", "gpu")
    ):
        from .fbank_pallas import fbank_pallas

        feats = fbank_pallas(
            wav, dataclasses.replace(cfg, dither=0.0, spectrum_impl="matmul")
        )
    elif cfg.spectrum_impl == "pallas":
        feats = _fbank_impl(
            wav, dataclasses.replace(cfg, spectrum_impl="matmul"), rng
        )
    else:
        feats = _fbank_impl(wav, cfg, rng)
    if lengths is None:
        return feats, None
    feat_lengths = jnp.maximum(
        num_frames(lengths, cfg.frame_length, cfg.frame_shift), 0
    ).astype(jnp.int32)
    return feats, feat_lengths
