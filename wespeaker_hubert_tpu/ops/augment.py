"""Device-side waveform augmentation: RIR reverb, SNR-banded noise mixing,
and speed perturbation — batched, jittable, static shapes.

TPU-first redesign of the reference's per-sample CPU augmentation
(reference: wespeaker/dataset/processor.py — speed_perturb:263 via sox,
add_reverb_noise:397 via scipy.signal.convolve + wavfile): the host only
CHOOSES augmentation parameters (which noise/RIR, SNR, speed index) and
ships fixed-size arrays; all arithmetic happens in-graph:

  * reverb = full FFT convolution with the energy-normalized RIR, truncated
    to the input length (processor.py:421-432);
  * noise mixing at a target SNR using the reference's dB formulas
    (processor.py:441-463, 1e-4 floors included);
  * the augmented waveform is peak-normalized into [-1, 1] like
    processor.py:466;
  * speed perturb resamples by 0.9/1.0/1.1 with precomputed linear-interp
    gather tables (one per speed — shapes static, selected per sample);
    the x3 label expansion stays in the host pipeline.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "add_reverb_noise",
    "add_reverb_noise_packed",
    "speed_perturb",
    "SPEEDS",
    "speed_input_len",
]

SPEEDS = (1.0, 0.9, 1.1)


def _next_pow2(n: int) -> int:
    return 1 << (int(n) - 1).bit_length()


@functools.partial(jax.jit, static_argnames=("impl",))
def add_reverb_noise(
    wav: jax.Array,
    rir: jax.Array,
    noise: jax.Array,
    aug_type: jax.Array,
    snr: jax.Array,
    impl: str = "fft",
) -> jax.Array:
    """Apply per-sample augmentation.

    wav:   (B, L) clean waveforms in [-1, 1]
    rir:   (B, R) room impulse responses (zero-padded; all-zero if unused)
    noise: (B, L) noise chunks in [-1, 1] (tile-padded by the host)
    aug_type: (B,) int32 — 0: none, 1: reverb, 2: additive noise
    snr:   (B,) float32 target SNR dB (used when aug_type == 2)
    impl:  'fft' (default) or 'conv' (per-sample grouped time-domain
           conv, feature_group_count=B; numerically equal to ~3e-5 but
           measured 31x SLOWER on v5e — Mosaic does not tile a B-group
           8000-tap conv onto the MXU.  Kept for reference/CPU use.)
    """
    b, l = wav.shape
    r = rir.shape[1]

    # --- reverb branch: energy-normalize RIR, full conv, cut to L
    rir_energy = jnp.sqrt(jnp.sum(rir.astype(jnp.float32) ** 2, axis=1, keepdims=True))
    rir_n = rir / jnp.maximum(rir_energy, 1e-8)
    if impl == "conv":
        lhs = jnp.pad(wav[None], ((0, 0), (0, 0), (r - 1, 0)))
        rhs = rir_n[:, ::-1][:, None, :]
        y = jax.lax.conv_general_dilated(
            lhs, rhs, (1,), "VALID",
            dimension_numbers=("NCH", "OIH", "NCH"),
            feature_group_count=b,
        )[0]
    else:
        nfft = _next_pow2(l + r - 1)
        y = jnp.fft.irfft(
            jnp.fft.rfft(wav, n=nfft, axis=-1) * jnp.fft.rfft(rir_n, n=nfft, axis=-1),
            n=nfft,
            axis=-1,
        )[:, :l]

    # --- noise branch: scale noise to target SNR
    audio_db = 10.0 * jnp.log10(jnp.mean(wav**2, axis=1) + 1e-4)
    noise_db = 10.0 * jnp.log10(jnp.mean(noise**2, axis=1) + 1e-4)
    gain = jnp.sqrt(10.0 ** ((audio_db - noise_db - snr) / 10.0))
    z = wav + gain[:, None] * noise

    out = jnp.where(
        (aug_type == 1)[:, None], y, jnp.where((aug_type == 2)[:, None], z, wav)
    )
    # peak-normalize only augmented samples (reference processor.py:466)
    peak = jnp.max(jnp.abs(out), axis=1, keepdims=True) + 1e-4
    normed = out / peak
    return jnp.where((aug_type > 0)[:, None], normed, out)


@functools.partial(jax.jit, static_argnames=("n_reverb",))
def add_reverb_noise_packed(
    wav: jax.Array,
    rir: jax.Array,
    noise: jax.Array,
    snr: jax.Array,
    n_reverb: int,
) -> jax.Array:
    """Packed-layout augmentation: the host sorts each batch into fixed
    slots [reverb | noise | clean] so the FFT convolution runs over ONLY
    the n_reverb rows that need it (static slice) instead of all B rows
    discarded by a where() — the reverb FFT was the last aug hotspot
    (docs/PERF_NOTES.md round-2 attribution: 4.0 of 24.6 ms at B=128 with
    aug_prob-of-1 shapes).  Statistically equivalent to per-sample
    Bernoulli(aug_prob): batch order is already shuffled, so fixed counts
    only remove the per-batch count variance.

    wav:   (B, L); rows [0, n_reverb) get reverb, the next noise.shape[0]
           rows get additive noise at `snr`, the rest pass through.
    rir:   (n_reverb, R)
    noise: (n_noise, L)
    snr:   (n_noise,) dB

    Augmented rows are peak-normalized like the reference
    (processor.py:466); clean rows are untouched.
    """
    b, l = wav.shape
    n_noise = noise.shape[0]
    parts = []
    if n_reverb:
        wr = wav[:n_reverb]
        r = rir.shape[1]
        rir_energy = jnp.sqrt(
            jnp.sum(rir.astype(jnp.float32) ** 2, axis=1, keepdims=True)
        )
        rir_n = rir / jnp.maximum(rir_energy, 1e-8)
        nfft = _next_pow2(l + r - 1)
        y = jnp.fft.irfft(
            jnp.fft.rfft(wr, n=nfft, axis=-1)
            * jnp.fft.rfft(rir_n, n=nfft, axis=-1),
            n=nfft,
            axis=-1,
        )[:, :l]
        parts.append(y)
    if n_noise:
        wn = wav[n_reverb : n_reverb + n_noise]
        audio_db = 10.0 * jnp.log10(jnp.mean(wn**2, axis=1) + 1e-4)
        noise_db = 10.0 * jnp.log10(jnp.mean(noise**2, axis=1) + 1e-4)
        gain = jnp.sqrt(10.0 ** ((audio_db - noise_db - snr) / 10.0))
        parts.append(wn + gain[:, None] * noise)
    if not parts:
        return wav
    aug = jnp.concatenate(parts, axis=0)
    peak = jnp.max(jnp.abs(aug), axis=1, keepdims=True) + 1e-4
    return jnp.concatenate([aug / peak, wav[n_reverb + n_noise :]], axis=0)


# All SPEEDS are rational with denominator 10, so resampling is polyphase:
# every block of 10 output samples consumes exactly p input samples
# (p = 10*speed) with FIXED per-phase interpolation weights.  That turns
# the resample into [static strided slices] + [one tiny constant matmul]
# — no data-dependent gather, which TPUs execute orders of magnitude
# slower than an MXU matmul (take_along_axis over (B, 32000) dominated
# the whole train step before this rewrite).
_POLY_Q = 10
_POLY_P = {1.0: 10, 0.9: 9, 1.1: 11}


def _poly_plan(s: float):
    """(p, w_in, k, weight (q, w_in)) for speed s = p/10."""
    p = _POLY_P[s]
    w_in = int(np.floor((_POLY_Q - 1) * s)) + 2
    k = -(-w_in // p) + 1  # slabs needed to cover a block
    weight = np.zeros((_POLY_Q, w_in), np.float32)
    for j in range(_POLY_Q):
        pos = j * s
        lo = int(np.floor(pos))
        f = pos - lo
        weight[j, lo] += 1.0 - f
        weight[j, lo + 1] += f
    return p, w_in, k, weight


def speed_input_len(out_len: int) -> int:
    """Samples the host must supply per utterance so every speed branch has
    enough input for whole polyphase blocks."""
    m = -(-out_len // _POLY_Q)
    need = 0
    for s in SPEEDS:
        p, _, k, _ = _poly_plan(s)
        need = max(need, (m + k - 1) * p)
    return need


@functools.partial(jax.jit, static_argnames=("out_len",))
def speed_perturb(
    wav: jax.Array, speed_idx: jax.Array, out_len: int
) -> jax.Array:
    """Resample each row by SPEEDS[speed_idx[i]] (sox 'speed' semantics:
    output[n] = linear-interp input at n * speed) to exactly out_len
    samples, via per-speed polyphase matmuls.

    wav: (B, L_in) with L_in >= speed_input_len(out_len).
    speed_idx: (B,) int32 in {0, 1, 2} for speeds {1.0, 0.9, 1.1}.
    """
    b, l_in = wav.shape
    m = -(-out_len // _POLY_Q)
    outs = []
    for s in SPEEDS:
        p, w_in, k, weight = _poly_plan(s)
        need = (m + k - 1) * p
        x = jnp.pad(wav, ((0, 0), (0, need - l_in))) if l_in < need else wav
        slabs = [
            x[:, j * p : (j + m) * p].reshape(b, m, p) for j in range(k)
        ]
        xb = jnp.concatenate(slabs, axis=-1)[:, :, :w_in]  # (B, M, w_in)
        y = jnp.einsum(
            "bmw,qw->bmq", xb, jnp.asarray(weight),
            preferred_element_type=jnp.float32,
        )
        outs.append(y.reshape(b, m * _POLY_Q)[:, :out_len])
    stacked = jnp.stack(outs)  # (3, B, out_len)
    onehot = jax.nn.one_hot(speed_idx, len(SPEEDS), dtype=wav.dtype)
    return jnp.einsum("sbl,bs->bl", stacked, onehot)
