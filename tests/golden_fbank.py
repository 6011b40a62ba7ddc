"""Independent scalar-loop numpy implementation of Kaldi fbank for golden
testing.  Deliberately written frame-by-frame / bin-by-bin (like the Kaldi
spec describes) so it shares no code path with the vectorized JAX version in
wespeaker_hubert_tpu/ops/fbank.py."""

import math

import numpy as np


def _mel(f):
    return 1127.0 * math.log(1.0 + f / 700.0)


def golden_fbank(
    wav,
    sample_rate=16000,
    num_mel_bins=80,
    frame_length_ms=25.0,
    frame_shift_ms=10.0,
    preemph=0.97,
    remove_dc=True,
    window_type="hamming",
    low_freq=20.0,
    high_freq=0.0,
    scale_to_int16=True,
):
    """wav: 1-D float array in [-1, 1].  Returns (T, num_mel_bins)."""
    wav = np.asarray(wav, dtype=np.float64)
    if scale_to_int16:
        wav = wav * 32768.0
    frame_len = int(sample_rate * frame_length_ms / 1000)
    shift = int(sample_rate * frame_shift_ms / 1000)
    fft_size = 1
    while fft_size < frame_len:
        fft_size *= 2
    n_frames = 1 + (len(wav) - frame_len) // shift

    # window
    win = np.zeros(frame_len)
    for i in range(frame_len):
        if window_type == "hamming":
            win[i] = 0.54 - 0.46 * math.cos(2 * math.pi * i / (frame_len - 1))
        elif window_type == "povey":
            win[i] = (0.5 - 0.5 * math.cos(2 * math.pi * i / (frame_len - 1))) ** 0.85
        else:
            raise ValueError(window_type)

    # mel filters: list of (start_bin, weights)
    nyquist = sample_rate / 2.0
    hi = high_freq if high_freq > 0 else nyquist + high_freq
    mel_lo, mel_hi = _mel(low_freq), _mel(hi)
    delta = (mel_hi - mel_lo) / (num_mel_bins + 1)
    n_fft_bins = fft_size // 2
    bin_width = sample_rate / fft_size
    filters = []
    for j in range(num_mel_bins):
        left = mel_lo + j * delta
        center = left + delta
        right = center + delta
        ws = []
        start = None
        for k in range(n_fft_bins):
            m = _mel(k * bin_width)
            if left < m < right:
                w = (m - left) / delta if m <= center else (right - m) / delta
                if start is None:
                    start = k
                ws.append(w)
            elif start is not None:
                break
        filters.append((start if start is not None else 0, np.array(ws)))

    eps = float(np.finfo(np.float32).eps)
    out = np.zeros((n_frames, num_mel_bins))
    for t in range(n_frames):
        frame = wav[t * shift : t * shift + frame_len].copy()
        if remove_dc:
            frame -= frame.mean()
        if preemph != 0.0:
            pre = frame.copy()
            for i in range(frame_len - 1, 0, -1):
                pre[i] = frame[i] - preemph * frame[i - 1]
            pre[0] = frame[0] - preemph * frame[0]
            frame = pre
        frame = frame * win
        spec = np.fft.rfft(frame, n=fft_size)
        power = np.abs(spec) ** 2
        for j, (start, ws) in enumerate(filters):
            e = 0.0
            for k, w in enumerate(ws):
                e += w * power[start + k]
            out[t, j] = math.log(max(e, eps))
    return out.astype(np.float32)
