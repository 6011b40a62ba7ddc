"""Silero-VAD (v5, 16 kHz) re-implemented TPU-first in JAX.

The reference's system SAD and CLI VAD run the silero torchscript model
one 512-sample chunk at a time from Python
(reference: wespeaker/diar/make_system_sad.py:44-66 threshold 0.18;
wespeaker/cli/speaker.py:129-153).  Here the WHOLE utterance is one jitted
program: chunk framing and the STFT are batched matmuls on the MXU, the
per-chunk encoder is a batched conv stack, and only the tiny LSTM cell
scans sequentially (`lax.scan`) — the inherently-serial part is 128-dim
per chunk, everything else is parallel over chunks.

Architecture (from the public silero-vad v5 ONNX/JIT graph):
  chunk = [context 64 samples | 512 new samples]  (context = tail of the
  previous chunk, zeros for the first)
  -> reflect-pad left 128, STFT basis conv (kernel 256, stride 128)
     => 4 frames x 258 (real||imag), magnitude => (4, 129)
  -> encoder: 4x [Conv1d k=3 pad=1 (+ReLU)], channels 129->128->64->64->128,
     strides 1,2,2,1  => (1, 128) per chunk
  -> LSTMCell(128) carried across chunks -> ReLU -> Conv1d(128->1) -> sigmoid

Weights: no download is possible in this environment; use
`convert_silero_state_dict` offline on the official package's
`load_silero_vad().state_dict()` and save with np.savez, then
`load_silero_params(path)`.  Without weights, `diar.sad.energy_vad`
remains the fallback.

`get_speech_timestamps` is a faithful port of the silero post-processing
state machine (silero_vad/utils_vad.py) — the algorithm is the spec, since
segment outputs must match the reference pipeline's.
"""

from __future__ import annotations

import functools
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "silero_init_params",
    "silero_probs",
    "convert_silero_state_dict",
    "load_silero_params",
    "save_silero_params",
    "get_speech_timestamps",
    "SileroVAD",
]

SR = 16000
WINDOW = 512  # samples per chunk at 16 kHz
CONTEXT = 64  # samples of left context carried between chunks
FILTER_LEN = 256
HOP = 128
N_BINS = FILTER_LEN // 2 + 1  # 129
STFT_PAD = FILTER_LEN // 2  # reflect pad (left) inside the STFT

# encoder conv spec: (in, out, stride); all k=3, pad=1
_ENCODER = ((N_BINS, 128, 1), (128, 64, 2), (64, 64, 2), (64, 128, 1))
_HIDDEN = 128


def _stft_basis() -> np.ndarray:
    """(258, 256) forward DFT basis identical to the model's
    forward_basis_buffer: rows = [real part; imag part] of the DFT matrix
    windowed by hann (the buffer ships pre-windowed; we generate the same
    for random init / tests)."""
    k = np.arange(N_BINS)[:, None]
    n = np.arange(FILTER_LEN)[None, :]
    ang = -2.0 * np.pi * k * n / FILTER_LEN
    win = np.hanning(FILTER_LEN + 1)[:-1]
    return np.concatenate([np.cos(ang), np.sin(ang)], axis=0).astype(
        np.float32
    ) * win[None, :]


def silero_init_params(rng: Optional[np.random.Generator] = None) -> Dict:
    """Random-init parameter tree with the exact official shapes (for tests
    and as the converter's target schema)."""
    rng = rng or np.random.default_rng(0)

    def conv(cin, cout, k):
        scale = 1.0 / np.sqrt(cin * k)
        return {
            "kernel": rng.uniform(-scale, scale, (cout, cin, k)).astype(
                np.float32
            ),
            "bias": rng.uniform(-scale, scale, (cout,)).astype(np.float32),
        }

    params = {"stft_basis": _stft_basis()}
    for i, (cin, cout, _s) in enumerate(_ENCODER):
        params[f"encoder_{i}"] = conv(cin, cout, 3)
    s = 1.0 / np.sqrt(_HIDDEN)
    params["lstm"] = {
        "weight_ih": rng.uniform(-s, s, (4 * _HIDDEN, _HIDDEN)).astype(
            np.float32
        ),
        "weight_hh": rng.uniform(-s, s, (4 * _HIDDEN, _HIDDEN)).astype(
            np.float32
        ),
        "bias_ih": rng.uniform(-s, s, (4 * _HIDDEN,)).astype(np.float32),
        "bias_hh": rng.uniform(-s, s, (4 * _HIDDEN,)).astype(np.float32),
    }
    params["out"] = conv(_HIDDEN, 1, 1)
    return params


def convert_silero_state_dict(sd: Dict[str, np.ndarray]) -> Dict:
    """Official jit/package state_dict -> our param tree.

    Accepts keys with or without the `_model.` prefix (the torchscript
    model nests the 16 kHz graph under `_model`; `_model_8k` is the 8 kHz
    variant, which we don't support).  Values may be torch tensors or
    numpy arrays.
    """

    def get(key):
        for k in (f"_model.{key}", key):
            if k in sd:
                v = sd[k]
                return np.asarray(
                    v.detach().cpu().numpy() if hasattr(v, "detach") else v,
                    np.float32,
                )
        raise KeyError(f"silero state_dict missing {key!r}")

    params: Dict = {
        # (258, 1, 256) conv weight -> (258, 256)
        "stft_basis": get("stft.forward_basis_buffer").reshape(
            2 * N_BINS, FILTER_LEN
        )
    }
    for i in range(len(_ENCODER)):
        params[f"encoder_{i}"] = {
            "kernel": get(f"encoder.{i}.reparam_conv.weight"),
            "bias": get(f"encoder.{i}.reparam_conv.bias"),
        }
    params["lstm"] = {
        "weight_ih": get("decoder.rnn.weight_ih"),
        "weight_hh": get("decoder.rnn.weight_hh"),
        "bias_ih": get("decoder.rnn.bias_ih"),
        "bias_hh": get("decoder.rnn.bias_hh"),
    }
    params["out"] = {
        "kernel": get("decoder.decoder.2.weight"),
        "bias": get("decoder.decoder.2.bias"),
    }
    return params


def save_silero_params(path: str, params: Dict) -> None:
    flat = {}

    def walk(tree, prefix):
        for k, v in tree.items():
            key = f"{prefix}{k}"
            if isinstance(v, dict):
                walk(v, key + "/")
            else:
                flat[key] = np.asarray(v)

    walk(params, "")
    np.savez(path, **flat)


def load_silero_params(path: str) -> Dict:
    data = np.load(path)
    params: Dict = {}
    for key in data.files:
        parts = key.split("/")
        node = params
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = data[key]
    return params


def _frame_chunks(wav: jnp.ndarray, n_chunks: int) -> jnp.ndarray:
    """(W,) -> (N, CONTEXT+WINDOW) chunk inputs with carried context."""
    w = wav
    need = n_chunks * WINDOW
    w = jnp.pad(w, (0, need - w.shape[0])) if w.shape[0] < need else w[:need]
    body = w.reshape(n_chunks, WINDOW)
    ctx = jnp.concatenate(
        [jnp.zeros((1, CONTEXT), w.dtype), body[:-1, -CONTEXT:]], axis=0
    )
    return jnp.concatenate([ctx, body], axis=1)  # (N, 576)


@functools.partial(jax.jit, static_argnames=("n_chunks",))
def _silero_probs_impl(params: Dict, wav: jnp.ndarray, n_chunks: int):
    x = _frame_chunks(wav.astype(jnp.float32), n_chunks)  # (N, 576)
    # reflect-pad left by 128 (torch F.pad mode='reflect')
    x = jnp.concatenate([x[:, STFT_PAD:0:-1], x], axis=1)  # (N, 704)
    # STFT frames: stride-HOP windows of FILTER_LEN -> (N, 4, 256);
    # conv floor semantics: T = (704 - 256)//128 + 1 = 4
    t_frames = (x.shape[1] - FILTER_LEN) // HOP + 1
    frames = jnp.stack(
        [x[:, i * HOP : i * HOP + FILTER_LEN] for i in range(t_frames)],
        axis=1,
    )
    basis = jnp.asarray(params["stft_basis"])  # (258, 256)
    proj = jnp.einsum("ntf,bf->ntb", frames, basis)  # MXU matmul
    mag = jnp.sqrt(
        proj[..., :N_BINS] ** 2 + proj[..., N_BINS:] ** 2 + 1e-12
    )  # (N, 4, 129)

    h = mag
    for i, (_cin, _cout, stride) in enumerate(_ENCODER):
        kern = jnp.asarray(params[f"encoder_{i}"]["kernel"])  # (O, I, 3)
        bias = jnp.asarray(params[f"encoder_{i}"]["bias"])
        h = jax.lax.conv_general_dilated(
            h,
            kern.transpose(2, 1, 0),  # (k, I, O)
            (stride,),
            [(1, 1)],
            dimension_numbers=("NTC", "TIO", "NTC"),
        ) + bias
        h = jax.nn.relu(h)
    feat = h[:, 0, :]  # (N, 128) — time collapsed to 1 by the strides

    lstm = params["lstm"]
    w_ih = jnp.asarray(lstm["weight_ih"]).T  # (128, 512)
    w_hh = jnp.asarray(lstm["weight_hh"]).T
    b = jnp.asarray(lstm["bias_ih"]) + jnp.asarray(lstm["bias_hh"])

    def cell(carry, xt):
        h_prev, c_prev = carry
        gates = xt @ w_ih + h_prev @ w_hh + b
        i_g, f_g, g_g, o_g = jnp.split(gates, 4)  # torch order: i, f, g, o
        i_g = jax.nn.sigmoid(i_g)
        f_g = jax.nn.sigmoid(f_g)
        g_g = jnp.tanh(g_g)
        o_g = jax.nn.sigmoid(o_g)
        c = f_g * c_prev + i_g * g_g
        h_t = o_g * jnp.tanh(c)
        return (h_t, c), h_t

    init = (jnp.zeros((_HIDDEN,)), jnp.zeros((_HIDDEN,)))
    _, hs = jax.lax.scan(cell, init, feat)  # (N, 128)

    out_k = jnp.asarray(params["out"]["kernel"]).reshape(1, _HIDDEN)
    out_b = jnp.asarray(params["out"]["bias"])
    logits = jax.nn.relu(hs) @ out_k.T + out_b  # (N, 1)
    return jax.nn.sigmoid(logits)[:, 0]


def silero_probs(params: Dict, wav: np.ndarray) -> np.ndarray:
    """Whole-utterance speech probabilities, one per 512-sample window."""
    wav = np.asarray(wav, np.float32)
    n_chunks = max(1, -(-len(wav) // WINDOW))
    # pad to a power-of-two chunk bucket: one compiled XLA program per
    # bucket instead of one per distinct audio length (the LSTM scan is
    # causal, so trailing zero chunks cannot change earlier outputs)
    bucket = max(32, 1 << (n_chunks - 1).bit_length())
    probs = np.asarray(
        _silero_probs_impl(params, jnp.asarray(wav), bucket)
    )
    return probs[:n_chunks]


@functools.partial(jax.jit, static_argnames=("n_chunks",))
def _silero_probs_batch_impl(params: Dict, wavs: jnp.ndarray, n_chunks: int):
    if wavs.dtype == jnp.int16:
        # lossless PCM16 upload (data/wav_io.pcm16_lossless): dequantize
        # on device — /32768 is exact, so probs match the f32 path bit
        # for bit while the host->device transfer halves
        wavs = wavs.astype(jnp.float32) / 32768.0
    return jax.vmap(
        lambda w: _silero_probs_impl(params, w, n_chunks)
    )(wavs)


def silero_probs_batch(params: Dict, wavs, return_device: bool = False):
    """Batched `silero_probs` over many conversations.

    The single-wav path scans a (128,)-state LSTM — each step is a
    vector-matrix product that leaves the MXU idle, and a conversation
    list costs one dispatch each.  vmapping over same-bucket wavs turns
    every step into (B,128)@(128,512) matmuls and the whole batch into
    ONE dispatch per pow2 bucket.  Per-row math is row-independent, so
    outputs match the sequential path (asserted by
    tests/test_diar_batch.py).

    Uploads ship as int16 when every wav is PCM16-exact (dequantized on
    device, bit-identical — see pcm16_lossless).  With
    ``return_device=True`` also returns the uploaded device batches and
    a conv->(batch_idx, row) map so callers (Speaker.diarize_pcm_batch)
    can slice VAD segments out of the SAME upload instead of paying a
    second host->device transfer of the voiced audio."""
    from ..data.wav_io import pcm16_lossless

    wavs = [np.asarray(w, np.float32) for w in wavs]
    quant = [pcm16_lossless(w) for w in wavs]
    as_i16 = all(q is not None for q in quant)
    chunks = [max(1, -(-len(w) // WINDOW)) for w in wavs]
    order = sorted(range(len(wavs)), key=lambda i: chunks[i])
    out: Dict[int, np.ndarray] = {}
    batches: List[jnp.ndarray] = []
    locs: Dict[int, tuple] = {}
    i = 0
    while i < len(order):
        bucket = max(32, 1 << (chunks[order[i]] - 1).bit_length())
        idx = []
        while (
            i < len(order)
            and chunks[order[i]] <= bucket
            and len(idx) < 16
        ):
            idx.append(order[i])
            i += 1
        rows = quant if as_i16 else wavs
        batch = np.zeros((16, bucket * WINDOW),
                         np.int16 if as_i16 else np.float32)
        for row, j in enumerate(idx):
            batch[row, : len(rows[j])] = rows[j][: bucket * WINDOW]
            locs[j] = (len(batches), row)
        dev = jnp.asarray(batch)
        batches.append(dev)
        probs = np.asarray(_silero_probs_batch_impl(params, dev, bucket))
        for row, j in enumerate(idx):
            out[j] = probs[row, : chunks[j]]
    probs_list = [out[j] for j in range(len(wavs))]
    if return_device:
        return probs_list, batches, locs
    return probs_list


class SileroVAD:
    """Stateful convenience wrapper mirroring the reference CLI usage."""

    def __init__(self, params: Dict):
        self.params = params

    @classmethod
    def from_file(cls, path: str) -> "SileroVAD":
        return cls(load_silero_params(path))

    def __call__(self, wav: np.ndarray) -> np.ndarray:
        return silero_probs(self.params, wav)


def get_speech_timestamps(
    wav: np.ndarray,
    model,
    threshold: float = 0.5,
    sampling_rate: int = SR,
    min_speech_duration_ms: float = 250,
    max_speech_duration_s: float = float("inf"),
    min_silence_duration_ms: float = 100,
    speech_pad_ms: float = 30,
    return_seconds: bool = False,
    neg_threshold: Optional[float] = None,
) -> List[Dict[str, float]]:
    """Port of silero_vad.get_speech_timestamps (utils_vad.py) — the
    triggered/hangover state machine over per-window probabilities, then
    the inter-segment padding pass.  `model` is a callable wav -> probs
    (SileroVAD or any stand-in)."""
    if sampling_rate != SR:
        raise ValueError("only 16 kHz supported")
    wav = np.asarray(wav, np.float32)
    audio_len = len(wav)
    probs = np.asarray(model(wav))

    min_speech = int(sampling_rate * min_speech_duration_ms / 1000)
    pad = int(sampling_rate * speech_pad_ms / 1000)
    if max_speech_duration_s == float("inf"):
        max_speech = float("inf")
    else:
        max_speech = sampling_rate * max_speech_duration_s - WINDOW - 2 * pad
    min_silence = int(sampling_rate * min_silence_duration_ms / 1000)
    min_silence_at_max = int(sampling_rate * 98 / 1000)
    if neg_threshold is None:
        neg_threshold = max(threshold - 0.15, 0.01)

    triggered = False
    speeches: List[Dict[str, float]] = []
    current: Dict[str, float] = {}
    temp_end = 0
    prev_end = 0
    next_start = 0

    for i, prob in enumerate(probs):
        cur_sample = WINDOW * i
        if prob >= threshold and temp_end:
            temp_end = 0
            if next_start < prev_end:
                next_start = cur_sample
        if prob >= threshold and not triggered:
            triggered = True
            current["start"] = cur_sample
            continue
        if triggered and cur_sample - current["start"] > max_speech:
            if prev_end:
                current["end"] = prev_end
                speeches.append(current)
                current = {}
                if next_start < prev_end:
                    triggered = False
                else:
                    current["start"] = next_start
                prev_end = next_start = temp_end = 0
            else:
                current["end"] = cur_sample
                speeches.append(current)
                current = {}
                prev_end = next_start = temp_end = 0
                triggered = False
                continue
        if prob < neg_threshold and triggered:
            if not temp_end:
                temp_end = cur_sample
            if cur_sample - temp_end > min_silence_at_max:
                prev_end = temp_end
            if cur_sample - temp_end < min_silence:
                continue
            current["end"] = temp_end
            if current["end"] - current["start"] > min_speech:
                speeches.append(current)
            current = {}
            prev_end = next_start = temp_end = 0
            triggered = False
            continue

    if (
        current
        and "start" in current
        and audio_len - current["start"] > min_speech
    ):
        current["end"] = audio_len
        speeches.append(current)

    for i, speech in enumerate(speeches):
        if i == 0:
            speech["start"] = int(max(0, speech["start"] - pad))
        if i != len(speeches) - 1:
            silence = speeches[i + 1]["start"] - speech["end"]
            if silence < 2 * pad:
                speech["end"] += int(silence // 2)
                speeches[i + 1]["start"] = int(
                    max(0, speeches[i + 1]["start"] - silence // 2)
                )
            else:
                speech["end"] = int(min(audio_len, speech["end"] + pad))
                speeches[i + 1]["start"] = int(
                    max(0, speeches[i + 1]["start"] - pad)
                )
        else:
            speech["end"] = int(min(audio_len, speech["end"] + pad))

    if return_seconds:
        return [
            {
                "start": round(s["start"] / sampling_rate, 1),
                "end": round(s["end"] / sampling_rate, 1),
            }
            for s in speeches
        ]
    return speeches
