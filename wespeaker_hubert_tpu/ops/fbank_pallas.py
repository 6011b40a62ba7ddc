"""Fused Pallas TPU kernel for the fbank frontend.

The waveform stays in HBM; each grid step (one batch row x 8 frames)
DMAs its ~1.5k-sample window into VMEM scratch and computes framing, DC
removal, pre-emphasis, windowing, the real-DFT matmuls (MXU), power, mel
matmul (MXU) and log entirely on-chip, writing only the (8, M) log-mel
tile back.  The (B, T, 400) frame tensor and (B, T, 514) DFT projection
the XLA path streams through HBM never exist.

Eval-path semantics (dither-free) identical to ops.fbank with
spectrum_impl='matmul'; the train path keeps the XLA implementation
(dither needs the threefry PRNG).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .fbank import FbankConfig, num_frames
from .signal import mel_banks, window_function

__all__ = ["fbank_pallas"]

FRAMES_PER_STEP = 8


def _tables(cfg: FbankConfig):
    frame_len = cfg.frame_length
    fft_size = cfg.fft_size
    n_bins = fft_size // 2 + 1
    frame_pad = ((frame_len + 127) // 128) * 128

    k = np.arange(n_bins)[None, :]
    n = np.arange(frame_len)[:, None]
    ang = 2.0 * np.pi * n * k / fft_size
    coeffs = np.zeros((frame_pad, 2 * n_bins), np.float32)
    coeffs[:frame_len, :n_bins] = np.cos(ang)
    coeffs[:frame_len, n_bins:] = -np.sin(ang)

    window = np.zeros((1, frame_pad), np.float32)
    window[0, :frame_len] = window_function(cfg.window_type, frame_len)

    mel_w = mel_banks(
        cfg.num_mel_bins, fft_size, float(cfg.sample_rate),
        cfg.low_freq, cfg.high_freq,
    )
    return coeffs, window, mel_w.astype(np.float32), frame_pad, n_bins


def _kernel(
    wav_hbm,      # (B, W) in ANY/HBM
    coeffs_ref,   # (frame_pad, 2*n_bins) VMEM
    window_ref,   # (1, frame_pad) VMEM
    mel_ref,      # (n_bins, M) VMEM
    out_ref,      # (1, FRAMES_PER_STEP, M) VMEM
    *,
    frame_len: int,
    frame_pad: int,
    shift: int,
    n_bins: int,
    span: int,
    preemph: float,
    remove_dc: bool,
    scale: float,
    log_eps: float,
):
    b = pl.program_id(0)
    t0 = pl.program_id(1)

    def body(scratch, sem):
        # DMA this step's sample window: 8 frames starting at t0*8*shift
        start = t0 * FRAMES_PER_STEP * shift
        pltpu.make_async_copy(
            wav_hbm.at[b, pl.ds(start, span)], scratch.at[0], sem
        ).start()
        pltpu.make_async_copy(
            wav_hbm.at[b, pl.ds(start, span)], scratch.at[0], sem
        ).wait()

        rows = []
        for i in range(FRAMES_PER_STEP):
            f = scratch[0, pl.ds(i * shift, frame_len)] * scale
            if remove_dc:
                f = f - jnp.mean(f)
            if preemph != 0.0:
                prev = jnp.concatenate([f[:1], f[:-1]])
                f = f - preemph * prev
            rows.append(jnp.pad(f, (0, frame_pad - frame_len)))
        frames = jnp.stack(rows) * window_ref[0][None, :]

        proj = jnp.dot(
            frames, coeffs_ref[:], preferred_element_type=jnp.float32
        )
        power = proj[:, :n_bins] ** 2 + proj[:, n_bins:] ** 2
        mel = jnp.dot(power, mel_ref[:], preferred_element_type=jnp.float32)
        out_ref[0] = jnp.log(jnp.maximum(mel, log_eps))

    pl.run_scoped(
        body,
        scratch=pltpu.VMEM((1, span), jnp.float32),
        sem=pltpu.SemaphoreType.DMA(()),
    )


@functools.partial(jax.jit, static_argnames=("cfg", "interpret"))
def fbank_pallas(
    wav: jax.Array,
    cfg: FbankConfig = FbankConfig(dither=0.0),
    interpret: bool = False,
) -> jax.Array:
    """(B, W) wav -> (B, T, M) log-mel.  Eval only (no dither)."""
    assert cfg.dither == 0.0, "pallas fbank is the dither-free eval path"
    if wav.ndim == 1:
        wav = wav[None]
    b, w = wav.shape
    frame_len = cfg.frame_length
    shift = cfg.frame_shift
    t = num_frames(w, frame_len, shift)
    t_pad = ((t + FRAMES_PER_STEP - 1) // FRAMES_PER_STEP) * FRAMES_PER_STEP

    coeffs, window, mel_w, frame_pad, n_bins = _tables(cfg)
    # per-step sample span, lane-aligned
    span = ((FRAMES_PER_STEP - 1) * shift + frame_len + 127) // 128 * 128
    need = (t_pad - FRAMES_PER_STEP) * shift + span
    if need > w:
        wav = jnp.pad(wav, ((0, 0), (0, need - w)))

    kern = functools.partial(
        _kernel,
        frame_len=frame_len,
        frame_pad=frame_pad,
        shift=shift,
        n_bins=n_bins,
        span=span,
        preemph=cfg.preemph_coeff,
        remove_dc=cfg.remove_dc_offset,
        scale=32768.0 if cfg.scale_to_int16 else 1.0,
        log_eps=float(np.finfo(np.float32).eps),
    )
    out = pl.pallas_call(
        kern,
        grid=(b, t_pad // FRAMES_PER_STEP),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),  # wav stays in HBM
            pl.BlockSpec(
                coeffs.shape, lambda i, j: (0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                window.shape, lambda i, j: (0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                mel_w.shape, lambda i, j: (0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, FRAMES_PER_STEP, cfg.num_mel_bins),
            lambda i, j: (i, j, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct(
            (b, t_pad, cfg.num_mel_bins), jnp.float32
        ),
        interpret=interpret,
    )(wav, jnp.asarray(coeffs), jnp.asarray(window), jnp.asarray(mel_w))
    return out[:, :t]
