"""Fused Pallas TPU kernel for the fbank frontend.

Each grid step (one batch row x 8 frames) DMAs its ~1.5k-sample window
from HBM into VMEM scratch and computes everything on-chip: frame
gather, DC removal (row mean), pre-emphasis (pltpu.roll + column-0 fix —
concat-free so Mosaic tiles it), then ONE (8, 400) @ (400, 2*n_bins) MXU
matmul against the DFT matrix with the window and int16 scale pre-folded
into it (diagonal factors only — folding the DC/pre-emph cancellations
would cost f32 precision), square-add power, (8, n_bins) @ (n_bins, M)
mel matmul, log.  Frames and DFT projections never exist in HBM (the XLA
path streams ~6x the input bytes through HBM for them).

Eval-path semantics (dither-free) identical to ops.fbank with
spectrum_impl='matmul'; the train path keeps the XLA implementation
(dither needs the threefry PRNG).
"""

from __future__ import annotations

import functools

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
    """Fold window * int16-scale (pure diagonals — no cancellation) into
    the DFT matrix; DC removal and pre-emphasis stay in-kernel (their
    large-term cancellations would lose f32 precision if folded)."""
    frame_len = cfg.frame_length
    fft_size = cfg.fft_size
    n_bins = fft_size // 2 + 1

    k = np.arange(n_bins)[None, :]
    n = np.arange(frame_len)[:, None]
    ang = 2.0 * np.pi * n * k / fft_size
    dft = np.concatenate([np.cos(ang), -np.sin(ang)], axis=1)  # (L, 2K)

    diag = window_function(cfg.window_type, frame_len)
    if cfg.scale_to_int16:
        diag = diag * 32768.0
    effective = (diag[:, None] * dft).astype(np.float32)

    mel_w = mel_banks(
        cfg.num_mel_bins, fft_size, float(cfg.sample_rate),
        cfg.low_freq, cfg.high_freq,
    ).astype(np.float32)
    return effective, mel_w, n_bins


def _kernel(
    wav_hbm,      # (B, W) ANY/HBM
    coeffs_ref,   # (frame_len, 2*n_bins) VMEM
    mel_ref,      # (n_bins, M) VMEM
    out_ref,      # (1, FRAMES_PER_STEP, M) VMEM
    *,
    frame_len: int,
    shift: int,
    n_bins: int,
    span: int,
    preemph: float,
    remove_dc: bool,
    log_eps: float,
):
    b = pl.program_id(0)
    t0 = pl.program_id(1)

    def body(scratch, sem):
        start = t0 * FRAMES_PER_STEP * shift
        dma = pltpu.make_async_copy(
            wav_hbm.at[b, pl.ds(start, span)], scratch.at[0], sem
        )
        dma.start()
        dma.wait()

        frames = jnp.stack(
            [
                scratch[0, pl.ds(i * shift, frame_len)]
                for i in range(FRAMES_PER_STEP)
            ]
        )  # (8, frame_len)
        if remove_dc:
            frames = frames - jnp.mean(frames, axis=1, keepdims=True)
        if preemph != 0.0:
            prev = pltpu.roll(frames, shift=1, axis=1)
            col0 = (
                jax.lax.broadcasted_iota(
                    jnp.int32, frames.shape, dimension=1
                )
                == 0
            )
            frames = jnp.where(
                col0, frames * (1.0 - preemph), frames - preemph * prev
            )
        proj = jnp.dot(
            frames, coeffs_ref[:], preferred_element_type=jnp.float32
        )  # (8, 2K)
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

    coeffs, mel_w, n_bins = _tables(cfg)
    span = ((FRAMES_PER_STEP - 1) * shift + frame_len + 127) // 128 * 128
    need = (t_pad - FRAMES_PER_STEP) * shift + span
    if need > w:
        wav = jnp.pad(wav, ((0, 0), (0, need - w)))

    kern = functools.partial(
        _kernel,
        frame_len=frame_len,
        shift=shift,
        n_bins=n_bins,
        span=span,
        preemph=cfg.preemph_coeff,
        remove_dc=cfg.remove_dc_offset,
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
    )(wav, jnp.asarray(coeffs), jnp.asarray(mel_w))
    return out[:, :t]
