"""Fused Pallas kernel for the fbank frontend (interpret-verified).

Design: each grid step (one batch row x 8 frames) DMAs its sample span
from the flat HBM waveform into VMEM, materializes the overlapped
(8, 512) frame matrix with a lane-axis gather, applies DC removal and
pre-emphasis (pltpu.roll + column-0 fix, concat-free), then one
(8, 512) @ (512, 2*n_bins) MXU matmul against the DFT matrix (window +
int16 scale pre-folded as diagonal factors — folding the DC/pre-emph
cancellations would cost f32 precision), square-add power, mel matmul,
log.  Frames and DFT projections never exist in HBM.

STATUS: numerically verified against ops.fbank in interpreter mode
(tests/test_fbank_pallas.py); the current Mosaic release cannot compile
the overlapped framing on-device — every assembly strategy hits a tiling
limit (per-row memref slices need sublane-aligned extents; vector loads
at 160-sample offsets produce unmixable layouts; lane-axis
dynamic_gather is restricted to single-vreg, <=128-lane sources:
"Multiple source vregs along gather dimension").  The production TPU
path is ops.fbank spectrum_impl='matmul', whose frame gather + DFT
matmuls XLA fuses natively; this kernel is kept as the fusion blueprint
to revisit when Mosaic grows strided loads or multi-vreg gathers.

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

    frame_pad = ((frame_len + 127) // 128) * 128

    k = np.arange(n_bins)[None, :]
    n = np.arange(frame_len)[:, None]
    ang = 2.0 * np.pi * n * k / fft_size
    dft = np.concatenate([np.cos(ang), -np.sin(ang)], axis=1)  # (L, 2K)

    diag = window_function(cfg.window_type, frame_len)
    if cfg.scale_to_int16:
        diag = diag * 32768.0
    effective = np.zeros((frame_pad, 2 * n_bins), np.float32)
    # rows frame_len..frame_pad stay zero, so padded frame columns (incl.
    # the pre-emphasis spill at column frame_len) can't reach the output
    effective[:frame_len] = (diag[:, None] * dft).astype(np.float32)

    mel_w = mel_banks(
        cfg.num_mel_bins, fft_size, float(cfg.sample_rate),
        cfg.low_freq, cfg.high_freq,
    ).astype(np.float32)
    return effective, mel_w, n_bins, frame_pad


def _kernel(
    wav_hbm,      # (B, W) ANY/HBM
    coeffs_ref,   # (frame_len, 2*n_bins) VMEM
    mel_ref,      # (n_bins, M) VMEM
    out_ref,      # (1, FRAMES_PER_STEP, M) VMEM
    *,
    frame_len: int,
    frame_pad: int,
    shift: int,
    n_bins: int,
    row_stride: int,
    preemph: float,
    remove_dc: bool,
    log_eps: float,
):
    b = pl.program_id(0)
    t0 = pl.program_id(1)

    span = (FRAMES_PER_STEP - 1) * shift + frame_len

    def body(scratch, sems):
        # wav is a FLAT 1-D HBM buffer (2-D rows are tile-aligned memrefs
        # Mosaic refuses to slice per-row; 1-D dynamic slices DMA at
        # arbitrary offsets — guide double-buffer pattern).  One DMA pulls
        # the whole 8-frame span; the (8, frame_pad) frame matrix is then
        # materialized with an in-register gather over a static iota index
        # matrix (tpu.dynamic_gather), zero-masked past frame_len.
        start = b * row_stride + t0 * FRAMES_PER_STEP * shift
        dma = pltpu.make_async_copy(
            wav_hbm.at[pl.ds(start, span)], scratch.at[pl.ds(0, span)], sems
        )
        dma.start()
        dma.wait()

        span_pad = scratch.shape[0]
        spanm = jnp.broadcast_to(
            scratch[...], (FRAMES_PER_STEP, span_pad)
        )
        # Mosaic's lane-axis dynamic_gather needs indices shaped like the
        # operand, so gather at span width and slice down afterwards:
        # frames[i, j] = span[i*shift + j] for j < frame_len, else 0
        shape = (FRAMES_PER_STEP, span_pad)
        idx = (
            jax.lax.broadcasted_iota(jnp.int32, shape, 0) * shift
            + jax.lax.broadcasted_iota(jnp.int32, shape, 1)
        )
        valid = (
            jax.lax.broadcasted_iota(jnp.int32, shape, 1) < frame_len
        )
        wide = jnp.take_along_axis(
            spanm, jnp.where(valid, idx, 0), axis=1
        )
        wide = jnp.where(valid, wide, 0.0)
        frames = wide[:, :frame_pad]
        if remove_dc:
            frames = frames - (
                jnp.sum(frames, axis=1, keepdims=True) / frame_len
            )
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

    span_pad = ((span + 127) // 128) * 128
    pl.run_scoped(
        body,
        scratch=pltpu.VMEM((span_pad,), jnp.float32),
        sems=pltpu.SemaphoreType.DMA(()),
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

    coeffs, mel_w, n_bins, frame_pad = _tables(cfg)
    need = (t_pad - 1) * shift + frame_len
    if need > w:
        wav = jnp.pad(wav, ((0, 0), (0, need - w)))
    row_stride = wav.shape[1]
    wav_flat = wav.reshape(-1)

    kern = functools.partial(
        _kernel,
        frame_len=frame_len,
        frame_pad=frame_pad,
        shift=shift,
        n_bins=n_bins,
        row_stride=row_stride,
        preemph=cfg.preemph_coeff,
        remove_dc=cfg.remove_dc_offset,
        log_eps=float(np.finfo(np.float32).eps),
    )
    out = pl.pallas_call(
        kern,
        grid=(b, t_pad // FRAMES_PER_STEP),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),  # wav stays in HBM
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
    )(wav_flat, jnp.asarray(coeffs), jnp.asarray(mel_w))
    return out[:, :t]
