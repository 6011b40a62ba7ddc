"""Run a serialized StableHLO export on a wav — deployment smoke test.

Reference: wespeaker/bin/infer_onnx.py — loads the exported ONNX graph
in onnxruntime, computes fbank (CMN, no CVN) from a wav, and prints the
embedding (infer_onnx.py:55-75).  Here the deployment artifact is the
StableHLO blob written by `bin/export_model.py --stablehlo`
(feats -> embedding, symbolic batch/time); `jax.export.deserialize`
revives it without any of the framework's model code, which is exactly
the role the ONNX session plays for the reference's runtime.

Usage:
    python -m wespeaker_hubert_tpu.bin.infer_export \
        --export_path model.stablehlo --wav_path a.wav [--output emb.npy]
"""

from __future__ import annotations

import argparse

import numpy as np


def compute_fbank(
    wav_path: str,
    num_mel_bins: int = 80,
    frame_length: int = 25,
    frame_shift: int = 10,
    dither: float = 0.0,
) -> np.ndarray:
    """Kaldi fbank + CMN (no CVN), matching the training frontend
    (reference infer_onnx.py:31-51)."""
    import jax.numpy as jnp

    from ..data import read_wav
    from ..ops.fbank import FbankConfig, fbank
    from ..ops.feature_utils import apply_cmvn

    wav, sr = read_wav(wav_path)
    cfg = FbankConfig(
        num_mel_bins=num_mel_bins,
        frame_length_ms=frame_length,
        frame_shift_ms=frame_shift,
        dither=dither,
        sample_rate=sr,
    )
    feats, _ = fbank(jnp.asarray(wav)[None, :], cfg)
    feats = apply_cmvn(feats, norm_var=False)
    return np.asarray(feats)


def infer(export_path: str, feats: np.ndarray) -> np.ndarray:
    """Deserialize the exported graph and call it on (B, T, F) feats."""
    import jax.numpy as jnp
    from jax import export as jax_export

    with open(export_path, "rb") as f:
        revived = jax_export.deserialize(f.read())
    return np.asarray(revived.call(jnp.asarray(feats, jnp.float32)))


def main():
    p = argparse.ArgumentParser(description="infer from a StableHLO export")
    p.add_argument("--export_path", required=True,
                   help="model.stablehlo from bin/export_model --stablehlo")
    p.add_argument("--wav_path", required=True)
    p.add_argument("--num_mel_bins", type=int, default=80)
    p.add_argument("--output", default=None, help="write embedding npy here")
    args = p.parse_args()

    feats = compute_fbank(args.wav_path, num_mel_bins=args.num_mel_bins)
    emb = infer(args.export_path, feats)
    print(emb.squeeze(0))
    if args.output:
        np.save(args.output, emb.squeeze(0))


if __name__ == "__main__":
    main()
