"""In-graph feature pipeline: waveform batch -> augmented fbank features.

This is the TPU-first reorganization of the reference's hot path: the
reference computes fbank per-utterance on 16 CPU dataloader workers
(wespeaker/dataset/processor.py:472-501) and only CMVN/SpecAug on GPU
(utils/executor.py:50-58).  Here the ENTIRE frontend — fbank, CMVN,
SpecAug — runs inside the jitted train/eval step, so the host only ships
raw int16-scale waveforms and the chip stays fed.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax

from .fbank import FbankConfig, fbank
from .feature_utils import apply_cmvn, spec_aug

__all__ = ["FeaturePipelineConfig", "wav_to_features"]


@dataclasses.dataclass(frozen=True)
class FeaturePipelineConfig:
    fbank: FbankConfig = FbankConfig(dither=1.0)
    cmvn_norm_mean: bool = True
    cmvn_norm_var: bool = False
    spec_aug: bool = True
    spec_aug_num_t_mask: int = 1
    spec_aug_num_f_mask: int = 1
    spec_aug_max_t: int = 10
    spec_aug_max_f: int = 8
    spec_aug_prob: float = 0.6


def wav_to_features(
    wav: jax.Array,
    cfg: FeaturePipelineConfig,
    rng: Optional[jax.Array] = None,
    lengths: Optional[jax.Array] = None,
    train: bool = False,
) -> Tuple[jax.Array, Optional[jax.Array]]:
    """(B, W) wav [-1,1] -> ((B, T, M) features, (B, T) mask or None).

    Dither and SpecAug only apply when train=True and rng is given.
    """
    if train and rng is not None:
        rng_dither, rng_spec = jax.random.split(rng)
    else:
        rng_dither = rng_spec = None

    feats, feat_lengths = fbank(
        wav, cfg.fbank, rng=rng_dither, lengths=lengths
    )
    feats = apply_cmvn(
        feats,
        norm_mean=cfg.cmvn_norm_mean,
        norm_var=cfg.cmvn_norm_var,
        lengths=feat_lengths,
    )
    if train and cfg.spec_aug and rng_spec is not None:
        feats = spec_aug(
            feats,
            rng_spec,
            num_t_mask=cfg.spec_aug_num_t_mask,
            num_f_mask=cfg.spec_aug_num_f_mask,
            max_t=cfg.spec_aug_max_t,
            max_f=cfg.spec_aug_max_f,
            prob=cfg.spec_aug_prob,
        )
    mask = None
    if feat_lengths is not None:
        t = feats.shape[1]
        mask = jax.numpy.arange(t)[None, :] < feat_lengths[:, None]
    return feats, mask
