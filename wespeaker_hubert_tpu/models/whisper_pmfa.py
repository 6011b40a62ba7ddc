"""Whisper-PMFA: pooling head over whisper-encoder features.

Reference: wespeaker/models/whisper_PMFA.py:112-139 — ASTP (global
context) pooling over the concatenated whisper layers, BatchNorm1d,
Linear to the embedding.  The heavy lifting happens in the
whisper_encoder frontend (frontend/whisper.py).
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax

from .norm import BatchNorm
from .pooling import POOLING_LAYERS

__all__ = ["WhisperPMFA", "whisper_PMFA", "whisper_PMFA_large_v2"]


class WhisperPMFA(nn.Module):
    output_size: int = 1280
    embed_dim: int = 192
    pooling_func: str = "ASTP"
    global_context_att: bool = True

    @nn.compact
    def __call__(self, x, mask: Optional[jax.Array] = None, train: bool = False):
        kwargs = {}
        if self.pooling_func == "ASTP":
            kwargs["global_context_att"] = self.global_context_att
        stats = POOLING_LAYERS[self.pooling_func](
            in_dim=self.output_size, name="pooling", **kwargs
        )(x, mask=mask, train=train)
        stats = BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            name="bn",
        )(stats)
        return nn.Dense(self.embed_dim, name="fc")(stats)


def whisper_PMFA(feat_dim, embed_dim, **kw):
    """Base factory (reference models/whisper_PMFA.py:112 — the generic
    head `get_speaker_model('whisper_PMFA')` dispatches to,
    speaker_model.py:48); output size follows the frontend's feat_dim."""
    return WhisperPMFA(output_size=feat_dim, embed_dim=embed_dim)


def whisper_PMFA_large_v2(feat_dim, embed_dim, **kw):
    return WhisperPMFA(output_size=feat_dim, embed_dim=embed_dim)
