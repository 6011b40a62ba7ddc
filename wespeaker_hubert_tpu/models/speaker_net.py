"""SpeakerNet: backbone + margin-softmax projection as one flax module.

Mirrors the reference's model assembly (reference: wespeaker/bin/train.py:
109-145 attaches `projection` as a submodule; wespeaker/utils/executor.py:
60-62 calls model(feats) then model.module.projection(emb, label)) but as a
single pure module with two entry points:

  * __call__(feats, label, margin)  -> (embed, logits, aux_loss)  [training]
  * embed(feats)                    -> embedding                  [inference]

Params split cleanly at the top level: {'backbone': ..., 'projection': ...},
which is what enables the reference's partial checkpoint loads
(model_init / frontend-only / projection-reset — utils/checkpoint.py:20
strict=False semantics) and the class-sharded projection weight.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax

from .registry import embedding_from_outputs

__all__ = ["SpeakerNet"]


class SpeakerNet(nn.Module):
    backbone: nn.Module
    projection: nn.Module
    frontend: Optional[nn.Module] = None

    def features(self, wav, lengths=None, train: bool = False):
        """Optional SSL frontend: raw wav -> (feats, feat_lengths)
        (reference bin/train.py:111-119 attaches the frontend;
        executor.py:42-48 runs it before CMVN/SpecAug)."""
        assert self.frontend is not None
        return self.frontend(wav, lengths=lengths, train=train)

    def __call__(
        self,
        feats: jax.Array,
        label: jax.Array,
        margin=0.0,
        mask: Optional[jax.Array] = None,
        train: bool = False,
    ):
        emb = embedding_from_outputs(
            self.backbone(feats, mask=mask, train=train)
        )
        logits, aux = self.projection(emb, label, margin)
        return emb, logits, aux

    def embed(
        self,
        feats: jax.Array,
        mask: Optional[jax.Array] = None,
        train: bool = False,
    ):
        return embedding_from_outputs(
            self.backbone(feats, mask=mask, train=train)
        )
