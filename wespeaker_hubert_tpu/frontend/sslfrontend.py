"""SSL frontend with layer-weighted featurizer (s3prl-equivalent).

Reference: wespeaker/frontend/s3prl.py:23-93 — S3prlFrontend wraps an
upstream (WavLM/HuBERT/wav2vec2), a Featurizer mixes the (1 + L) hidden
states with learned softmax weights (:64), and `frozen` controls whether
the upstream trains (:69-75; the mask embedding stays frozen either way —
we never mask at the frontend, so that's moot here).

TPU design: the frontend is just another flax submodule of SpeakerNet —
frozen mode applies stop_gradient to every hidden state, so one compiled
train step serves both modes; the 24-layer large encoder can be sharded
over the 'model' mesh axis via sharding rules on its qkv/ffn kernels.
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from .ssl_encoder import SSLEncoder, SSLEncoderConfig

__all__ = ["SSLFrontend"]


class SSLFrontend(nn.Module):
    cfg: SSLEncoderConfig
    frozen: bool = True

    @nn.compact
    def __call__(
        self,
        wav: jax.Array,
        lengths: Optional[jax.Array] = None,
        train: bool = False,
    ) -> Tuple[jax.Array, Optional[jax.Array]]:
        """(B, W) raw wav [-1,1] -> (B, T, hidden) weighted features."""
        hidden_states, feat_lengths = SSLEncoder(self.cfg, name="upstream")(
            wav, lengths=lengths, train=train and not self.frozen
        )
        if self.frozen:
            hidden_states = [jax.lax.stop_gradient(h) for h in hidden_states]

        n = len(hidden_states)
        weights = self.param(
            "featurizer_weights", nn.initializers.zeros, (n,)
        )
        norm_w = jax.nn.softmax(weights)
        stacked = jnp.stack(hidden_states, axis=0)  # (n, B, T, D)
        feats = jnp.einsum(
            "n,nbtd->btd", norm_w, stacked, preferred_element_type=jnp.float32
        )
        return feats, feat_lengths

    @property
    def output_size(self) -> int:
        return self.cfg.hidden_size
