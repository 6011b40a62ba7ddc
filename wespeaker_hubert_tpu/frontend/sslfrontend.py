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
    """`layer` >= 0 selects a single hidden state (reference s3prl.py:
    55-58, 84-86: layer selection forbids multilayer_feature);
    `multilayer_feature=False` uses only the last state (reference
    s3prl.py:109-111); default is the learned weighted mix of all."""

    cfg: SSLEncoderConfig
    frozen: bool = True
    layer: int = -1
    multilayer_feature: bool = True

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

        if self.layer >= 0:
            if self.layer >= len(hidden_states):
                raise ValueError(
                    f"s3prl_args.layer={self.layer} out of range: upstream "
                    f"has {len(hidden_states)} hidden states (0..{len(hidden_states) - 1})"
                )
            return hidden_states[self.layer], feat_lengths
        if not self.multilayer_feature:
            hidden_states = hidden_states[-1:]

        n = len(hidden_states)
        weights = self.param(
            "featurizer_weights", nn.initializers.zeros, (n,)
        )
        norm_w = jax.nn.softmax(weights)
        stacked = jnp.stack(hidden_states, axis=0)  # (n, B, T, D)
        # f32 accumulation over the n states, result back in the hidden
        # dtype so a bf16 upstream keeps the downstream backbone bf16
        feats = jnp.einsum(
            "n,nbtd->btd", norm_w.astype(stacked.dtype), stacked,
            preferred_element_type=jnp.float32,
        ).astype(stacked.dtype)
        return feats, feat_lengths

    @property
    def output_size(self) -> int:
        return self.cfg.hidden_size
