"""Kaldi-style TDNN x-vector (reference: wespeaker/models/tdnn.py —
TdnnLayer:23, XVEC:57).

TPU-native notes: channels-last (B, T, C); the TDNN "context" convs are
VALID (no padding) 1-D convs like the reference, so T shrinks by
sum((context-1)*dilation) = 4 + 4 + 6 = 14 frames total; BatchNorms are
affine-free (kaldi compatibility, reference tdnn.py:48).  forward returns
(embed_a, embed_b); callers use embed_b (reference executor takes
outputs[-1]).
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax

from .norm import BatchNorm
from .pooling import POOLING_LAYERS

__all__ = ["XVEC", "TdnnLayer"]


class TdnnLayer(nn.Module):
    """1-D conv -> ReLU -> affine-free BN (reference tdnn.py:23)."""

    out_dim: int
    context_size: int
    dilation: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(
            self.out_dim,
            (self.context_size,),
            kernel_dilation=(self.dilation,),
            padding="VALID",
            name="conv_1d",
        )(x)
        x = nn.relu(x)
        return BatchNorm(
            use_running_average=not train,
            momentum=0.9,
            epsilon=1e-5,
            use_bias=False,
            use_scale=False,
            name="bn",
        )(x)


class XVEC(nn.Module):
    """X-vector network (reference tdnn.py:57)."""

    feat_dim: int = 40
    hid_dim: int = 512
    stats_dim: int = 1500
    embed_dim: int = 512
    pooling_func: str = "TSTP"

    @nn.compact
    def __call__(self, x, mask: Optional[jax.Array] = None, train: bool = False):
        out = TdnnLayer(self.hid_dim, 5, 1, name="frame_1")(x, train)
        out = TdnnLayer(self.hid_dim, 3, 2, name="frame_2")(out, train)
        out = TdnnLayer(self.hid_dim, 3, 3, name="frame_3")(out, train)
        out = TdnnLayer(self.hid_dim, 1, 1, name="frame_4")(out, train)
        out = TdnnLayer(self.stats_dim, 1, 1, name="frame_5")(out, train)

        if mask is not None:
            # VALID convs removed 14 frames (receptive-field shrink).
            lost = x.shape[1] - out.shape[1]
            mask = mask[:, lost:]

        stats = POOLING_LAYERS[self.pooling_func](
            in_dim=self.stats_dim, name="pool"
        )(out, mask=mask, train=train)
        embed_a = nn.Dense(self.embed_dim, name="seg_1")(stats)
        h = nn.relu(embed_a)
        h = BatchNorm(
            use_running_average=not train,
            momentum=0.9,
            epsilon=1e-5,
            use_bias=False,
            use_scale=False,
            name="seg_bn_1",
        )(h)
        embed_b = nn.Dense(self.embed_dim, name="seg_2")(h)
        return embed_a, embed_b


def XVEC_factory(feat_dim, embed_dim, pooling_func="TSTP", **kw):
    return XVEC(feat_dim=feat_dim, embed_dim=embed_dim, pooling_func=pooling_func)
