"""Golden-Gemini DF-ResNet: depth-first inverted bottlenecks with the T14c
temporal-stride strategy.

Parity with reference wespeaker/models/gemini_dfresnet.py
(Inverted_Bottleneck:30, Gemini_DF_ResNet:51, factories 60/114/183/237).
TPU-native NHWC (B, T, F, C): downsample stages stride frequency /2 each
(total /16) but time only at stage 2 (stride_t = [1, 2, 1, 1] — the
"sweet spot" of the Gemini paper), so stats_dim = feat/16 * dims[-1].
The 3x3 depthwise conv uses feature_group_count == channels.
"""

from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from .norm import BatchNorm
from .safe_conv import SafeConv
from .pooling import POOLING_LAYERS
from .resnet import _bn

__all__ = [
    "Gemini_DF_ResNet",
    "Gemini_DF_ResNet60",
    "Gemini_DF_ResNet114",
    "Gemini_DF_ResNet183",
    "Gemini_DF_ResNet237",
]


class InvertedBottleneck(nn.Module):
    """1x1 expand x4 -> 3x3 depthwise -> 1x1 project, residual
    (reference gemini_dfresnet.py:30)."""

    dim: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        out = nn.Conv(4 * self.dim, (1, 1), use_bias=False, name="conv1")(x)
        out = nn.relu(_bn(train, "bn1")(out))
        out = SafeConv(
            4 * self.dim,
            (3, 3),
            padding=[(1, 1), (1, 1)],
            feature_group_count=4 * self.dim,
            use_bias=False,
            name="conv2",
        )(out)
        out = nn.relu(_bn(train, "bn2")(out))
        out = nn.Conv(self.dim, (1, 1), use_bias=False, name="conv3")(out)
        out = _bn(train, "bn3")(out)
        return nn.relu(out + x)


class Gemini_DF_ResNet(nn.Module):
    depths: Sequence[int]
    dims: Sequence[int]
    feat_dim: int = 40
    embed_dim: int = 128
    pooling_func: str = "TSTP"
    two_emb_layer: bool = False

    @nn.compact
    def __call__(self, x, mask: Optional[jax.Array] = None, train: bool = False):
        x = x[..., None]  # (B, T, F, 1)
        # stem
        h = nn.Conv(
            self.dims[0], (3, 3), padding=[(1, 1), (1, 1)], use_bias=False,
            name="stem_conv",
        )(x)
        h = nn.relu(_bn(train, "stem_bn")(h))

        stride_f = [2, 2, 2, 2]
        stride_t = [1, 2, 1, 1]
        for i in range(4):
            h = nn.Conv(
                self.dims[i + 1],
                (3, 3),
                strides=(stride_t[i], stride_f[i]),
                padding=[(1, 1), (1, 1)],
                use_bias=False,
                name=f"down{i + 1}_conv",
            )(h)
            h = _bn(train, f"down{i + 1}_bn")(h)
            for j in range(self.depths[i]):
                h = InvertedBottleneck(
                    self.dims[i + 1], name=f"stage{i + 1}_{j}"
                )(h, train)

        b, t = h.shape[0], h.shape[1]
        feat = h.reshape(b, t, -1)
        if mask is not None:
            mask = mask[:, ::2][:, :t]  # one temporal stride-2 (stage 2)

        stats = POOLING_LAYERS[self.pooling_func](
            in_dim=feat.shape[-1], name="pool"
        )(feat, mask=mask, train=train)
        embed_a = nn.Dense(self.embed_dim, name="seg_1")(stats)
        if self.two_emb_layer:
            h2 = nn.relu(embed_a)
            h2 = BatchNorm(
                use_running_average=not train,
                momentum=0.9,
                epsilon=1e-5,
                use_bias=False,
                use_scale=False,
                name="seg_bn_1",
            )(h2)
            embed_b = nn.Dense(self.embed_dim, name="seg_2")(h2)
            return embed_a, embed_b
        return jnp.zeros(()), embed_a


def Gemini_DF_ResNet60(feat_dim, embed_dim, pooling_func="TSTP", two_emb_layer=False, **kw):
    return Gemini_DF_ResNet((3, 3, 9, 3), (32, 32, 64, 128, 256), feat_dim,
                            embed_dim, pooling_func, two_emb_layer)


def Gemini_DF_ResNet114(feat_dim, embed_dim, pooling_func="TSTP", two_emb_layer=False, **kw):
    return Gemini_DF_ResNet((3, 3, 27, 3), (32, 32, 64, 128, 256), feat_dim,
                            embed_dim, pooling_func, two_emb_layer)


def Gemini_DF_ResNet183(feat_dim, embed_dim, pooling_func="TSTP", two_emb_layer=False, **kw):
    return Gemini_DF_ResNet((3, 8, 45, 3), (32, 32, 64, 128, 256), feat_dim,
                            embed_dim, pooling_func, two_emb_layer)


def Gemini_DF_ResNet237(feat_dim, embed_dim, pooling_func="TSTP", two_emb_layer=False, **kw):
    return Gemini_DF_ResNet((3, 8, 63, 3), (32, 32, 64, 128, 256), feat_dim,
                            embed_dim, pooling_func, two_emb_layer)
