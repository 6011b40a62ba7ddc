"""Res2Net r-vector backbone (multi-scale residual blocks).

Parity with reference wespeaker/models/res2net.py (BasicBlockRes2Net:34,
Res2Net:96, factories Res2Net34_Base:192 / Res2Net34_Large:203).  Same
TPU-native conventions as resnet.py: NHWC (B, T, F, C), mask-aware pooling,
frame map flattened (freq-major, channel-minor) before temporal pooling.

Block: 1x1(stride) -> hierarchical 3x3 groups (scale-way split, running
sum like Res2Net) -> 1x1 expand (expansion=2), identity/projection
shortcut, final ReLU.
"""

from __future__ import annotations

import math
from typing import Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from .norm import BatchNorm
from .pooling import POOLING_LAYERS
from .resnet import _bn, _downsample_mask

__all__ = ["Res2Net", "Res2Net34_Base", "Res2Net34_Large"]


class BasicBlockRes2Net(nn.Module):
    planes: int
    stride: int = 1
    base_width: int = 32
    scale: int = 2
    expansion = 2

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_planes = x.shape[-1]
        width = int(math.floor(self.planes * (self.base_width / 64.0)))
        out_planes = self.planes * self.expansion

        out = nn.Conv(
            width * self.scale,
            (1, 1),
            strides=(self.stride, self.stride),
            use_bias=False,
            name="conv1",
        )(x)
        out = nn.relu(_bn(train, "bn1")(out))

        nums = self.scale - 1
        spx = [
            out[..., i * width : (i + 1) * width] for i in range(self.scale)
        ]
        outs = []
        sp = spx[0]
        for i in range(nums):
            if i >= 1:
                sp = sp + spx[i]
            sp = nn.Conv(
                width, (3, 3), padding=[(1, 1), (1, 1)], use_bias=False,
                name=f"convs_{i}",
            )(sp)
            sp = nn.relu(_bn(train, f"bns_{i}")(sp))
            outs.append(sp)
        outs.append(spx[nums])
        out = jnp.concatenate(outs, axis=-1)

        out = nn.Conv(out_planes, (1, 1), use_bias=False, name="conv3")(out)
        out = _bn(train, "bn3")(out)

        if self.stride != 1 or in_planes != out_planes:
            sc = nn.Conv(
                out_planes,
                (1, 1),
                strides=(self.stride, self.stride),
                use_bias=False,
                name="shortcut_conv",
            )(x)
            sc = _bn(train, "shortcut_bn")(sc)
        else:
            sc = x
        return nn.relu(out + sc)


class Res2Net(nn.Module):
    m_channels: int
    num_blocks: Sequence[int]
    feat_dim: int = 80
    embed_dim: int = 192
    pooling_func: str = "TSTP"
    two_emb_layer: bool = False

    @nn.compact
    def __call__(self, x, mask: Optional[jax.Array] = None, train: bool = False):
        x = x[..., None]  # (B, T, F, 1)
        out = nn.Conv(
            self.m_channels, (3, 3), padding=[(1, 1), (1, 1)], use_bias=False,
            name="conv1",
        )(x)
        out = nn.relu(_bn(train, "bn1")(out))

        widths = [self.m_channels * m for m in (1, 2, 4, 8)]
        strides = [1, 2, 2, 2]
        for li, (w, s, n) in enumerate(zip(widths, strides, self.num_blocks)):
            for bi in range(n):
                out = BasicBlockRes2Net(
                    planes=w,
                    stride=s if bi == 0 else 1,
                    name=f"layer{li + 1}_{bi}",
                )(out, train)

        b, t = out.shape[0], out.shape[1]
        feat = out.reshape(b, t, -1)
        if mask is not None:
            mask = _downsample_mask(mask, 3)[:, :t]

        stats = POOLING_LAYERS[self.pooling_func](
            in_dim=feat.shape[-1], name="pool"
        )(feat, mask=mask, train=train)
        embed_a = nn.Dense(self.embed_dim, name="seg_1")(stats)
        if self.two_emb_layer:
            h = nn.relu(embed_a)
            h = BatchNorm(
                use_running_average=not train,
                momentum=0.9,
                epsilon=1e-5,
                use_bias=False,
                use_scale=False,
                name="seg_bn_1",
            )(h)
            return nn.Dense(self.embed_dim, name="seg_2")(h)
        return embed_a


def Res2Net34_Base(feat_dim, embed_dim, pooling_func="TSTP", two_emb_layer=False, **kw):
    return Res2Net(32, (3, 4, 6, 3), feat_dim, embed_dim, pooling_func,
                   two_emb_layer)


def Res2Net34_Large(feat_dim, embed_dim, pooling_func="TSTP", two_emb_layer=False, **kw):
    return Res2Net(64, (3, 4, 6, 3), feat_dim, embed_dim, pooling_func,
                   two_emb_layer)
