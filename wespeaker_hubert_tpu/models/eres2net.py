"""ERes2Net: Res2Net with attentional feature fusion (AFF) — local fusion
inside blocks (diff_AFF) and bottom-up global fusion across stages.

Parity with reference wespeaker/models/eres2net.py (ReLU clamp [0,20]:44,
AFF:75, BasicBlockERes2Net:106 (note nums == scale, all splits convolved),
BasicBlockERes2Net_diff_AFF:168, ERes2Net:243 with per-stage downsample
convs and fuse12 -> fuse123 -> fuse1234, factories :380-430).
NHWC conventions as resnet.py.
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

__all__ = ["ERes2Net", "ERes2Net34_Base", "ERes2Net34_Large", "ERes2Net34_aug"]


def relu20(x):
    """Hardtanh(0, 20) — the reference's clipped ReLU (eres2net.py:44)."""
    return jnp.clip(x, 0.0, 20.0)


class AFF(nn.Module):
    """Attentional feature fusion (reference :75): gate from concat ->
    bottleneck MLP (SiLU) -> 1 + tanh; x*g + y*(2-g)."""

    channels: int
    r: int = 4

    @nn.compact
    def __call__(self, x, ds_y, train: bool = False):
        inter = self.channels // self.r
        a = jnp.concatenate([x, ds_y], axis=-1)
        a = nn.Conv(inter, (1, 1), name="att_conv1")(a)
        a = _bn(train, "att_bn1")(a)
        a = nn.silu(a)
        a = nn.Conv(self.channels, (1, 1), name="att_conv2")(a)
        a = _bn(train, "att_bn2")(a)
        g = 1.0 + jnp.tanh(a)
        return x * g + ds_y * (2.0 - g)


class BasicBlockERes2Net(nn.Module):
    """Res2-style block where ALL `scale` splits get convolved
    (reference :106: nums == scale, no passthrough split)."""

    planes: int
    stride: int = 1
    base_width: int = 32
    scale: int = 2
    expansion: int = 2

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_planes = x.shape[-1]
        width = int(math.floor(self.planes * (self.base_width / 64.0)))
        out_planes = self.planes * self.expansion

        out = nn.Conv(
            width * self.scale, (1, 1),
            strides=(self.stride, self.stride), use_bias=False, name="conv1",
        )(x)
        out = relu20(_bn(train, "bn1")(out))

        spx = [out[..., i * width : (i + 1) * width] for i in range(self.scale)]
        outs = []
        sp = spx[0]
        for i in range(self.scale):
            if i >= 1:
                sp = sp + spx[i]
            sp = nn.Conv(
                width, (3, 3), padding=[(1, 1), (1, 1)], use_bias=False,
                name=f"convs_{i}",
            )(sp)
            sp = relu20(_bn(train, f"bns_{i}")(sp))
            outs.append(sp)
        out = jnp.concatenate(outs, axis=-1)

        out = nn.Conv(out_planes, (1, 1), use_bias=False, name="conv3")(out)
        out = _bn(train, "bn3")(out)

        if self.stride != 1 or in_planes != out_planes:
            sc = nn.Conv(
                out_planes, (1, 1), strides=(self.stride, self.stride),
                use_bias=False, name="shortcut_conv",
            )(x)
            sc = _bn(train, "shortcut_bn")(sc)
        else:
            sc = x
        return relu20(out + sc)


class BasicBlockERes2NetDiffAFF(nn.Module):
    """Same but split-fusion goes through AFF instead of addition
    (reference :168)."""

    planes: int
    stride: int = 1
    base_width: int = 32
    scale: int = 2
    expansion: int = 2

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_planes = x.shape[-1]
        width = int(math.floor(self.planes * (self.base_width / 64.0)))
        out_planes = self.planes * self.expansion

        out = nn.Conv(
            width * self.scale, (1, 1),
            strides=(self.stride, self.stride), use_bias=False, name="conv1",
        )(x)
        out = relu20(_bn(train, "bn1")(out))

        spx = [out[..., i * width : (i + 1) * width] for i in range(self.scale)]
        sp = nn.Conv(
            width, (3, 3), padding=[(1, 1), (1, 1)], use_bias=False,
            name="conv2_1",
        )(spx[0])
        sp = relu20(_bn(train, "bn2_1")(sp))
        outs = [sp]
        for i in range(1, self.scale):
            sp = AFF(width, name=f"fuse_{i - 1}")(sp, spx[i], train)
            sp = nn.Conv(
                width, (3, 3), padding=[(1, 1), (1, 1)], use_bias=False,
                name=f"convs_{i - 1}",
            )(sp)
            sp = relu20(_bn(train, f"bns_{i - 1}")(sp))
            outs.append(sp)
        out = jnp.concatenate(outs, axis=-1)

        out = nn.Conv(out_planes, (1, 1), use_bias=False, name="conv3")(out)
        out = _bn(train, "bn3")(out)
        if self.stride != 1 or in_planes != out_planes:
            sc = nn.Conv(
                out_planes, (1, 1), strides=(self.stride, self.stride),
                use_bias=False, name="shortcut_conv",
            )(x)
            sc = _bn(train, "shortcut_bn")(sc)
        else:
            sc = x
        return relu20(out + sc)


class ERes2Net(nn.Module):
    m_channels: int
    num_blocks: Sequence[int]
    base_width: int = 32
    scale: int = 2
    expansion: int = 2
    feat_dim: int = 80
    embed_dim: int = 192
    pooling_func: str = "TSTP"
    two_emb_layer: bool = False

    @nn.compact
    def __call__(self, x, mask: Optional[jax.Array] = None, train: bool = False):
        mc, exp = self.m_channels, self.expansion
        h = x[..., None]
        h = nn.Conv(
            mc, (3, 3), padding=[(1, 1), (1, 1)], use_bias=False, name="conv1"
        )(h)
        h = nn.relu(_bn(train, "bn1")(h))

        def stage(block_cls, h, planes, n, stride, name):
            for bi in range(n):
                h = block_cls(
                    planes=planes,
                    stride=stride if bi == 0 else 1,
                    base_width=self.base_width,
                    scale=self.scale,
                    expansion=exp,
                    name=f"{name}_{bi}",
                )(h, train)
            return h

        out1 = stage(BasicBlockERes2Net, h, mc, self.num_blocks[0], 1, "layer1")
        out2 = stage(BasicBlockERes2Net, out1, mc * 2, self.num_blocks[1], 2, "layer2")
        out1_ds = nn.Conv(
            mc * exp * 2, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)],
            use_bias=False, name="layer1_downsample",
        )(out1)
        fuse12 = AFF(mc * exp * 2, name="fuse_mode12")(out2, out1_ds, train)

        out3 = stage(
            BasicBlockERes2NetDiffAFF, out2, mc * 4, self.num_blocks[2], 2,
            "layer3",
        )
        fuse12_ds = nn.Conv(
            mc * exp * 4, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)],
            use_bias=False, name="layer2_downsample",
        )(fuse12)
        fuse123 = AFF(mc * exp * 4, name="fuse_mode123")(out3, fuse12_ds, train)

        out4 = stage(
            BasicBlockERes2NetDiffAFF, out3, mc * 8, self.num_blocks[3], 2,
            "layer4",
        )
        fuse123_ds = nn.Conv(
            mc * exp * 8, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)],
            use_bias=False, name="layer3_downsample",
        )(fuse123)
        fuse1234 = AFF(mc * exp * 8, name="fuse_mode1234")(
            out4, fuse123_ds, train
        )

        b, t = fuse1234.shape[0], fuse1234.shape[1]
        feat = fuse1234.reshape(b, t, -1)
        if mask is not None:
            mask = _downsample_mask(mask, 3)[:, :t]
        stats = POOLING_LAYERS[self.pooling_func](
            in_dim=feat.shape[-1], name="pool"
        )(feat, mask=mask, train=train)
        embed_a = nn.Dense(self.embed_dim, name="seg_1")(stats)
        if self.two_emb_layer:
            h2 = nn.relu(embed_a)
            h2 = BatchNorm(
                use_running_average=not train, momentum=0.9, epsilon=1e-5,
                use_bias=False, use_scale=False, name="seg_bn_1",
            )(h2)
            return nn.Dense(self.embed_dim, name="seg_2")(h2)
        return embed_a


def ERes2Net34_Base(feat_dim, embed_dim, pooling_func="TSTP", two_emb_layer=False, **kw):
    return ERes2Net(32, (3, 4, 6, 3), feat_dim=feat_dim, embed_dim=embed_dim,
                    pooling_func=pooling_func, two_emb_layer=two_emb_layer)


def ERes2Net34_Large(feat_dim, embed_dim, pooling_func="TSTP", two_emb_layer=False, **kw):
    return ERes2Net(64, (3, 4, 6, 3), feat_dim=feat_dim, embed_dim=embed_dim,
                    pooling_func=pooling_func, two_emb_layer=two_emb_layer)


def ERes2Net34_aug(feat_dim, embed_dim, pooling_func="TSTP", two_emb_layer=False,
                   expansion=4, base_width=24, scale=3, **kw):
    return ERes2Net(64, (3, 4, 6, 3), base_width=base_width, scale=scale,
                    expansion=expansion, feat_dim=feat_dim, embed_dim=embed_dim,
                    pooling_func=pooling_func, two_emb_layer=two_emb_layer)
