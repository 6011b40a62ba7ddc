"""r-vector ResNet backbones (reference: wespeaker/models/resnet.py —
BasicBlock:35, Bottleneck:72, ResNet:110, factories :207-260).

TPU-native design:
  * NHWC layout (B, T, F, C) — time as H, frequency as W, channels last —
    the layout XLA's TPU conv emitter prefers; the reference uses NCHW
    (B, 1, F, T) for cuDNN.
  * stride-2 stages halve BOTH time and frequency (like the reference);
    the pooling mask is downsampled with ceil-division per stage.
  * frame-level map (B, T', F', C') flattens to (B, T', F'*C') for the
    temporal pooling.  NOTE the flatten order is (freq-major, channel-minor)
    vs the reference's (channel-major, freq-minor); torch weight importers
    must permute the first pooled Dense accordingly.
  * no bias on convs, BN after each conv (momentum 0.9 / eps 1e-5 matching
    torch defaults).

forward returns (embed_a, embed_b) with embed_b = 0.0 when
two_emb_layer=False, mirroring the reference's (tensor(0.), embed_a)
convention — callers always take the LAST non-placeholder output via
`embedding_from_outputs`.
"""

from __future__ import annotations

from typing import Optional, Sequence, Type

import flax.linen as nn
import jax
import jax.numpy as jnp

from .norm import BatchNorm
from .pooling import POOLING_LAYERS

__all__ = [
    "ResNet",
    "ResNet18",
    "ResNet34",
    "ResNet50",
    "ResNet101",
    "ResNet152",
    "ResNet221",
    "ResNet293",
]


def _bn(train, name):
    return BatchNorm(
        use_running_average=not train, momentum=0.9, epsilon=1e-5, name=name
    )


class BasicBlock(nn.Module):
    """3x3 + 3x3 residual block (reference resnet.py:35)."""

    planes: int
    stride: int = 1
    expansion = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_planes = x.shape[-1]
        out = nn.Conv(
            self.planes,
            (3, 3),
            strides=(self.stride, self.stride),
            padding=[(1, 1), (1, 1)],
            use_bias=False,
            name="conv1",
        )(x)
        out = nn.relu(_bn(train, "bn1")(out))
        out = nn.Conv(
            self.planes, (3, 3), padding=[(1, 1), (1, 1)], use_bias=False,
            name="conv2",
        )(out)
        out = _bn(train, "bn2")(out)
        if self.stride != 1 or in_planes != self.planes:
            sc = nn.Conv(
                self.planes,
                (1, 1),
                strides=(self.stride, self.stride),
                use_bias=False,
                name="shortcut_conv",
            )(x)
            sc = _bn(train, "shortcut_bn")(sc)
        else:
            sc = x
        return nn.relu(out + sc)


class Bottleneck(nn.Module):
    """1x1 -> 3x3 -> 1x1 bottleneck block (reference resnet.py:72)."""

    planes: int
    stride: int = 1
    expansion = 4

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_planes = x.shape[-1]
        out_planes = self.planes * self.expansion
        out = nn.Conv(self.planes, (1, 1), use_bias=False, name="conv1")(x)
        out = nn.relu(_bn(train, "bn1")(out))
        out = nn.Conv(
            self.planes,
            (3, 3),
            strides=(self.stride, self.stride),
            padding=[(1, 1), (1, 1)],
            use_bias=False,
            name="conv2",
        )(out)
        out = nn.relu(_bn(train, "bn2")(out))
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


def _downsample_mask(mask: jax.Array, times: int) -> jax.Array:
    """Valid-length mask through `times` stride-2 (pad-1, k-3) stages:
    out_len = ceil(len/2) each stage.  Implemented as strided slicing."""
    for _ in range(times):
        mask = mask[:, ::2]
    return mask


class _ConvKernel(nn.Module):
    """Parameter-only stand-in for nn.Conv (same name/shape/init) whose
    kernel is consumed by the space-to-depth execution path."""

    shape: tuple

    @nn.compact
    def __call__(self):
        return self.param(
            "kernel", nn.initializers.lecun_normal(), self.shape
        )


class _S2DBasicBlock(nn.Module):
    """BasicBlock executed in space-to-depth blocked form (stride 1,
    in_planes == planes — the layer1 shape).  Identical param tree to
    BasicBlock; see models/resnet_s2d.py for the transform."""

    planes: int

    @nn.compact
    def __call__(self, st, train: bool = False):
        from . import resnet_s2d as s2d

        c = self.planes
        w1 = _ConvKernel((3, 3, c, c), name="conv1")()
        w2 = _ConvKernel((3, 3, c, c), name="conv2")()
        sc = st
        out = s2d.blocked_conv_s1(st, w1)
        out = s2d.BlockedBatchNorm(name="bn1")(out, train)
        out = s2d.BlockedState(
            nn.relu(out.x), out.ot, out.of, out.t, out.f
        )
        out = s2d.blocked_conv_s1(out, w2)
        out = s2d.BlockedBatchNorm(name="bn2")(out, train)
        sc = s2d.align_like(sc, out)
        return s2d.BlockedState(
            nn.relu(out.x + sc.x), out.ot, out.of, out.t, out.f
        )


class _S2DEntryBlock(nn.Module):
    """First block of layer2 (stride 2, widening) consuming the blocked
    layer1 output and emitting the normal layout — conv1 and the 1x1
    shortcut read blocked input; identical param tree to BasicBlock."""

    planes: int

    @nn.compact
    def __call__(self, st, train: bool = False):
        from . import resnet_s2d as s2d

        in_planes = st.x.shape[-1] // 4
        w1 = _ConvKernel((3, 3, in_planes, self.planes), name="conv1")()
        out = s2d.blocked_conv_entry(st, w1)
        out = nn.relu(_bn(train, "bn1")(out))
        out = nn.Conv(
            self.planes, (3, 3), padding=[(1, 1), (1, 1)], use_bias=False,
            name="conv2",
        )(out)
        out = _bn(train, "bn2")(out)
        sc = nn.Conv(
            self.planes, (1, 1), use_bias=False, name="shortcut_conv"
        )(s2d.shortcut_entry(st))
        sc = _bn(train, "shortcut_bn")(sc)
        return nn.relu(out + sc)


class ResNet(nn.Module):
    """Speaker ResNet over (B, T, F) fbank (reference resnet.py:110)."""

    block: Type[nn.Module]
    num_blocks: Sequence[int]
    m_channels: int = 32
    feat_dim: int = 40
    embed_dim: int = 128
    pooling_func: str = "TSTP"
    two_emb_layer: bool = False
    # Execute conv1 + layer1 (the 32-channel full-resolution stem) in
    # space-to-depth blocked form: exact weight rearrangement that fills
    # the MXU's 128 output lanes (models/resnet_s2d.py).  Param tree is
    # identical either way, so the flag flips freely per run.
    # INFERENCE-ONLY by measured A/B (round 5, real v5e chip): extraction
    # +15.5% (13,969 -> 16,138 audio-s/s bf16), but the TRAIN step LOSES
    # ~8% (5,428 -> 5,007) — the backward runs at ~80% of HBM bandwidth
    # (round-3 trace) where the 1.78x blocked FLOPs cost more than the
    # 4x MXU-lane win returns, and the blocked dW/masked-BN backward add
    # traffic.  So the transform engages only when train=False.
    s2d_stem: bool = True

    @nn.compact
    def __call__(self, x, mask: Optional[jax.Array] = None, train: bool = False):
        # (B, T, F) -> NHWC (B, T, F, 1)
        x = x[..., None]
        use_s2d = (
            self.s2d_stem and self.block is BasicBlock and not train
        )
        if use_s2d:
            from . import resnet_s2d as s2d

            t_real, f_real = x.shape[1], x.shape[2]
            st = s2d.fold_input(x, t_real, f_real)
            w1 = _ConvKernel((3, 3, 1, self.m_channels), name="conv1")()
            st = s2d.blocked_conv_s1(st, w1)
            st = s2d.BlockedBatchNorm(name="bn1")(st, train)
            st = s2d.BlockedState(
                nn.relu(st.x), st.ot, st.of, st.t, st.f
            )
            for bi in range(self.num_blocks[0]):
                st = _S2DBasicBlock(
                    planes=self.m_channels, name=f"layer1_{bi}"
                )(st, train)
            out = _S2DEntryBlock(
                planes=self.m_channels * 2, name="layer2_0"
            )(st, train)
        else:
            out = nn.Conv(
                self.m_channels, (3, 3), padding=[(1, 1), (1, 1)],
                use_bias=False, name="conv1",
            )(x)
            out = nn.relu(_bn(train, "bn1")(out))

        widths = [self.m_channels * m for m in (1, 2, 4, 8)]
        strides = [1, 2, 2, 2]
        for li, (w, s, n) in enumerate(zip(widths, strides, self.num_blocks)):
            for bi in range(n):
                if use_s2d and (li == 0 or (li == 1 and bi == 0)):
                    continue  # executed in the blocked stem above
                out = self.block(
                    planes=w,
                    stride=s if bi == 0 else 1,
                    name=f"layer{li + 1}_{bi}",
                )(out, train)

        # (B, T', F', C') -> (B, T', F'*C')
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
            embed_b = nn.Dense(self.embed_dim, name="seg_2")(h)
            return embed_a, embed_b
        return jnp.zeros(()), embed_a


def ResNet18(feat_dim, embed_dim, pooling_func="TSTP", two_emb_layer=False, **kw):
    return ResNet(BasicBlock, (2, 2, 2, 2), 32, feat_dim, embed_dim,
                  pooling_func, two_emb_layer)


def ResNet34(feat_dim, embed_dim, pooling_func="TSTP", two_emb_layer=False, **kw):
    return ResNet(BasicBlock, (3, 4, 6, 3), 32, feat_dim, embed_dim,
                  pooling_func, two_emb_layer)


def ResNet50(feat_dim, embed_dim, pooling_func="TSTP", two_emb_layer=False, **kw):
    return ResNet(Bottleneck, (3, 4, 6, 3), 32, feat_dim, embed_dim,
                  pooling_func, two_emb_layer)


def ResNet101(feat_dim, embed_dim, pooling_func="TSTP", two_emb_layer=False, **kw):
    return ResNet(Bottleneck, (3, 4, 23, 3), 32, feat_dim, embed_dim,
                  pooling_func, two_emb_layer)


def ResNet152(feat_dim, embed_dim, pooling_func="TSTP", two_emb_layer=False, **kw):
    return ResNet(Bottleneck, (3, 8, 36, 3), 32, feat_dim, embed_dim,
                  pooling_func, two_emb_layer)


def ResNet221(feat_dim, embed_dim, pooling_func="TSTP", two_emb_layer=False, **kw):
    return ResNet(Bottleneck, (6, 16, 48, 3), 32, feat_dim, embed_dim,
                  pooling_func, two_emb_layer)


def ResNet293(feat_dim, embed_dim, pooling_func="TSTP", two_emb_layer=False, **kw):
    return ResNet(Bottleneck, (10, 20, 64, 3), 32, feat_dim, embed_dim,
                  pooling_func, two_emb_layer)
