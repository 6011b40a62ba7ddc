"""CAM++ backbone: FCM 2-D head + densely-connected CAM-TDNN trunk.

Parity with reference wespeaker/models/campplus.py (CAMLayer:86,
CAMDenseTDNNBlock:173, FCM:282, CAMPPlus:333).  TPU-native conventions:
channels-last, 1x1 convs as Dense matmuls, the FCM head in NHWC
(time as H, freq as W; the freq axis is strided /8, time untouched).

Context-aware mask (CAMLayer): local conv output gated by
sigmoid(MLP(global mean + 100-frame segment means)) — the segment pooling
is implemented as a static reshape-mean (T padded to a multiple of the
segment length with count-corrected averaging, matching avg_pool1d
ceil_mode semantics).
"""

from __future__ import annotations

import math
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from .norm import BatchNorm
from .pooling import POOLING_LAYERS

__all__ = ["CAMPPlus"]


def _bn(train, name, affine=True):
    return BatchNorm(
        use_running_average=not train,
        momentum=0.9,
        epsilon=1e-5,
        use_bias=affine,
        use_scale=affine,
        name=name,
    )


class BasicResBlock(nn.Module):
    """Freq-strided 2-D residual block (reference campplus.py:244 — stride
    applies to the frequency axis only)."""

    planes: int
    stride: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_planes = x.shape[-1]
        # NHWC = (B, T, F, C): stride on F only
        out = nn.Conv(
            self.planes,
            (3, 3),
            strides=(1, self.stride),
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
                strides=(1, self.stride),
                use_bias=False,
                name="shortcut_conv",
            )(x)
            sc = _bn(train, "shortcut_bn")(sc)
        else:
            sc = x
        return nn.relu(out + sc)


class FCM(nn.Module):
    """Front-end conv module: freq /8, outputs (B, T, F//8 * C)
    (reference campplus.py:282)."""

    m_channels: int = 32

    @nn.compact
    def __call__(self, x, train: bool = False):
        # x: (B, T, F) -> NHWC (B, T, F, 1)
        h = x[..., None]
        h = nn.Conv(
            self.m_channels, (3, 3), padding=[(1, 1), (1, 1)], use_bias=False,
            name="conv1",
        )(h)
        h = nn.relu(_bn(train, "bn1")(h))
        for li in range(2):
            for bi in range(2):
                h = BasicResBlock(
                    self.m_channels,
                    stride=2 if bi == 0 else 1,
                    name=f"layer{li + 1}_{bi}",
                )(h, train)
        h = nn.Conv(
            self.m_channels,
            (3, 3),
            strides=(1, 2),
            padding=[(1, 1), (1, 1)],
            use_bias=False,
            name="conv2",
        )(h)
        h = nn.relu(_bn(train, "bn2")(h))
        b, t = h.shape[0], h.shape[1]
        return h.reshape(b, t, -1)


def _seg_pooling(x: jax.Array, seg_len: int = 100) -> jax.Array:
    """(B, T, C) -> per-segment mean repeated back to T (ceil_mode avg:
    the last partial segment averages only its real frames)."""
    b, t, c = x.shape
    n_seg = math.ceil(t / seg_len)
    pad = n_seg * seg_len - t
    xp = jnp.pad(x, ((0, 0), (0, pad), (0, 0)))
    sums = xp.reshape(b, n_seg, seg_len, c).sum(axis=2)
    counts = jnp.minimum(
        jnp.full((n_seg,), seg_len), t - jnp.arange(n_seg) * seg_len
    ).astype(x.dtype)
    means = sums / counts[None, :, None]
    rep = jnp.repeat(means, seg_len, axis=1)
    return rep[:, :t]


class CAMLayer(nn.Module):
    """Local conv gated by context-aware mask (reference campplus.py:86)."""

    bn_channels: int
    out_channels: int
    kernel_size: int
    dilation: int
    reduction: int = 2

    @nn.compact
    def __call__(self, x, train: bool = False):
        pad = (self.kernel_size - 1) // 2 * self.dilation
        y = nn.Conv(
            self.out_channels,
            (self.kernel_size,),
            kernel_dilation=(self.dilation,),
            padding=[(pad, pad)],
            use_bias=False,
            name="linear_local",
        )(x)
        context = jnp.mean(x, axis=1, keepdims=True) + _seg_pooling(x)
        context = nn.relu(
            nn.Dense(self.bn_channels // self.reduction, name="linear1")(context)
        )
        m = jax.nn.sigmoid(nn.Dense(self.out_channels, name="linear2")(context))
        return y * m


class CAMDenseTDNNLayer(nn.Module):
    """BN-ReLU -> 1x1 bottleneck -> BN-ReLU -> CAM conv
    (reference campplus.py:139)."""

    out_channels: int
    bn_channels: int
    kernel_size: int
    dilation: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        h = nn.relu(_bn(train, "nonlinear1_bn")(x))
        h = nn.Dense(self.bn_channels, use_bias=False, name="linear1")(h)
        h = nn.relu(_bn(train, "nonlinear2_bn")(h))
        return CAMLayer(
            self.bn_channels,
            self.out_channels,
            self.kernel_size,
            self.dilation,
            name="cam_layer",
        )(h, train)


class CAMPPlus(nn.Module):
    """CAM++ (reference campplus.py:333): FCM head -> strided TDNN ->
    3 dense blocks (12/24/16 layers, growth 32) with transit halving ->
    BN-ReLU -> pooling -> Dense+affine-free-BN embedding."""

    feat_dim: int = 80
    embed_dim: int = 512
    pooling_func: str = "TSTP"
    growth_rate: int = 32
    bn_size: int = 4
    init_channels: int = 128

    @nn.compact
    def __call__(self, x, mask: Optional[jax.Array] = None, train: bool = False):
        h = FCM(name="head")(x, train)  # (B, T, 32 * F//8)

        # tdnn: k=5, stride 2 on time, pad 2
        h = nn.Conv(
            self.init_channels,
            (5,),
            strides=(2,),
            padding=[(2, 2)],
            use_bias=False,
            name="tdnn_conv",
        )(h)
        h = nn.relu(_bn(train, "tdnn_bn")(h))

        channels = self.init_channels
        for i, (num_layers, ksize, dil) in enumerate(
            zip((12, 24, 16), (3, 3, 3), (1, 2, 2))
        ):
            for j in range(num_layers):
                out = CAMDenseTDNNLayer(
                    self.growth_rate,
                    self.bn_size * self.growth_rate,
                    ksize,
                    dil,
                    name=f"block{i + 1}_tdnnd{j + 1}",
                )(h, train)
                h = jnp.concatenate([h, out], axis=-1)
            channels += num_layers * self.growth_rate
            h = nn.relu(_bn(train, f"transit{i + 1}_bn")(h))
            h = nn.Dense(
                channels // 2, use_bias=False, name=f"transit{i + 1}_linear"
            )(h)
            channels //= 2

        h = nn.relu(_bn(train, "out_bn")(h))

        if mask is not None:
            # time was strided /2 by the tdnn layer
            mask = mask[:, ::2][:, : h.shape[1]]
        stats = POOLING_LAYERS[self.pooling_func](
            in_dim=channels, name="pool"
        )(h, mask=mask, train=train)
        emb = nn.Dense(self.embed_dim, use_bias=False, name="dense_linear")(stats)
        emb = _bn(train, "dense_bn", affine=False)(emb)
        return emb
