"""SimAM-attention ResNet (VoxBlink2 models).

Parity with reference wespeaker/models/samresnet.py (SimAMBasicBlock:21,
SimAM_ResNet34_ASP:134, SimAM_ResNet100_ASP:152).  SimAM is the
parameter-free attention E_inv = d/(4(v+eps)) + 0.5 computed over the
spatial (time, freq) axes per channel; pooling is ASP.
"""

from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from .pooling import ASP
from .resnet import _bn, _downsample_mask

__all__ = ["SimAM_ResNet34_ASP", "SimAM_ResNet100_ASP"]


def simam(x: jax.Array, lambda_p: float = 1e-4) -> jax.Array:
    """(B, T, F, C): energy attention over spatial dims (reference
    samresnet.py:64-69)."""
    t, f = x.shape[1], x.shape[2]
    n = t * f - 1
    mu = jnp.mean(x, axis=(1, 2), keepdims=True)
    d = (x - mu) ** 2
    v = jnp.sum(d, axis=(1, 2), keepdims=True) / n
    e_inv = d / (4 * (v + lambda_p)) + 0.5
    return x * jax.nn.sigmoid(e_inv)


class SimAMBasicBlock(nn.Module):
    planes: int
    stride: int = 1

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
        out = simam(out)
        if self.stride != 1 or in_planes != self.planes:
            sc = nn.Conv(
                self.planes,
                (1, 1),
                strides=(self.stride, self.stride),
                use_bias=False,
                name="downsample_conv",
            )(x)
            sc = _bn(train, "downsample_bn")(sc)
        else:
            sc = x
        return nn.relu(out + sc)


class SimAMResNet(nn.Module):
    """SimAM front + ASP pooling + bottleneck Dense."""

    in_planes: int
    num_blocks: Sequence[int]
    embed_dim: int = 256
    feat_dim: int = 80

    @nn.compact
    def __call__(self, x, mask: Optional[jax.Array] = None, train: bool = False):
        h = x[..., None]
        h = nn.Conv(
            self.in_planes, (3, 3), padding=[(1, 1), (1, 1)], use_bias=False,
            name="conv1",
        )(h)
        h = nn.relu(_bn(train, "bn1")(h))

        widths = [self.in_planes * m for m in (1, 2, 4, 8)]
        strides = [1, 2, 2, 2]
        for li, (w, s, n) in enumerate(zip(widths, strides, self.num_blocks)):
            for bi in range(n):
                h = SimAMBasicBlock(
                    planes=w,
                    stride=s if bi == 0 else 1,
                    name=f"layer{li + 1}_{bi}",
                )(h, train)

        b, t = h.shape[0], h.shape[1]
        feat = h.reshape(b, t, -1)
        if mask is not None:
            mask = _downsample_mask(mask, 3)[:, :t]
        stats = ASP(in_dim=feat.shape[-1], name="pooling")(
            feat, mask=mask, train=train
        )
        return nn.Dense(self.embed_dim, name="bottleneck")(stats)


def SimAM_ResNet34_ASP(feat_dim=80, embed_dim=256, **kw):
    return SimAMResNet(64, (3, 4, 6, 3), embed_dim, feat_dim)


def SimAM_ResNet100_ASP(feat_dim=80, embed_dim=256, **kw):
    return SimAMResNet(64, (6, 16, 24, 3), embed_dim, feat_dim)
