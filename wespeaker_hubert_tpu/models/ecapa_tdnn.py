"""ECAPA-TDNN speaker-embedding backbone.

Capability parity with the reference ECAPA implementation
(reference: wespeaker/models/ecapa_tdnn.py — Res2Conv1dReluBn:29,
SE_Connect:113, SE_Res2Block:133, ECAPA_TDNN:160, factories :237-274),
re-designed TPU-first:

  * channels-LAST (B, T, C): linen Conv is natively NWC, which is the
    TPU-preferred layout (C on lanes feeds the MXU without transposes);
    the reference permutes to (B, F, T) for cuDNN Conv1d.
  * all convs are dense 1-D convolutions lowered by XLA onto the MXU;
    dilation via kernel_dilation, 'SAME'-style explicit padding preserves T.
  * pooling is mask-aware (padded bucketed eval batches), see pooling.py.
  * block structure: conv -> relu -> BN ordering inside blocks follows the
    reference exactly so torch checkpoints can be imported for parity tests.

forward returns the embedding; `frame_level_feat` exposes the pre-pooling
MFA features (reference get_frame_level_feat at ecapa_tdnn.py:216).
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from .norm import BatchNorm
from .pooling import POOLING_LAYERS

__all__ = [
    "EcapaTdnn",
    "ECAPA_TDNN_c512",
    "ECAPA_TDNN_GLOB_c512",
    "ECAPA_TDNN_c1024",
    "ECAPA_TDNN_GLOB_c1024",
]


class ConvReluBn(nn.Module):
    """Conv1d -> ReLU -> BN (reference Conv1dReluBn at ecapa_tdnn.py:83)."""

    channels: int
    kernel_size: int = 1
    dilation: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        pad = (self.kernel_size - 1) // 2 * self.dilation
        x = nn.Conv(
            self.channels,
            (self.kernel_size,),
            kernel_dilation=(self.dilation,),
            padding=[(pad, pad)],
            name="conv",
        )(x)
        x = nn.relu(x)
        return BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5, name="bn"
        )(x)


class Res2ConvReluBn(nn.Module):
    """Res2Net-style hierarchical grouped conv
    (reference Res2Conv1dReluBn at ecapa_tdnn.py:29): split C into `scale`
    groups; group i (1 <= i < scale-1) convolves spx[i] + prev output; the
    last group passes through."""

    channels: int
    kernel_size: int = 3
    dilation: int = 1
    scale: int = 8

    @nn.compact
    def __call__(self, x, train: bool = False):
        assert self.channels % self.scale == 0
        width = self.channels // self.scale
        nums = self.scale if self.scale == 1 else self.scale - 1
        pad = (self.kernel_size - 1) // 2 * self.dilation

        spx = [
            x[..., i * width : (i + 1) * width] for i in range(self.scale)
        ]
        out = []
        sp = spx[0]
        for i in range(nums):
            if i >= 1:
                sp = sp + spx[i]
            sp = nn.Conv(
                width,
                (self.kernel_size,),
                kernel_dilation=(self.dilation,),
                padding=[(pad, pad)],
                name=f"conv_{i}",
            )(sp)
            sp = BatchNorm(
                use_running_average=not train,
                momentum=0.9,
                epsilon=1e-5,
                name=f"bn_{i}",
            )(nn.relu(sp))
            out.append(sp)
        if self.scale != 1:
            out.append(spx[self.scale - 1])
        return jnp.concatenate(out, axis=-1)


class SEConnect(nn.Module):
    """Squeeze-excitation over time (reference SE_Connect at
    ecapa_tdnn.py:113)."""

    channels: int
    se_bottleneck_dim: int = 128

    @nn.compact
    def __call__(self, x, mask: Optional[jax.Array] = None):
        if mask is None:
            s = jnp.mean(x, axis=1)
        else:
            m = mask[:, :, None].astype(x.dtype)
            s = jnp.sum(x * m, axis=1) / jnp.maximum(jnp.sum(m, axis=1), 1.0)
        s = nn.relu(nn.Dense(self.se_bottleneck_dim, name="linear1")(s))
        s = jax.nn.sigmoid(nn.Dense(self.channels, name="linear2")(s))
        return x * s[:, None, :]


class SERes2Block(nn.Module):
    """conv1x1 -> res2conv -> conv1x1 -> SE, residual add
    (reference SE_Res2Block at ecapa_tdnn.py:133)."""

    channels: int
    kernel_size: int = 3
    dilation: int = 2
    scale: int = 8

    @nn.compact
    def __call__(self, x, mask=None, train: bool = False):
        h = ConvReluBn(self.channels, 1, name="conv1")(x, train)
        h = Res2ConvReluBn(
            self.channels, self.kernel_size, self.dilation, self.scale, name="res2"
        )(h, train)
        h = ConvReluBn(self.channels, 1, name="conv2")(h, train)
        h = SEConnect(self.channels, name="se")(h, mask)
        return x + h


class EcapaTdnn(nn.Module):
    """ECAPA-TDNN (reference ECAPA_TDNN at ecapa_tdnn.py:160).

    Input (B, T, feat_dim) fbank; output (B, embed_dim) embedding.
    """

    channels: int = 512
    feat_dim: int = 80
    embed_dim: int = 192
    pooling_func: str = "ASTP"
    global_context_att: bool = False
    emb_bn: bool = False

    def _frame_level(self, x, mask, train):
        out1 = ConvReluBn(self.channels, 5, name="layer1")(x, train)
        out2 = SERes2Block(self.channels, 3, 2, 8, name="layer2")(
            out1, mask, train
        )
        out3 = SERes2Block(self.channels, 3, 3, 8, name="layer3")(
            out2, mask, train
        )
        out4 = SERes2Block(self.channels, 3, 4, 8, name="layer4")(
            out3, mask, train
        )
        out = jnp.concatenate([out2, out3, out4], axis=-1)
        out = nn.Conv(512 * 3, (1,), name="conv")(out)
        return out, out4

    @nn.compact
    def __call__(
        self,
        x,
        mask: Optional[jax.Array] = None,
        train: bool = False,
    ):
        out, _ = self._frame_level(x, mask, train)
        out = nn.relu(out)
        pool_cls = POOLING_LAYERS[self.pooling_func]
        kwargs = {}
        if self.pooling_func == "ASTP":
            kwargs["global_context_att"] = self.global_context_att
        out = pool_cls(in_dim=512 * 3, name="pool", **kwargs)(
            out, mask=mask, train=train
        )
        out = BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5, name="bn"
        )(out)
        out = nn.Dense(self.embed_dim, name="linear")(out)
        if self.emb_bn:
            out = BatchNorm(
                use_running_average=not train,
                momentum=0.9,
                epsilon=1e-5,
                name="bn2",
            )(out)
        return out

    @nn.compact
    def frame_level_feat(self, x, mask=None, train: bool = False):
        """Pre-pooling MFA features, (B, T, 1536)."""
        return self._frame_level(x, mask, train)[0]


def ECAPA_TDNN_c512(feat_dim, embed_dim, pooling_func="ASTP", emb_bn=False, **kw):
    return EcapaTdnn(512, feat_dim, embed_dim, pooling_func, False, emb_bn)


def ECAPA_TDNN_GLOB_c512(feat_dim, embed_dim, pooling_func="ASTP", emb_bn=False, **kw):
    return EcapaTdnn(512, feat_dim, embed_dim, pooling_func, True, emb_bn)


def ECAPA_TDNN_c1024(feat_dim, embed_dim, pooling_func="ASTP", emb_bn=False, **kw):
    return EcapaTdnn(1024, feat_dim, embed_dim, pooling_func, False, emb_bn)


def ECAPA_TDNN_GLOB_c1024(feat_dim, embed_dim, pooling_func="ASTP", emb_bn=False, **kw):
    return EcapaTdnn(1024, feat_dim, embed_dim, pooling_func, True, emb_bn)
