"""RepVGG speaker backbones with structural reparameterization.

Parity with reference wespeaker/models/repvgg.py (RepVGGBlock:105 —
3x3+1x1+identity-BN train branches; RepSPKBlock:289 — RSBB 3x3 + dilated
3x3 branches, deploy 5x5; RepVGG:456; 19 factories :602-894;
repvgg_model_convert:590 + convert_repvgg.py).

TPU-native: NHWC (B, T, F, C); both axes stride /8 via strides
[1,1,2,2,2]; `deploy=True` builds the single-conv fast path;
`convert_repvgg_params` fuses a trained (params, batch_stats) pair into
deploy params — conv+BN fusion, 1x1 -> 3x3 center padding, identity BN ->
grouped-identity kernel, and the RSBB 3x3/dilated-3x3 -> 5x5 scatter.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from .pooling import POOLING_LAYERS
from .safe_conv import SafeConv
from .resnet import _bn

__all__ = ["RepVGG", "convert_repvgg_params", "REPVGG_FACTORIES"]

_OPTIONAL_GROUPWISE = [2, 4, 6, 8, 10, 12, 14, 16, 18, 20, 22, 24, 26]
G2_MAP = dict.fromkeys(_OPTIONAL_GROUPWISE, 2)
G4_MAP = dict.fromkeys(_OPTIONAL_GROUPWISE, 4)


class SEBlock2D(nn.Module):
    """Squeeze-excitation over (T, F) (reference repvgg.py:40)."""

    channels: int
    ratio: int = 4

    @nn.compact
    def __call__(self, x):
        s = jnp.mean(x, axis=(1, 2))
        s = nn.relu(nn.Dense(self.channels // self.ratio, name="fc1")(s))
        s = jax.nn.sigmoid(nn.Dense(self.channels, name="fc2")(s))
        return x * s[:, None, None, :]


class RepVGGBlock(nn.Module):
    """3x3 + 1x1 + identity-BN branches (train) / fused conv (deploy)."""

    out_channels: int
    stride: int = 1
    groups: int = 1
    deploy: bool = False
    use_se: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_channels = x.shape[-1]
        if self.deploy:
            out = SafeConv(
                self.out_channels,
                (3, 3),
                strides=(self.stride, self.stride),
                padding=[(1, 1), (1, 1)],
                feature_group_count=self.groups,
                name="reparam",
            )(x)
        else:
            dense = SafeConv(
                self.out_channels, (3, 3),
                strides=(self.stride, self.stride),
                padding=[(1, 1), (1, 1)],
                feature_group_count=self.groups,
                use_bias=False, name="dense_conv",
            )(x)
            dense = _bn(train, "dense_bn")(dense)
            one = SafeConv(
                self.out_channels, (1, 1),
                strides=(self.stride, self.stride),
                feature_group_count=self.groups,
                use_bias=False, name="one_conv",
            )(x)
            one = _bn(train, "one_bn")(one)
            out = dense + one
            if in_channels == self.out_channels and self.stride == 1:
                out = out + _bn(train, "id_bn")(x)
        out = nn.relu(out)
        if self.use_se:
            out = SEBlock2D(self.out_channels, 4, name="se")(out)
        return out


class RepSPKBlock(nn.Module):
    """RSBB: 3x3 + dilated-3x3 + identity-BN (reference repvgg.py:289)."""

    out_channels: int
    stride: int = 1
    groups: int = 1
    deploy: bool = False
    use_se: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_channels = x.shape[-1]
        if self.deploy:
            out = SafeConv(
                self.out_channels,
                (5, 5),
                strides=(self.stride, self.stride),
                padding=[(2, 2), (2, 2)],
                feature_group_count=self.groups,
                name="reparam",
            )(x)
        else:
            dense = SafeConv(
                self.out_channels, (3, 3),
                strides=(self.stride, self.stride),
                padding=[(1, 1), (1, 1)],
                feature_group_count=self.groups,
                use_bias=False, name="dense_conv",
            )(x)
            dense = _bn(train, "dense_bn")(dense)
            dil = SafeConv(
                self.out_channels, (3, 3),
                strides=(self.stride, self.stride),
                padding=[(2, 2), (2, 2)],
                kernel_dilation=(2, 2),
                feature_group_count=self.groups,
                use_bias=False, name="dil_conv",
            )(x)
            dil = _bn(train, "dil_bn")(dil)
            out = dense + dil
            if in_channels == self.out_channels and self.stride == 1:
                out = out + _bn(train, "id_bn")(x)
        out = nn.relu(out)
        if self.use_se:
            out = SEBlock2D(self.out_channels, 4, name="se")(out)
        return out


class RepVGG(nn.Module):
    num_blocks: Sequence[int]
    strides: Sequence[int]
    width_multiplier: Sequence[float]
    block: str = "RepVGG"  # 'RepVGG' | 'RepSPK'
    override_groups_map: Optional[Dict[int, int]] = None
    base_width: int = 64
    feat_dim: int = 80
    embed_dim: int = 256
    pooling_func: str = "TSTP"
    deploy: bool = False
    use_se: bool = False

    def _block_cls(self):
        return RepSPKBlock if self.block == "RepSPK" else RepVGGBlock

    @nn.compact
    def __call__(self, x, mask: Optional[jax.Array] = None, train: bool = False):
        wm = [w * (self.base_width / 64.0) for w in self.width_multiplier]
        groups_map = self.override_groups_map or {}
        blk = self._block_cls()

        h = x[..., None]  # (B, T, F, 1)
        in_planes = min(64, int(64 * wm[0]))
        h = blk(
            in_planes, stride=self.strides[0], deploy=self.deploy,
            use_se=self.use_se, name="stage0",
        )(h, train)

        layer_idx = 1
        widths = [int(64 * wm[0]), int(128 * wm[1]), int(256 * wm[2]),
                  int(512 * wm[3])]
        for si, (planes, n) in enumerate(zip(widths, self.num_blocks)):
            stride = self.strides[si + 1]
            for bi in range(n):
                h = blk(
                    planes,
                    stride=stride if bi == 0 else 1,
                    groups=groups_map.get(layer_idx, 1),
                    deploy=self.deploy,
                    use_se=self.use_se,
                    name=f"stage{si + 1}_{bi}",
                )(h, train)
                layer_idx += 1

        b, t = h.shape[0], h.shape[1]
        feat = h.reshape(b, t, -1)
        if mask is not None:
            n_stride2 = sum(1 for s in self.strides if s == 2)
            for _ in range(n_stride2):
                mask = mask[:, ::2]
            mask = mask[:, :t]
        stats = POOLING_LAYERS[self.pooling_func](
            in_dim=feat.shape[-1], name="pool"
        )(feat, mask=mask, train=train)
        return nn.Dense(self.embed_dim, name="seg")(stats)


# ---------------------------------------------------------------- convert
def _fuse_conv_bn(kernel, bn) -> Tuple[np.ndarray, np.ndarray]:
    """(k_h, k_w, in/g, out) conv kernel + BN stats -> fused kernel/bias."""
    gamma = np.asarray(bn["scale"])
    beta = np.asarray(bn["bias"])
    mean = np.asarray(bn["mean"])
    var = np.asarray(bn["var"])
    std = np.sqrt(var + 1e-5)
    t = gamma / std
    return np.asarray(kernel) * t, beta - mean * t


def _identity_kernel(channels: int, groups: int, ksize: int) -> np.ndarray:
    """Grouped identity as a (k, k, in/g, out) kernel with 1 at center."""
    in_per_group = channels // groups
    k = np.zeros((ksize, ksize, in_per_group, channels), np.float32)
    c = ksize // 2
    for i in range(channels):
        k[c, c, i % in_per_group, i] = 1.0
    return k


def _pad_center(kernel: np.ndarray, to: int) -> np.ndarray:
    """Zero-pad a (k,k,i,o) kernel to (to,to,i,o) centered."""
    k = kernel.shape[0]
    pad = (to - k) // 2
    return np.pad(kernel, ((pad, pad), (pad, pad), (0, 0), (0, 0)))


def _dilate_3x3_to_5x5(kernel: np.ndarray) -> np.ndarray:
    """(3,3,i,o) dilated-2 conv == (5,5,i,o) with taps at 0,2,4."""
    out = np.zeros((5, 5) + kernel.shape[2:], kernel.dtype)
    out[::2, ::2] = kernel
    return out


def convert_repvgg_params(
    params: Dict, batch_stats: Dict, block: str = "RepVGG"
) -> Dict:
    """Fuse trained branch params into deploy params
    (reference RepVGGBlock.get_equivalent_kernel_bias:220 /
    RepSPKBlock:375 and repvgg_model_convert:590).

    Returns a params tree for the SAME architecture constructed with
    deploy=True (each block holds a single 'reparam' conv)."""
    out: Dict = {}
    for name, p in params.items():
        if not name.startswith("stage"):
            out[name] = p
            continue
        bs = batch_stats.get(name, {})
        dense_k, dense_b = _fuse_conv_bn(
            p["dense_conv"]["kernel"],
            {**p["dense_bn"], **bs.get("dense_bn", {})},
        )
        target = 5 if block == "RepSPK" else 3
        kernel = _pad_center(dense_k, target) if target != 3 else dense_k
        bias = dense_b
        if block == "RepSPK":
            dil_k, dil_b = _fuse_conv_bn(
                p["dil_conv"]["kernel"],
                {**p["dil_bn"], **bs.get("dil_bn", {})},
            )
            kernel = kernel + _dilate_3x3_to_5x5(dil_k)
            bias = bias + dil_b
        else:
            one_k, one_b = _fuse_conv_bn(
                p["one_conv"]["kernel"],
                {**p["one_bn"], **bs.get("one_bn", {})},
            )
            kernel = kernel + _pad_center(one_k, 3)
            bias = bias + one_b
        if "id_bn" in p:
            channels = kernel.shape[-1]
            in_per_group = np.asarray(p["dense_conv"]["kernel"]).shape[2]
            groups = channels // in_per_group
            id_k, id_b = _fuse_conv_bn(
                _identity_kernel(channels, groups, target),
                {**p["id_bn"], **bs.get("id_bn", {})},
            )
            kernel = kernel + id_k
            bias = bias + id_b
        new_block = {"reparam": {"kernel": kernel, "bias": bias}}
        if "se" in p:
            new_block["se"] = p["se"]
        out[name] = new_block
    return out


def _factory(num_blocks, strides, wm, block="RepVGG", og=None):
    def make(feat_dim, embed_dim, pooling_func="TSTP", deploy=False,
             use_se=False, **kw):
        return RepVGG(
            num_blocks=num_blocks,
            strides=strides,
            width_multiplier=wm,
            block=block,
            override_groups_map=og,
            feat_dim=feat_dim,
            embed_dim=embed_dim,
            pooling_func=pooling_func,
            deploy=deploy,
            use_se=use_se,
        )

    return make


_S = (1, 1, 2, 2, 2)
REPVGG_FACTORIES = {
    "REPVGG_TINY_A0": _factory((3, 4, 23, 3), _S, (0.5, 0.5, 0.5, 0.5)),
    "REPVGG_TINY_RSBB_A0": _factory((3, 4, 23, 3), _S, (0.5, 0.5, 0.5, 0.5), "RepSPK"),
    "REPVGG_A0": _factory((2, 4, 14, 1), _S, (0.75, 0.75, 0.75, 2.5)),
    "REPVGG_RSBB_A0": _factory((2, 4, 14, 1), _S, (0.75, 0.75, 0.75, 2.5), "RepSPK"),
    "REPVGG_A1": _factory((2, 4, 14, 1), _S, (1, 1, 1, 2.5)),
    "REPVGG_A2": _factory((2, 4, 14, 1), _S, (1.5, 1.5, 1.5, 2.75)),
    "REPVGG_RSBB_A2": _factory((2, 4, 14, 1), _S, (1.5, 1.5, 1.5, 2.75), "RepSPK"),
    "REPVGG_B0": _factory((4, 6, 16, 1), _S, (1, 1, 1, 2.5)),
    "REPVGG_RSBB_B0": _factory((4, 6, 16, 1), _S, (1, 1, 1, 2.5), "RepSPK"),
    "REPVGG_B1": _factory((4, 6, 16, 1), _S, (2, 2, 2, 4)),
    "REPVGG_B1g2": _factory((4, 6, 16, 1), _S, (2, 2, 2, 4), og=G2_MAP),
    "REPVGG_B1g4": _factory((4, 6, 16, 1), _S, (2, 2, 2, 4), og=G4_MAP),
    "REPVGG_B2": _factory((4, 6, 16, 1), _S, (2.5, 2.5, 2.5, 5)),
    "REPVGG_B2g2": _factory((4, 6, 16, 1), _S, (2.5, 2.5, 2.5, 5), og=G2_MAP),
    "REPVGG_B2g4": _factory((4, 6, 16, 1), _S, (2.5, 2.5, 2.5, 5), og=G4_MAP),
    "REPVGG_B3": _factory((4, 6, 16, 1), _S, (3, 3, 3, 5)),
    "REPVGG_B3g2": _factory((4, 6, 16, 1), _S, (3, 3, 3, 5), og=G2_MAP),
    "REPVGG_B3g4": _factory((4, 6, 16, 1), _S, (3, 3, 3, 5), og=G4_MAP),
    "REPVGG_D2SE": _factory((8, 14, 24, 1), _S, (2.5, 2.5, 2.5, 5), og=G4_MAP),
}
