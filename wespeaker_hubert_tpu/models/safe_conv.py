"""nn.Conv drop-in with a partitioner-safe grouped weight gradient.

XLA's SPMD partitioner mis-scales grouped-conv WEIGHT grads by the
mesh's replication degree (ops/conv_safe.py docstring + minimal repro;
tests/test_conv_safe.py pins the bug).  Any grouped/depthwise conv in a
backbone that is REPLICATED over a 'model'/'pipe' axis while the batch
shards over 'data' — i.e. every TP/pp training run of ReDimNet, Gemini
DF-ResNet or RepVGG-gX — trains with dw multiplied by that degree.

SafeConv keeps nn.Conv's parameter names/shapes/initializers (kernel
(k..., C_in/g, C_out), bias (C_out,)) so checkpoints and the torch
converters are untouched, and routes the compute through the
custom-VJP grouped convs whose dw is computed with dot_generals.
Dense convs (feature_group_count == 1) delegate to the regular path
(their grads are correct)."""

from __future__ import annotations

from typing import Sequence, Tuple, Union

import flax.linen as nn
import jax
from jax import lax

from ..ops.conv_safe import grouped_conv1d, grouped_conv2d

__all__ = ["SafeConv"]


def _resolve_padding(padding, kernel_size, strides, in_spatial):
    """lax-compatible explicit ((lo, hi), ...) pads for 'SAME'/'VALID'/
    explicit padding, matching nn.Conv's semantics."""
    if isinstance(padding, str):
        return tuple(
            lax.padtype_to_pads(
                in_spatial, kernel_size, strides, padding.upper()
            )
        )
    return tuple(tuple(p) for p in padding)


class SafeConv(nn.Module):
    features: int
    kernel_size: Sequence[int]
    strides: Union[int, Sequence[int], None] = None
    padding: Union[str, Sequence[Tuple[int, int]]] = "SAME"
    feature_group_count: int = 1
    use_bias: bool = True
    kernel_dilation: Union[int, Sequence[int], None] = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        ks = tuple(self.kernel_size)
        nd = len(ks)
        assert nd in (1, 2), ks
        strides = self.strides
        if strides is None:
            strides = (1,) * nd
        elif isinstance(strides, int):
            strides = (strides,) * nd
        else:
            strides = tuple(strides)
        g = self.feature_group_count
        cg = x.shape[-1] // g
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), ks + (cg, self.features)
        )
        dil = self.kernel_dilation
        if dil is None:
            dil = (1,) * nd
        elif isinstance(dil, int):
            dil = (dil,) * nd
        else:
            dil = tuple(dil)
        # SAME padding must account for the dilated kernel extent
        eff_ks = tuple((kk - 1) * dd + 1 for kk, dd in zip(ks, dil))
        pads = _resolve_padding(self.padding, eff_ks, strides, x.shape[1:-1])
        k = kernel.astype(x.dtype)
        if g == 1:
            dn = ("NWC", "WIO", "NWC") if nd == 1 else ("NHWC", "HWIO", "NHWC")
            y = lax.conv_general_dilated(
                x, k, strides, pads, rhs_dilation=dil,
                dimension_numbers=dn, feature_group_count=1,
            )
        elif nd == 1:
            assert dil == (1,), "1-D SafeConv: dilation unsupported"
            y = grouped_conv1d(x, k, strides[0], pads, g)
        else:
            y = grouped_conv2d(x, k, strides, pads, g, dil)
        if self.use_bias:
            bias = self.param(
                "bias", nn.initializers.zeros, (self.features,)
            )
            y = y + bias.astype(y.dtype)
        return y
