"""Dtype-preserving normalization layers.

flax's BatchNorm/LayerNorm compute statistics in float32 (good) but,
with the default `dtype=None`, also RETURN float32 whenever any input to
the dtype promotion is f32 — e.g. the batch mean they just computed.
Under bf16 mixed precision that silently upcasts activations after
every norm, so the BN-heavy speaker backbones (10-20 norms deep) run
nearly all their convs in f32: measured 60 GB of HBM traffic per train
step (~57% of v5e HBM roofline) with only a +7% gain from bf16.

These subclasses keep flax's f32 statistics but cast the result back to
the input dtype, so a bf16 forward stays bf16 end-to-end.  In f32 they
are identity-equivalent to the flax originals, and the parameter tree
(scale/bias + batch_stats mean/var) is unchanged — checkpoints and the
torch converters are unaffected.
"""

from __future__ import annotations

import flax.linen as nn

__all__ = ["BatchNorm", "LayerNorm", "GroupNorm"]


class BatchNorm(nn.BatchNorm):
    """nn.BatchNorm that returns the input's dtype (f32 stats inside)."""

    def __call__(self, x, use_running_average=None):
        y = super().__call__(x, use_running_average=use_running_average)
        return y.astype(x.dtype)


class LayerNorm(nn.LayerNorm):
    """nn.LayerNorm that returns the input's dtype (f32 stats inside)."""

    def __call__(self, x):
        y = super().__call__(x)
        return y.astype(x.dtype)


class GroupNorm(nn.GroupNorm):
    """nn.GroupNorm that returns the input's dtype (f32 stats inside)."""

    def __call__(self, x):
        y = super().__call__(x)
        return y.astype(x.dtype)
