"""Partitioner-safe grouped convolutions.

XLA's SPMD partitioner mis-reduces the WEIGHT gradient of grouped
convolutions (`feature_group_count > 1`) when the operands are
replicated over mesh axes that don't shard the batch: the grad-conv
gets an extra psum over every replicated axis, scaling dw by exactly
(total devices / data-axis size).  Minimal repro (jax 0.9, CPU and TPU):

    mesh = Mesh(devices.reshape(4, 2), ("data", "model"))
    y = lax.conv_general_dilated(x, w, (1,), "SAME",
                                 dimension_numbers=("NWC","WIO","NWC"),
                                 feature_group_count=4)
    grad wrt w of sum(y^2) with x sharded P('data')  ->  2x the true dw
    (4x on a ('data','pipe','model') = (2,2,2) mesh).

Dense convolutions (feature_group_count == 1) are unaffected, as is the
INPUT gradient of grouped convs (no cross-device reduction).  This hits
any model that trains a grouped conv on a mesh with a tensor-parallel /
pipeline axis: the SSL frontend's positional conv (g=16) under the
class-sharded-head TP layout, and the depthwise backbones (ReDimNet,
Gemini DF-ResNet, RepVGG-gX) if trained with model_parallel > 1.

The fix here is a custom-VJP grouped conv:
  * forward: the regular lax conv (fast path, unchanged),
  * input grad: the standard transposed conv via jax.vjp (correct),
  * WEIGHT grad: computed as per-tap dot_generals — a scan over the
    kernel taps of einsum('btgc,btgo->gco') contractions, whose
    partitioning the SPMD partitioner handles correctly (plain matmul
    reductions over the batch axis only).  Same FLOPs as the grad-conv,
    backward-only.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax

__all__ = ["grouped_conv1d", "grouped_conv2d"]


def _conv1d(x, w, stride, padding, g):
    return lax.conv_general_dilated(
        x,
        w,
        window_strides=(stride,),
        padding=padding,
        dimension_numbers=("NWC", "WIO", "NWC"),
        feature_group_count=g,
    )


@partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def grouped_conv1d(
    x: jax.Array,
    w: jax.Array,
    stride: int,
    padding: Tuple[Tuple[int, int]],
    g: int,
) -> jax.Array:
    """(B, W, C) x (k, C//g, C_out) -> (B, T, C_out), NWC/WIO, grouped.

    Drop-in for the lax grouped conv with a partitioner-safe weight
    gradient (see module docstring).  `padding` is an explicit
    ((lo, hi),) pair like lax's."""
    return _conv1d(x, w, stride, padding, g)


def _fwd(x, w, stride, padding, g):
    return _conv1d(x, w, stride, padding, g), (x, w)


def _bwd(stride, padding, g, res, ct):
    x, w = res
    # input grad: the standard transposed-conv VJP (no cross-batch
    # reduction -> not affected by the partitioner bug)
    _, vjp_x = jax.vjp(lambda xx: _conv1d(xx, w, stride, padding, g), x)
    (dx,) = vjp_x(ct)

    # weight grad as per-tap matmuls:
    #   dw[kk, ci, o] = sum_{b,t} x_pad[b, t*stride + kk, gi(o)*cg + ci]
    #                            * ct[b, t, o]
    k, cg, c_out = w.shape
    b, t, _ = ct.shape
    og = c_out // g
    (lo, hi) = padding[0]
    xp = jnp.pad(x, ((0, 0), (lo, hi), (0, 0)))
    xg = xp.reshape(b, xp.shape[1], g, cg)
    ctg = ct.reshape(b, t, g, og)
    span = (t - 1) * stride + 1

    def tap(_, kk):
        xk = lax.dynamic_slice_in_dim(xg, kk, span, axis=1)
        if stride > 1:
            xk = xk[:, ::stride]
        # f32 accumulation regardless of a bf16 residual stream: weight
        # grads feed the f32 master-weight optimizer update
        dw_k = jnp.einsum(
            "btgc,btgo->gco", xk, ctg,
            preferred_element_type=jnp.float32,
        )
        return _, dw_k

    _, dws = lax.scan(tap, 0, jnp.arange(k))
    dw = dws.transpose(0, 2, 1, 3).reshape(k, cg, c_out).astype(w.dtype)
    return dx, dw


grouped_conv1d.defvjp(_fwd, _bwd)


def _conv2d(x, w, strides, padding, g, dilation=(1, 1)):
    return lax.conv_general_dilated(
        x,
        w,
        window_strides=strides,
        padding=padding,
        rhs_dilation=dilation,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=g,
    )


@partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5))
def grouped_conv2d(
    x: jax.Array,
    w: jax.Array,
    strides: Tuple[int, int],
    padding: Tuple[Tuple[int, int], Tuple[int, int]],
    g: int,
    dilation: Tuple[int, int] = (1, 1),
) -> jax.Array:
    """(B, H, W, C) x (kh, kw, C//g, C_out) -> NHWC grouped conv with a
    partitioner-safe weight gradient (see module docstring) — the 2-D
    counterpart for the depthwise backbones (ReDimNet, Gemini
    DF-ResNet, RepVGG-gX), whose dw is mis-scaled by the replication
    degree when trained with model_parallel > 1.  `dilation` is the
    kernel (rhs) dilation (RepVGG's dilated branch)."""
    return _conv2d(x, w, strides, padding, g, dilation)


def _fwd2(x, w, strides, padding, g, dilation):
    return _conv2d(x, w, strides, padding, g, dilation), (x, w)


def _bwd2(strides, padding, g, dilation, res, ct):
    x, w = res
    _, vjp_x = jax.vjp(
        lambda xx: _conv2d(xx, w, strides, padding, g, dilation), x
    )
    (dx,) = vjp_x(ct)

    kh, kw, cg, c_out = w.shape
    b, ho, wo, _ = ct.shape
    og = c_out // g
    (tlo, thi), (llo, lhi) = padding
    sh, sw = strides
    xp = jnp.pad(x, ((0, 0), (tlo, thi), (llo, lhi), (0, 0)))
    xg = xp.reshape(b, xp.shape[1], xp.shape[2], g, cg)
    ctg = ct.reshape(b, ho, wo, g, og)
    span_h = (ho - 1) * sh + 1
    span_w = (wo - 1) * sw + 1

    dh, dw_dil = dilation

    def tap(_, k):
        a, bb = k // kw, k % kw
        xk = lax.dynamic_slice(
            xg, (0, a * dh, bb * dw_dil, 0, 0),
            (b, span_h, span_w, g, cg),
        )
        if sh > 1 or sw > 1:
            xk = xk[:, ::sh, ::sw]
        dw_k = jnp.einsum(
            "bhwgc,bhwgo->gco", xk, ctg,
            preferred_element_type=jnp.float32,
        )
        return _, dw_k

    _, dws = lax.scan(tap, 0, jnp.arange(kh * kw))
    dw = (
        dws.reshape(kh, kw, g, cg, og)
        .transpose(0, 1, 3, 2, 4)
        .reshape(kh, kw, cg, c_out)
        .astype(w.dtype)
    )
    return dx, dw


grouped_conv2d.defvjp(_fwd2, _bwd2)
