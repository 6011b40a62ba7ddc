"""Temporal pooling library: frame-level features -> utterance vectors.

Functional parity with the reference pooling zoo
(reference: wespeaker/models/pooling_layers.py — TAP:27, TSDP:47, TSTP:67,
ASTP:92, ASP:151, MHASTP:176, MQMHASTP:250, XI:313) re-designed TPU-first:

  * channels-LAST (B, T, D) layout so the feature axis sits on TPU lanes and
    the attention 1x1-convs become plain (.., D) @ (D, H) matmuls on the MXU
    (the reference uses (B, D, T) Conv1d to avoid transposes on GPU);
  * every pooling takes an optional `mask` (B, T) so padded bucketed eval
    batches are exact — the reference avoids masking by using batch=1 at
    eval time;
  * pure functions of (params, x): no modules mutating state.

Backbones with 4-D (B, T, F, C) maps flatten F*C into D before pooling,
mirroring the reference's reshape of (B, C, F, T) -> (B, C*F, T).
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn

from .norm import BatchNorm
import jax
import jax.numpy as jnp

__all__ = [
    "TAP",
    "TSDP",
    "TSTP",
    "ASTP",
    "ASP",
    "MHASTP",
    "MQMHASTP",
    "XI",
    "POOLING_LAYERS",
    "pooling_output_dim",
]


def _flatten_4d(x: jax.Array) -> jax.Array:
    """(B, T, F, C) -> (B, T, F*C)."""
    if x.ndim == 4:
        b, t = x.shape[0], x.shape[1]
        return x.reshape(b, t, -1)
    return x


def _masked_moments(x, mask, eps=1e-7):
    """Mean/std over time with optional (B, T) validity mask."""
    if mask is None:
        mean = jnp.mean(x, axis=1)
        var = jnp.var(x, axis=1)
    else:
        m = mask[:, :, None].astype(x.dtype)
        denom = jnp.maximum(jnp.sum(m, axis=1), 1.0)
        mean = jnp.sum(x * m, axis=1) / denom
        var = jnp.sum((x - mean[:, None, :]) ** 2 * m, axis=1) / denom
    std = jnp.sqrt(var + eps)
    return mean, std


class TAP(nn.Module):
    """Temporal average pooling (reference pooling_layers.py:27)."""

    in_dim: int = 0

    @nn.compact
    def __call__(self, x, mask: Optional[jax.Array] = None, train: bool = False):
        x = _flatten_4d(x)
        mean, _ = _masked_moments(x, mask)
        return mean

    @staticmethod
    def out_dim(in_dim):
        return in_dim


class TSDP(nn.Module):
    """Temporal standard-deviation pooling (reference pooling_layers.py:47)."""

    in_dim: int = 0

    @nn.compact
    def __call__(self, x, mask: Optional[jax.Array] = None, train: bool = False):
        x = _flatten_4d(x)
        _, std = _masked_moments(x, mask)
        return std

    @staticmethod
    def out_dim(in_dim):
        return in_dim


class TSTP(nn.Module):
    """Temporal statistics pooling: concat(mean, std) — the x-vector pooling
    (reference pooling_layers.py:67)."""

    in_dim: int = 0

    @nn.compact
    def __call__(self, x, mask: Optional[jax.Array] = None, train: bool = False):
        x = _flatten_4d(x)
        mean, std = _masked_moments(x, mask)
        return jnp.concatenate([mean, std], axis=-1)

    @staticmethod
    def out_dim(in_dim):
        return 2 * in_dim


class _GlobalContextDense(nn.Module):
    """Dense over the [x, mean, std] global-context concat WITHOUT
    materializing the (B, T, 3C) tensor.

    The kernel keeps nn.Dense's exact parameter tree (kernel (3C, H),
    bias (H,), lecun-normal init) so torch-imported checkpoints are
    unaffected, but the forward splits it into per-part blocks: the
    time-varying part is a (B, T, C) @ (C, H) matmul and the global
    mean/std parts collapse to a broadcast (B, 1, H) add.  Measured on
    TPU v5e (perf_model_ab.py): 1.2 ms/train-step cheaper than the
    concat form for ECAPA-c1024 (B=128, T=200) — 3x fewer attention
    FLOPs and ~150 MB less HBM traffic per materialization.
    """

    features: int

    @nn.compact
    def __call__(self, x, mean, std):
        c = x.shape[-1]
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (3 * c, self.features)
        )
        bias = self.param("bias", nn.initializers.zeros_init(), (self.features,))
        # same promotion rule as nn.Dense(dtype=None)
        x, mean, std, kernel, bias = nn.dtypes.promote_dtype(
            x, mean, std, kernel, bias, dtype=None
        )
        glob = (
            mean[:, None, :] @ kernel[c : 2 * c]
            + std[:, None, :] @ kernel[2 * c :]
            + bias
        )
        return x @ kernel[:c] + glob


class ASTP(nn.Module):
    """Attentive statistics pooling, ECAPA-style
    (reference pooling_layers.py:92: tanh bottleneck -> softmax over time ->
    weighted mean/std; optional global mean/std context concat)."""

    in_dim: int
    bottleneck_dim: int = 128
    global_context_att: bool = False

    @nn.compact
    def __call__(self, x, mask: Optional[jax.Array] = None, train: bool = False):
        x = _flatten_4d(x)
        # 1x1 convs over time == per-frame dense layers (MXU matmuls).
        if self.global_context_att:
            mean, std = _masked_moments(x, mask)
            a = _GlobalContextDense(self.bottleneck_dim, name="linear1")(
                x, mean, std
            )
        else:
            a = nn.Dense(self.bottleneck_dim, name="linear1")(x)
        a = jnp.tanh(a)
        scores = nn.Dense(self.in_dim, name="linear2")(a)  # (B, T, D)
        if mask is not None:
            neg = jnp.finfo(scores.dtype).min
            scores = jnp.where(mask[:, :, None], scores, neg)
        alpha = jax.nn.softmax(scores, axis=1)
        mean = jnp.sum(alpha * x, axis=1)
        var = jnp.sum(alpha * x**2, axis=1) - mean**2
        std = jnp.sqrt(jnp.clip(var, min=1e-7))
        return jnp.concatenate([mean, std], axis=-1)

    @staticmethod
    def out_dim(in_dim):
        return 2 * in_dim


class _AttentionHead(nn.Module):
    """Per-head attention-score MLP for MHASTP: layer_num 1x1 'convs' with
    tanh between (reference pooling_layers.py:199-216)."""

    dims: tuple  # (hidden..., out)

    @nn.compact
    def __call__(self, x):
        h = x
        for i, d in enumerate(self.dims[:-1]):
            h = jnp.tanh(nn.Dense(d, name=f"att_{i}")(h))
        return nn.Dense(self.dims[-1], name=f"att_{len(self.dims) - 1}")(h)


class ASP(nn.Module):
    """Attentive statistics pooling with conv-BN attention (used by the
    SimAM ResNets; reference pooling_layers.py:151): Dense(128) -> ReLU ->
    BN -> Dense(in_dim) -> softmax over time -> weighted mean/std."""

    in_dim: int
    bottleneck_dim: int = 128

    @nn.compact
    def __call__(self, x, mask: Optional[jax.Array] = None, train: bool = False):
        x = _flatten_4d(x)
        h = nn.relu(nn.Dense(self.bottleneck_dim, name="att1")(x))
        h = BatchNorm(
            use_running_average=not train, momentum=0.9, name="att_bn"
        )(h)
        scores = nn.Dense(self.in_dim, name="att2")(h)
        if mask is not None:
            neg = jnp.finfo(scores.dtype).min
            scores = jnp.where(mask[:, :, None], scores, neg)
        w = jax.nn.softmax(scores, axis=1)
        mu = jnp.sum(x * w, axis=1)
        sg = jnp.sqrt(jnp.clip(jnp.sum(x**2 * w, axis=1) - mu**2, min=1e-5))
        return jnp.concatenate([mu, sg], axis=-1)

    @staticmethod
    def out_dim(in_dim):
        return 2 * in_dim


class MHASTP(nn.Module):
    """Multi-head attentive statistics pooling
    (reference pooling_layers.py:176: split D into heads, per-head attention
    score over time, per-head weighted stats, concat)."""

    in_dim: int
    layer_num: int = 2
    head_num: int = 2
    d_s: int = 1
    bottleneck_dim: int = 64

    @nn.compact
    def __call__(self, x, mask: Optional[jax.Array] = None, train: bool = False):
        x = _flatten_4d(x)
        assert self.in_dim % self.head_num == 0
        d_model = self.in_dim // self.head_num
        d_s = d_model if self.d_s > 1 else 1
        dims = [self.bottleneck_dim] * (self.layer_num + 1)
        dims[0], dims[-1] = d_model, d_s
        # dims[0] is the input dim of the first layer; layers output dims[1:].
        outs = []
        for h in range(self.head_num):
            chunk = x[..., h * d_model : (h + 1) * d_model]
            scores = _AttentionHead(tuple(dims[1:]), name=f"head_{h}")(chunk)
            if mask is not None:
                neg = jnp.finfo(scores.dtype).min
                scores = jnp.where(mask[:, :, None], scores, neg)
            alpha = jax.nn.softmax(scores, axis=1)
            mean = jnp.sum(alpha * chunk, axis=1)
            var = jnp.sum(alpha * chunk**2, axis=1) - mean**2
            std = jnp.sqrt(jnp.clip(var, min=1e-7))
            outs.append(jnp.concatenate([mean, std], axis=-1))
        return jnp.concatenate(outs, axis=-1)

    @staticmethod
    def out_dim(in_dim):
        return 2 * in_dim


class MQMHASTP(nn.Module):
    """Multi-query multi-head attentive statistics pooling
    (reference pooling_layers.py:250: query_num independent MHASTPs,
    concatenated)."""

    in_dim: int
    layer_num: int = 2
    query_num: int = 2
    head_num: int = 8
    d_s: int = 2
    bottleneck_dim: int = 64

    @nn.compact
    def __call__(self, x, mask: Optional[jax.Array] = None, train: bool = False):
        x = _flatten_4d(x)
        outs = [
            MHASTP(
                self.in_dim,
                layer_num=self.layer_num,
                head_num=self.head_num,
                d_s=self.d_s,
                bottleneck_dim=self.bottleneck_dim,
                name=f"query_{q}",
            )(x, mask)
            for q in range(self.query_num)
        ]
        return jnp.concatenate(outs, axis=-1)

    @staticmethod
    def out_dim(in_dim, query_num=2):
        return 2 * in_dim * query_num


class XI(nn.Module):
    """Xi-vector Gaussian-posterior pooling (reference pooling_layers.py:313):
    a frame-precision estimator network plus learned prior mean/log-precision;
    the pooled vector is the posterior mean under precision-weighted
    attention over frames + the prior pseudo-frame."""

    in_dim: int
    hidden_size: int = 256
    stddev: bool = False

    @nn.compact
    def __call__(self, x, mask: Optional[jax.Array] = None, train: bool = False):
        x = _flatten_4d(x)
        b, t, d = x.shape
        assert d == self.in_dim

        prior_mean = self.param("prior_mean", nn.initializers.zeros, (1, d))
        prior_logprec = self.param("prior_logprec", nn.initializers.zeros, (1, d))

        h = nn.Dense(self.hidden_size, name="lin1")(x)
        h = nn.relu(h)
        h = BatchNorm(
            use_running_average=not train, momentum=0.9, name="bn1"
        )(h)
        logprec = jax.nn.softplus(nn.Dense(d, name="lin2")(h))
        logprec = 2.0 * jnp.log(logprec)  # (B, T, D)
        if mask is not None:
            # Invalid frames get -inf precision -> zero posterior weight.
            neg = jnp.finfo(logprec.dtype).min
            logprec = jnp.where(mask[:, :, None], logprec, neg)

        # Append the prior as one extra pseudo-frame along time.
        logprec_all = jnp.concatenate(
            [logprec, jnp.broadcast_to(prior_logprec[None], (b, 1, d))], axis=1
        )
        feat_all = jnp.concatenate(
            [x, jnp.broadcast_to(prior_mean[None], (b, 1, d))], axis=1
        )
        attn = jax.nn.softmax(logprec_all, axis=1)
        phi = jnp.sum(feat_all * attn, axis=1)
        if self.stddev:
            sigma2 = jnp.sum(feat_all**2 * attn, axis=1)
            sigma = jnp.sqrt(jnp.clip(sigma2 - phi**2, min=1e-12))
            return jnp.concatenate([phi, sigma], axis=-1)
        return phi

    @staticmethod
    def out_dim(in_dim, stddev=False):
        return 2 * in_dim if stddev else in_dim


POOLING_LAYERS = {
    "TAP": TAP,
    "TSDP": TSDP,
    "TSTP": TSTP,
    "ASTP": ASTP,
    "ASP": ASP,
    "MHASTP": MHASTP,
    "MQMHASTP": MQMHASTP,
    "XI": XI,
}


def pooling_output_dim(pool_type: str, in_dim: int, **kwargs) -> int:
    if pool_type in ("TAP", "TSDP"):
        return in_dim
    if pool_type in ("TSTP", "ASTP", "ASP", "MHASTP"):
        return 2 * in_dim
    if pool_type == "MQMHASTP":
        return 2 * in_dim * kwargs.get("query_num", 2)
    if pool_type == "XI":
        return 2 * in_dim if kwargs.get("stddev", False) else in_dim
    raise ValueError(f"unknown pooling {pool_type}")
