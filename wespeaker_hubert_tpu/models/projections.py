"""Margin-softmax classifier heads (the training-time projection).

Functional parity with the reference heads
(reference: wespeaker/models/projections.py — get_projection:25,
SphereFace2:66, ArcMarginProduct:169, ArcMarginProduct_intertopk_subcenter:243,
AddMarginProduct:369, SphereProduct:411, Linear:471), re-designed for TPU:

  * the classifier weight is stored as (emb_dim, num_class*K) — classes on
    the LAST axis so it can be sharded over the 'model' mesh axis and the
    logits matmul (B, D) @ (D, C·K) runs directly on the MXU with the class
    axis on lanes.  This is the single largest matmul in training (C up to
    ~18k speakers × K subcenters); under pjit the per-class margin/one-hot
    math stays elementwise on the sharded axis and only the softmax
    normalizer reduces across shards.
  * `margin` is a CALL-TIME scalar argument instead of module state mutated
    by the scheduler (the reference's `update(margin)` at projections.py:205
    mutates attributes between steps; here the margin scheduler just feeds a
    traced scalar, so one compiled step serves the entire margin ramp).
  * all heads are pure: (params, embed, label, margin) -> logits.

Every head returns `(logits, aux_loss)`; aux_loss is None except for
SphereFace2 whose binary-classification loss replaces cross-entropy
(reference projections.py:160 returns (logits, loss)).
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import flax.linen as nn

from .norm import BatchNorm
import jax
import jax.numpy as jnp

__all__ = [
    "ArcMarginProduct",
    "ArcMarginIntertopkSubcenter",
    "AddMarginProduct",
    "SphereProduct",
    "SphereFace2",
    "LinearProduct",
    "get_projection",
]


def _l2norm(x, axis=-1, eps=1e-12):
    return x / jnp.maximum(jnp.linalg.norm(x, axis=axis, keepdims=True), eps)


def _cosine_logits(embed, weight):
    """cos(theta) between L2-normalized embeddings and class weights.

    weight: (D, C) with classes last (see module docstring).
    """
    e = _l2norm(embed.astype(jnp.float32))
    w = _l2norm(weight.astype(jnp.float32), axis=0)
    return jnp.dot(e, w, preferred_element_type=jnp.float32)


class ArcMarginProduct(nn.Module):
    """AAM-softmax: cos(theta + m) at the target class.

    Matches reference ArcMarginProduct (projections.py:169) including the
    `mmm = 1 + cos(pi - m)` continuity fix at :199 applied when
    cos(theta) <= cos(pi - m).
    """

    embed_dim: int
    num_class: int
    scale: float = 32.0
    easy_margin: bool = False

    @nn.compact
    def __call__(
        self, embed, label, margin=0.0
    ) -> Tuple[jax.Array, Optional[jax.Array]]:
        weight = self.param(
            "weight",
            nn.initializers.xavier_uniform(),
            (self.embed_dim, self.num_class),
        )
        cosine = _cosine_logits(embed, weight)

        m = jnp.asarray(margin, jnp.float32)
        cos_m, sin_m = jnp.cos(m), jnp.sin(m)
        sine = jnp.sqrt(jnp.clip(1.0 - cosine**2, 0.0, 1.0))
        phi = cosine * cos_m - sine * sin_m
        if self.easy_margin:
            phi = jnp.where(cosine > 0, phi, cosine)
        else:
            th = jnp.cos(math.pi - m)
            mmm = 1.0 + jnp.cos(math.pi - m)
            phi = jnp.where(cosine > th, phi, cosine - mmm)

        one_hot = jax.nn.one_hot(label, self.num_class, dtype=cosine.dtype)
        logits = jnp.where(one_hot > 0, phi, cosine) * self.scale
        return logits, None


class ArcMarginIntertopkSubcenter(nn.Module):
    """AAM-softmax with K sub-centers and inter-top-k penalty.

    Matches reference ArcMarginProduct_intertopk_subcenter
    (projections.py:243): per-class max over K sub-centers (:328-330),
    negative margin mp on the top-k hardest non-target classes (:347-356),
    mp ramped with the margin schedule (mp * margin/0.2, :317-322).
    do_lm (large-margin fine-tune) disables the penalty.
    """

    embed_dim: int
    num_class: int
    scale: float = 32.0
    easy_margin: bool = False
    K: int = 3
    mp: float = 0.06
    k_top: int = 5
    do_lm: bool = False

    @nn.compact
    def __call__(
        self, embed, label, margin=0.0
    ) -> Tuple[jax.Array, Optional[jax.Array]]:
        mp_base = 0.0 if self.do_lm else self.mp
        k_top = 0 if self.do_lm else self.k_top

        weight = self.param(
            "weight",
            nn.initializers.xavier_uniform(),
            (self.embed_dim, self.num_class * self.K),
        )
        cosine = _cosine_logits(embed, weight)  # (B, C*K)
        # Sub-center max: classes stay contiguous blocks of K on the lane
        # axis, so a (C, K) shard-local reshape+max is legal under sharding
        # by whole classes.
        cosine = jnp.max(
            cosine.reshape(-1, self.num_class, self.K), axis=-1
        )  # (B, C)

        m = jnp.asarray(margin, jnp.float32)
        cos_m, sin_m = jnp.cos(m), jnp.sin(m)
        mp = jnp.where(m > 0.001, mp_base * (m / 0.2), 0.0)
        cos_mp, sin_mp = jnp.cos(mp), jnp.sin(mp)

        sine = jnp.sqrt(jnp.clip(1.0 - cosine**2, 0.0, 1.0))
        phi = cosine * cos_m - sine * sin_m
        phi_mp = cosine * cos_mp + sine * sin_mp  # cos(theta - mp)
        if self.easy_margin:
            phi = jnp.where(cosine > 0, phi, cosine)
        else:
            th = jnp.cos(math.pi - m)
            mmm = 1.0 + jnp.cos(math.pi - m)
            phi = jnp.where(cosine > th, phi, cosine - mmm)

        one_hot = jax.nn.one_hot(label, self.num_class, dtype=cosine.dtype)
        if k_top > 0:
            _, top_idx = jax.lax.top_k(cosine - 2 * one_hot, k_top)
            top_one_hot = (
                jnp.zeros_like(cosine)
                .at[jnp.arange(cosine.shape[0])[:, None], top_idx]
                .set(1.0)
            )
            logits = (
                one_hot * phi
                + top_one_hot * phi_mp
                + (1.0 - one_hot - top_one_hot) * cosine
            )
        else:
            logits = jnp.where(one_hot > 0, phi, cosine)
        return logits * self.scale, None


class AddMarginProduct(nn.Module):
    """CosFace / additive-margin softmax: cos(theta) - m at the target
    (reference projections.py:369)."""

    embed_dim: int
    num_class: int
    scale: float = 32.0

    @nn.compact
    def __call__(
        self, embed, label, margin=0.0
    ) -> Tuple[jax.Array, Optional[jax.Array]]:
        weight = self.param(
            "weight",
            nn.initializers.xavier_uniform(),
            (self.embed_dim, self.num_class),
        )
        cosine = _cosine_logits(embed, weight)
        one_hot = jax.nn.one_hot(label, self.num_class, dtype=cosine.dtype)
        logits = (cosine - one_hot * jnp.asarray(margin, jnp.float32)) * self.scale
        return logits, None


class SphereProduct(nn.Module):
    """A-softmax / SphereFace: cos(m * theta) with lambda annealing
    (reference projections.py:411).  The anneal iteration is a call
    argument (`it`) instead of module state."""

    embed_dim: int
    num_class: int
    margin: int = 4  # integer angular multiplier
    base: float = 1000.0
    gamma: float = 0.12
    power: float = 1.0
    lambda_min: float = 5.0

    @nn.compact
    def __call__(
        self, embed, label, margin=0.0, it=1
    ) -> Tuple[jax.Array, Optional[jax.Array]]:
        assert self.margin < 6
        weight = self.param(
            "weight",
            nn.initializers.xavier_uniform(),
            (self.embed_dim, self.num_class),
        )
        it = jnp.asarray(it, jnp.float32)
        lamb = jnp.maximum(
            self.lambda_min, self.base * (1 + self.gamma * it) ** (-self.power)
        )
        cos_t = jnp.clip(_cosine_logits(embed, weight), -1.0, 1.0)
        # Chebyshev cos(m*theta)
        mlambda = [
            lambda x: x * 0 + 1,
            lambda x: x,
            lambda x: 2 * x**2 - 1,
            lambda x: 4 * x**3 - 3 * x,
            lambda x: 8 * x**4 - 8 * x**2 + 1,
            lambda x: 16 * x**5 - 20 * x**3 + 5 * x,
        ]
        cos_m_t = mlambda[self.margin](cos_t)
        theta = jnp.arccos(jnp.clip(cos_t, -1.0, 1.0))
        k = jnp.floor(self.margin * theta / math.pi)
        phi = ((-1.0) ** k) * cos_m_t - 2 * k
        feat_norm = jnp.linalg.norm(embed.astype(jnp.float32), axis=1, keepdims=True)
        one_hot = jax.nn.one_hot(label, self.num_class, dtype=cos_t.dtype)
        logits = (one_hot * (phi - cos_t) / (1 + lamb) + cos_t) * feat_norm
        return logits, None


class SphereFace2(nn.Module):
    """SphereFace2 binary-classification loss head
    (reference projections.py:66).  Returns (scaled cosine logits for
    accuracy, the SphereFace2 loss) — the caller must use the returned loss
    instead of cross-entropy."""

    embed_dim: int
    num_class: int
    scale: float = 32.0
    lanbuda: float = 0.7
    t: float = 3.0
    margin_type: str = "C"  # 'A' arcface-type or 'C' cosface-type

    @nn.compact
    def __call__(
        self, embed, label, margin=0.0
    ) -> Tuple[jax.Array, Optional[jax.Array]]:
        weight = self.param(
            "weight",
            nn.initializers.xavier_uniform(),
            (self.embed_dim, self.num_class),
        )
        bias = self.param("bias", nn.initializers.zeros, (1, 1))
        cos = _cosine_logits(embed, weight)
        m = jnp.asarray(margin, jnp.float32)

        def fun_g(z, t):
            return 2.0 * ((z + 1.0) / 2.0) ** t - 1.0

        b0 = bias[0, 0]
        if self.margin_type == "A":
            sin = jnp.sqrt(jnp.clip(1.0 - cos**2, 0.0, 1.0))
            th = jnp.cos(math.pi - m)
            mmm = 1.0 + jnp.cos(math.pi - m)
            cos_m_theta_p = (
                self.scale
                * fun_g(
                    jnp.where(
                        cos > th,
                        cos * jnp.cos(m) - sin * jnp.sin(m),
                        cos - mmm,
                    ),
                    self.t,
                )
                + b0
            )
            cos_m_theta_n = (
                self.scale * fun_g(cos * jnp.cos(m) + sin * jnp.sin(m), self.t) + b0
            )
        else:
            cos_m_theta_p = self.scale * (fun_g(cos, self.t) - m) + b0
            cos_m_theta_n = self.scale * (fun_g(cos, self.t) + m) + b0

        cos_p_theta = self.lanbuda * jax.nn.softplus(-cos_m_theta_p)
        cos_n_theta = (1.0 - self.lanbuda) * jax.nn.softplus(cos_m_theta_n)

        target_mask = jax.nn.one_hot(label, self.num_class, dtype=cos.dtype)
        logits = self.scale * (cos - m * target_mask)
        loss = jnp.mean(
            jnp.sum(
                target_mask * cos_p_theta + (1 - target_mask) * cos_n_theta,
                axis=1,
            )
        )
        return logits, loss


class LinearProduct(nn.Module):
    """Plain softmax head: BN -> ReLU -> Dense (reference projections.py:471)."""

    embed_dim: int
    num_class: int

    @nn.compact
    def __call__(
        self, embed, label=None, margin=0.0, train: bool = False
    ) -> Tuple[jax.Array, Optional[jax.Array]]:
        x = BatchNorm(use_running_average=not train, momentum=0.9, name="bn")(
            embed
        )
        x = nn.relu(x)
        logits = nn.Dense(self.num_class, name="linear")(x)
        return logits, None


def get_projection(conf: dict) -> nn.Module:
    """Dispatch mirroring reference get_projection (projections.py:25)."""
    ptype = conf.get("project_type", "linear")
    embed_dim = conf["embed_dim"]
    num_class = conf["num_class"]
    if ptype == "add_margin":
        return AddMarginProduct(embed_dim, num_class, scale=conf.get("scale", 32.0))
    if ptype == "arc_margin":
        return ArcMarginProduct(
            embed_dim,
            num_class,
            scale=conf.get("scale", 32.0),
            easy_margin=conf.get("easy_margin", False),
        )
    if ptype == "arc_margin_intertopk_subcenter":
        return ArcMarginIntertopkSubcenter(
            embed_dim,
            num_class,
            scale=conf.get("scale", 32.0),
            easy_margin=conf.get("easy_margin", False),
            K=conf.get("K", 3),
            mp=conf.get("mp", 0.06),
            k_top=conf.get("k_top", 5),
            do_lm=conf.get("do_lm", False),
        )
    if ptype == "sphere":
        return SphereProduct(embed_dim, num_class, margin=conf.get("margin", 4))
    if ptype == "sphereface2":
        return SphereFace2(
            embed_dim,
            num_class,
            scale=conf.get("scale", 32.0),
            lanbuda=conf.get("lanbuda", 0.7),
            t=conf.get("t", 3),
            margin_type=conf.get("margin_type", "C"),
        )
    return LinearProduct(embed_dim, num_class)
