"""HuBERT / WavLM speech encoders in JAX (the SSL frontend backbone).

The reference consumes these through s3prl upstreams
(reference: wespeaker/frontend/s3prl.py:23-93 wraps WavLM/HuBERT/wav2vec2
and mixes layer outputs with a learned Featurizer).  Here the encoders are
implemented natively in flax with weight-for-weight compatibility with the
HuggingFace torch implementations (transformers modeling_hubert.py /
modeling_wavlm.py semantics), so public WavLM/HuBERT checkpoints import
directly (frontend/convert.py) and parity is testable offline against the
installed torch models.

Architecture (both models):
  wav (B, W) -> 7-layer strided conv feature extractor (GELU; group-norm
  first layer for 'group' norm mode, per-layer LayerNorm for 'layer') ->
  feature projection (LN + Dense) -> conv positional embedding (grouped
  conv k=128 g=16, same-pad trim, GELU) -> N transformer layers
  (post-LN for base models, pre-LN 'stable' for large) -> hidden states.

WavLM adds gated relative-position-bias attention: a bucketed relative
position embedding (first layer only, shared down the stack) scaled by a
per-head gate computed from the layer input.

TPU notes: everything is channels-last; the conv extractor runs as 7
NWC convs (XLA fuses GELU); attention uses jnp.einsum (MXU) with f32
softmax; `remat` can wrap layers for memory (see SpeakerNet usage).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Callable, List, Optional, Tuple

import flax.linen as nn

from ..models.norm import GroupNorm, LayerNorm
import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["SSLEncoderConfig", "SSLEncoder", "feat_extract_output_lengths"]


@dataclasses.dataclass(frozen=True)
class SSLEncoderConfig:
    model_type: str = "hubert"  # 'hubert' | 'wavlm'
    hidden_size: int = 768
    num_hidden_layers: int = 12
    num_attention_heads: int = 12
    intermediate_size: int = 3072
    conv_dim: Tuple[int, ...] = (512,) * 7
    conv_kernel: Tuple[int, ...] = (10, 3, 3, 3, 3, 2, 2)
    conv_stride: Tuple[int, ...] = (5, 2, 2, 2, 2, 2, 2)
    feat_extract_norm: str = "group"  # 'group' (base) | 'layer' (large)
    do_stable_layer_norm: bool = False
    num_conv_pos_embeddings: int = 128
    num_conv_pos_embedding_groups: int = 16
    layer_norm_eps: float = 1e-5
    # wavlm relative position bias
    num_buckets: int = 320
    max_distance: int = 800
    # 'einsum' materializes (B,h,T,T) scores/probs through HBM; 'flash'
    # runs the fused Pallas flash-attention kernel on TPU (online
    # softmax, no T^2 round trips) and falls back to einsum off-TPU.
    attn_impl: str = "einsum"
    # 'erf' is the HF-exact GELU; 'tanh' is the tanh approximation —
    # measured 24% faster end-to-end on WavLM-Large TPU extraction (the
    # erf prologue throttles every FFN matmul fusion to 84 TF/s) with
    # embedding cosine 0.99998 vs erf in bf16, i.e. below the bf16
    # rounding floor itself (docs/PERF_NOTES.md round 3).
    gelu_impl: str = "erf"
    # Sequence-parallel activation constraint (Megatron-SP under GSPMD):
    # a callable applied to the (B, T, H) residual stream at the layer
    # boundaries — parallel.mesh.sequence_parallel_constraint(mesh)
    # shards T over the tensor-parallel axis there, so XLA turns the two
    # per-layer TP all-reduces into reduce-scatter + all-gather pairs
    # and the LN/GELU/residual regions compute on 1/TP-th of the tokens.
    # Injected programmatically (bin/train `sequence_parallel`), never
    # from YAML; None = replicated activations (plain TP).
    act_constraint: Optional[Callable] = None

    @staticmethod
    def hubert_base():
        return SSLEncoderConfig()

    @staticmethod
    def wavlm_base():
        return SSLEncoderConfig(model_type="wavlm")

    @staticmethod
    def wavlm_large():
        return SSLEncoderConfig(
            model_type="wavlm",
            hidden_size=1024,
            num_hidden_layers=24,
            num_attention_heads=16,
            intermediate_size=4096,
            feat_extract_norm="layer",
            do_stable_layer_norm=True,
        )

    @staticmethod
    def wav2vec2_base():
        """wav2vec 2.0 base (reference s3prl.py upstream option).  For
        inference the HF Wav2Vec2Model forward is architecturally
        identical to HubertModel (same feature extractor, projection and
        encoder; wav2vec2's quantizer exists only in the pretraining
        head), so public wav2vec2 checkpoints import through the hubert
        path — parity-tested vs transformers Wav2Vec2Model."""
        return SSLEncoderConfig.hubert_base()

    @staticmethod
    def wav2vec2_large_lv60():
        """facebook/wav2vec2-large-lv60 / -robust / xlsr family:
        layer-norm feature extractor + pre-LN encoder."""
        return SSLEncoderConfig.hubert_large()

    @staticmethod
    def wav2vec2_large_960h():
        """facebook/wav2vec2-large (LibriSpeech 960h): group-norm
        feature extractor + post-LN encoder, unlike the lv60 family."""
        return SSLEncoderConfig(
            hidden_size=1024,
            num_hidden_layers=24,
            num_attention_heads=16,
            intermediate_size=4096,
        )

    # the s3prl upstream name 'wav2vec2_large' means the lv60 variant
    # (s3prl maps it to the ll60k checkpoint)
    wav2vec2_large = wav2vec2_large_lv60

    @staticmethod
    def hubert_large():
        return SSLEncoderConfig(
            hidden_size=1024,
            num_hidden_layers=24,
            num_attention_heads=16,
            intermediate_size=4096,
            feat_extract_norm="layer",
            do_stable_layer_norm=True,
        )

    @staticmethod
    def tiny(model_type="hubert", do_stable_layer_norm=False):
        """For tests: 2 layers, 32-dim."""
        return SSLEncoderConfig(
            model_type=model_type,
            hidden_size=32,
            num_hidden_layers=2,
            num_attention_heads=4,
            intermediate_size=64,
            conv_dim=(16, 16, 16),
            conv_kernel=(10, 3, 3),
            conv_stride=(5, 2, 2),
            do_stable_layer_norm=do_stable_layer_norm,
            num_conv_pos_embeddings=16,
            num_conv_pos_embedding_groups=4,
            num_buckets=32,
            max_distance=64,
        )


def _gelu(cfg: SSLEncoderConfig, x):
    return nn.gelu(x, approximate=(cfg.gelu_impl == "tanh"))


def feat_extract_output_lengths(cfg: SSLEncoderConfig, lengths):
    """Conv feature-extractor output lengths (floor((L-k)/s)+1 chain)."""
    for k, s in zip(cfg.conv_kernel, cfg.conv_stride):
        lengths = (lengths - k) // s + 1
    return lengths


class ConvFeatureEncoder(nn.Module):
    cfg: SSLEncoderConfig

    @nn.compact
    def __call__(self, wav: jax.Array) -> jax.Array:
        """(B, W) -> (B, T, conv_dim[-1])."""
        cfg = self.cfg
        h = wav[:, :, None]  # NWC
        for i, (dim, k, s) in enumerate(
            zip(cfg.conv_dim, cfg.conv_kernel, cfg.conv_stride)
        ):
            h = nn.Conv(
                dim, (k,), strides=(s,), padding="VALID", use_bias=False,
                name=f"conv_{i}",
            )(h)
            if cfg.feat_extract_norm == "group" and i == 0:
                h = GroupNorm(
                    num_groups=dim, epsilon=cfg.layer_norm_eps,
                    name=f"norm_{i}",
                )(h)
            elif cfg.feat_extract_norm == "layer":
                h = LayerNorm(epsilon=cfg.layer_norm_eps, name=f"norm_{i}")(h)
            h = _gelu(cfg, h)
        return h


class _GroupedConv1d(nn.Module):
    """nn.Conv-compatible grouped 1-D conv (same param names/shapes and
    init) through ops.conv_safe.grouped_conv1d: XLA's SPMD partitioner
    mis-scales grouped-conv WEIGHT grads by the mesh's replication
    degree (see conv_safe docstring), which would corrupt pos-conv
    training under the TP/pipeline mesh layouts."""

    features: int
    kernel_size: int
    padding: tuple
    feature_group_count: int

    @nn.compact
    def __call__(self, x):
        from ..ops.conv_safe import grouped_conv1d

        cg = x.shape[-1] // self.feature_group_count
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (self.kernel_size, cg, self.features),
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        y = grouped_conv1d(
            x,
            kernel.astype(x.dtype),
            1,
            (tuple(self.padding),),
            self.feature_group_count,
        )
        return y + bias.astype(y.dtype)


class PositionalConvEmbedding(nn.Module):
    cfg: SSLEncoderConfig

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        cfg = self.cfg
        k = cfg.num_conv_pos_embeddings
        h = _GroupedConv1d(
            cfg.hidden_size,
            k,
            (k // 2, k // 2),
            cfg.num_conv_pos_embedding_groups,
            name="conv",
        )(x)
        if k % 2 == 0:  # SamePadLayer trims one trailing frame
            h = h[:, :-1]
        return _gelu(cfg, h)


def _relative_positions_bucket(
    relative_positions: np.ndarray, num_buckets: int, max_distance: int
) -> np.ndarray:
    """WavLM (T5-style bidirectional) bucketing — static numpy, folded into
    the compiled program as a constant gather table."""
    num_buckets = num_buckets // 2
    relative_buckets = (relative_positions > 0).astype(np.int64) * num_buckets
    rel = np.abs(relative_positions)
    max_exact = num_buckets // 2
    is_small = rel < max_exact
    rel_large = (
        np.log(np.maximum(rel, 1).astype(np.float64) / max_exact)
        / math.log(max_distance / max_exact)
        * (num_buckets - max_exact)
    )
    rel_large = np.minimum(
        (max_exact + rel_large).astype(np.int64), num_buckets - 1
    )
    relative_buckets += np.where(is_small, rel, rel_large)
    return relative_buckets


def _use_flash(cfg: SSLEncoderConfig) -> bool:
    return cfg.attn_impl == "flash" and jax.default_backend() not in (
        "cpu", "gpu",
    )


def _flash_mha(q, k, v, ab, scale: float):
    """softmax(q@k^T * scale + ab) @ v via the Pallas TPU flash kernel.

    q/k/v: (B, T, h, hd); ab: (B, h, T, T) additive bias or None.
    T is padded to a multiple of 128 (the kernel's default block size,
    forward and backward — the kernel has a custom VJP, so training
    with attn_impl='flash' differentiates through it); padded KEY
    columns are masked through ab so real-query rows are exact, and
    padded query rows are sliced off.  The kernel applies sm_scale
    AFTER adding ab, so the scale is folded into q up front.
    """
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        flash_attention,
    )

    b, t, h, hd = q.shape
    tp = -(-t // 128) * 128
    pad = tp - t

    def to_bhtd(x):
        x = x.transpose(0, 2, 1, 3)  # (B, h, T, hd)
        if pad:
            x = jnp.pad(x, ((0, 0), (0, 0), (0, pad), (0, 0)))
        return x

    qh = to_bhtd(q * jnp.asarray(scale, q.dtype))
    kh, vh = to_bhtd(k), to_bhtd(v)
    segment_ids = None
    if ab is not None:
        ab = jnp.broadcast_to(ab, (b, h, t, t))
        if pad:  # mask padded keys; padded query rows are dropped below
            ab = jnp.pad(
                ab, ((0, 0), (0, 0), (0, pad), (0, pad)),
                constant_values=-1e9,
            )
        ab = ab.astype(qh.dtype)
    elif pad:
        # no bias tensor (HuBERT / whisper): mask the padding with
        # segment ids instead of materializing a (B,h,T,T) zero bias —
        # real frames are segment 0, pad frames segment 1 (pad rows
        # attend only each other and are sliced off below)
        from jax.experimental.pallas.ops.tpu.flash_attention import (
            SegmentIds,
        )

        seg = jnp.broadcast_to(
            (jnp.arange(tp) >= t).astype(jnp.int32)[None, :], (b, tp)
        )
        segment_ids = SegmentIds(q=seg, kv=seg)
    out = flash_attention(
        qh, kh, vh, ab=ab, segment_ids=segment_ids, sm_scale=1.0
    )
    return out[:, :, :t].transpose(0, 2, 1, 3)  # (B, T, h, hd)


class WavLMAttention(nn.Module):
    """Self-attention with gated relative position bias (WavLM)."""

    cfg: SSLEncoderConfig
    has_relative_position_bias: bool

    @nn.compact
    def __call__(self, x, attn_bias, position_bias):
        cfg = self.cfg
        b, t, d = x.shape
        h = cfg.num_attention_heads
        hd = d // h

        if position_bias is None:
            assert self.has_relative_position_bias
            rel_embed = self.param(
                "rel_attn_embed",
                nn.initializers.normal(0.02),
                (cfg.num_buckets, h),
            )
            pos = np.arange(t)
            buckets = _relative_positions_bucket(
                pos[None, :] - pos[:, None], cfg.num_buckets, cfg.max_distance
            )  # (T, T)
            position_bias = jnp.transpose(
                rel_embed[jnp.asarray(buckets)], (2, 0, 1)
            )  # (h, T, T)

        # gate from the layer input (HF WavLMAttention.forward steps 1-4)
        gru_const = self.param(
            "gru_rel_pos_const", nn.initializers.ones, (1, h, 1, 1)
        )
        gated_hidden = x.reshape(b, t, h, hd).transpose(0, 2, 1, 3)
        proj = nn.Dense(8, name="gru_rel_pos_linear")(gated_hidden)
        proj = proj.reshape(b, h, t, 2, 4).sum(-1)
        gate = jax.nn.sigmoid(proj)
        gate_a, gate_b = gate[..., 0:1], gate[..., 1:2]
        gate_output = gate_a * (gate_b * gru_const - 1.0) + 2.0  # (B,h,T,1)
        gated_position_bias = gate_output * position_bias[None]  # (B,h,T,T)

        q = nn.Dense(d, name="q_proj")(x).reshape(b, t, h, hd)
        k = nn.Dense(d, name="k_proj")(x).reshape(b, t, h, hd)
        v = nn.Dense(d, name="v_proj")(x).reshape(b, t, h, hd)
        if _use_flash(cfg):
            ab = gated_position_bias
            if attn_bias is not None:
                ab = ab + attn_bias
            out = _flash_mha(q, k, v, ab, 1.0 / math.sqrt(hd))
            out = out.reshape(b, t, d)
        else:
            # The MXU accumulates in f32 regardless of output dtype, so the
            # (B,h,T,T) scores can be STORED in the compute dtype (halving
            # the dominant T^2 HBM traffic vs preferred_element_type=f32 —
            # measured 29 ms of a 113 ms WavLM-Large dispatch was f32-T^2
            # fusions); the softmax upcasts to f32 in-fusion (registers,
            # not HBM) and probs return to the compute dtype for the PV
            # matmul so bf16 survives the residual stream end-to-end.
            scores = jnp.einsum("bqhd,bkhd->bhqk", q, k) / math.sqrt(hd)
            scores = scores + gated_position_bias
            if attn_bias is not None:
                scores = scores + attn_bias.astype(scores.dtype)
            probs = jax.nn.softmax(
                scores.astype(jnp.float32), axis=-1
            ).astype(v.dtype)
            out = jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(b, t, d)
        out = nn.Dense(d, name="out_proj")(out)
        return out, position_bias


class PlainAttention(nn.Module):
    """Standard MHA (HuBERT/wav2vec2)."""

    cfg: SSLEncoderConfig

    @nn.compact
    def __call__(self, x, attn_bias, position_bias=None):
        cfg = self.cfg
        b, t, d = x.shape
        h = cfg.num_attention_heads
        hd = d // h
        q = nn.Dense(d, name="q_proj")(x).reshape(b, t, h, hd)
        k = nn.Dense(d, name="k_proj")(x).reshape(b, t, h, hd)
        v = nn.Dense(d, name="v_proj")(x).reshape(b, t, h, hd)
        if _use_flash(cfg):
            out = _flash_mha(q, k, v, attn_bias, 1.0 / math.sqrt(hd))
            return nn.Dense(d, name="out_proj")(out.reshape(b, t, d)), None
        # scores stored in compute dtype, f32 softmax in-fusion, probs
        # back to compute dtype (see WavLMAttention note on T^2 traffic)
        scores = jnp.einsum("bqhd,bkhd->bhqk", q, k) / math.sqrt(hd)
        if attn_bias is not None:
            scores = scores + attn_bias.astype(scores.dtype)
        probs = jax.nn.softmax(
            scores.astype(jnp.float32), axis=-1
        ).astype(v.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(b, t, d)
        return nn.Dense(d, name="out_proj")(out), None


class FeedForward(nn.Module):
    cfg: SSLEncoderConfig

    @nn.compact
    def __call__(self, x):
        h = nn.Dense(self.cfg.intermediate_size, name="intermediate_dense")(x)
        h = _gelu(self.cfg, h)
        return nn.Dense(self.cfg.hidden_size, name="output_dense")(h)


class EncoderLayer(nn.Module):
    cfg: SSLEncoderConfig
    layer_idx: int

    @nn.compact
    def __call__(self, x, attn_bias, position_bias):
        cfg = self.cfg
        if cfg.model_type == "wavlm":
            attention = WavLMAttention(
                cfg,
                has_relative_position_bias=(self.layer_idx == 0),
                name="attention",
            )
        else:
            attention = PlainAttention(cfg, name="attention")

        # Megatron-SP boundaries: the residual stream entering each
        # LN+sublayer region is (optionally) token-sharded over the TP
        # axis so the elementwise/norm work splits and the TP psums
        # lower to reduce-scatter + all-gather (cfg.act_constraint).
        sp = cfg.act_constraint if cfg.act_constraint is not None else (
            lambda y: y
        )
        if cfg.do_stable_layer_norm:  # pre-LN (large models)
            a, position_bias = attention(
                LayerNorm(epsilon=cfg.layer_norm_eps, name="layer_norm")(x),
                attn_bias,
                position_bias,
            )
            x = sp(x + a)
            x = x + FeedForward(cfg, name="feed_forward")(
                LayerNorm(epsilon=cfg.layer_norm_eps, name="final_layer_norm")(x)
            )
            x = sp(x)
        else:  # post-LN (base models)
            a, position_bias = attention(x, attn_bias, position_bias)
            x = LayerNorm(epsilon=cfg.layer_norm_eps, name="layer_norm")(
                sp(x + a)
            )
            x = x + FeedForward(cfg, name="feed_forward")(x)
            x = sp(
                LayerNorm(epsilon=cfg.layer_norm_eps, name="final_layer_norm")(x)
            )
        return x, position_bias


class SSLEncoder(nn.Module):
    """Full encoder: wav -> list of hidden states (1 + num_layers)."""

    cfg: SSLEncoderConfig

    @nn.compact
    def __call__(
        self,
        wav: jax.Array,
        lengths: Optional[jax.Array] = None,
        train: bool = False,
    ) -> Tuple[List[jax.Array], Optional[jax.Array]]:
        cfg = self.cfg
        feats = ConvFeatureEncoder(cfg, name="feature_extractor")(wav)

        h = LayerNorm(epsilon=cfg.layer_norm_eps, name="feat_proj_layer_norm")(
            feats
        )
        h = nn.Dense(cfg.hidden_size, name="feat_projection")(h)

        feat_lengths = None
        attn_bias = None
        if lengths is not None:
            feat_lengths = feat_extract_output_lengths(cfg, lengths)
            t = h.shape[1]
            mask = jnp.arange(t)[None, :] < feat_lengths[:, None]
            h = h * mask[:, :, None]
            attn_bias = jnp.where(mask, 0.0, -1e9)[:, None, None, :]

        pos = PositionalConvEmbedding(cfg, name="pos_conv_embed")(h)
        h = h + pos
        if not cfg.do_stable_layer_norm:
            h = LayerNorm(epsilon=cfg.layer_norm_eps, name="encoder_layer_norm")(h)

        hidden_states = [h]
        position_bias = None
        for i in range(cfg.num_hidden_layers):
            h, position_bias = EncoderLayer(cfg, i, name=f"layer_{i}")(
                h, attn_bias, position_bias
            )
            hidden_states.append(h)
        if cfg.do_stable_layer_norm:
            # final LN applies to the LAST state (large models); keep raw
            # per-layer states for the featurizer like s3prl.
            hidden_states[-1] = LayerNorm(
                epsilon=cfg.layer_norm_eps, name="encoder_layer_norm"
            )(hidden_states[-1])
        return hidden_states, feat_lengths
