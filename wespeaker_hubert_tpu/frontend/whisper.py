"""Whisper audio encoder frontend (layer-subset concat).

Reference: wespeaker/frontend/whisper_encoder.py — a re-implemented
Whisper AudioEncoder (:153-220: two convs, sinusoidal positions trimmed to
the input length, pre-LN residual attention blocks) that CONCATENATES the
outputs of layers [layer_st..layer_ed] and layer-norms the concat (:178,
:213-219); log-mel computed in-forward (:310-315 — here ops/whisper_mel).

Weight import from an OpenAI whisper checkpoint state_dict is supported
via convert_whisper_state_dict (dims follow whisper large-v2 by default:
1280 width, 24 layers, 20 heads).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Dict, Optional, Tuple

import flax.linen as nn

from ..models.norm import GroupNorm, LayerNorm
import jax
import jax.numpy as jnp
import numpy as np

from ..ops.whisper_mel import whisper_log_mel

__all__ = ["WhisperEncoderConfig", "WhisperEncoder", "convert_whisper_state_dict"]


@dataclasses.dataclass(frozen=True)
class WhisperEncoderConfig:
    n_mels: int = 80
    n_state: int = 1280
    n_head: int = 20
    n_layer: int = 24
    n_ctx: int = 1500
    layer_st: int = 16
    layer_ed: int = 23
    # 'flash' = fused Pallas attention on TPU (no (B,h,T,T) HBM round
    # trips); exact einsum fallback elsewhere (see ssl_encoder._flash_mha)
    attn_impl: str = "einsum"
    # 'erf' = OpenAI-exact GELU; 'tanh' = fast approximation (same
    # adjudication as SSLEncoderConfig.gelu_impl: the erf prologue
    # throttles the FFN matmul fusions on TPU)
    gelu_impl: str = "erf"
    # Megatron-SP activation hook, same contract as SSLEncoderConfig.
    # act_constraint: token-shards the (B, T, n_state) residual stream
    # over the TP axis at the block boundaries (parallel.mesh.
    # sequence_parallel_constraint); injected programmatically, not YAML.
    act_constraint: Optional[Callable] = None

    @staticmethod
    def large_v2():
        return WhisperEncoderConfig()

    @staticmethod
    def tiny_test():
        return WhisperEncoderConfig(
            n_state=32, n_head=4, n_layer=4, n_ctx=100, layer_st=1, layer_ed=3
        )

    @property
    def output_size(self) -> int:
        return self.n_state * (self.layer_ed - self.layer_st + 1)


def _sinusoids(length: int, channels: int, max_timescale: float = 10000.0):
    """Whisper positional embedding (whisper_encoder.py:53-61)."""
    assert channels % 2 == 0
    log_inc = np.log(max_timescale) / (channels // 2 - 1)
    inv = np.exp(-log_inc * np.arange(channels // 2))
    scaled = np.arange(length)[:, None] * inv[None, :]
    return np.concatenate([np.sin(scaled), np.cos(scaled)], axis=1).astype(
        np.float32
    )


class _MHA(nn.Module):
    n_state: int
    n_head: int
    attn_impl: str = "einsum"

    @nn.compact
    def __call__(self, x):
        b, t, d = x.shape
        h = self.n_head
        hd = d // h
        q = nn.Dense(d, name="query")(x)
        k = nn.Dense(d, use_bias=False, name="key")(x)
        v = nn.Dense(d, name="value")(x)
        # whisper scales q and k each by hd**-0.25
        scale = hd**-0.25
        q = (q * scale).reshape(b, t, h, hd)
        k = (k * scale).reshape(b, t, h, hd)
        v = v.reshape(b, t, h, hd)
        from .ssl_encoder import _flash_mha, _use_flash

        if _use_flash(self):  # duck-typed: reads .attn_impl
            out = _flash_mha(q, k, v, None, 1.0).reshape(b, t, d)
            return nn.Dense(d, name="out")(out)
        # scores stored in compute dtype (MXU accumulates f32 anyway),
        # f32 softmax in-fusion, probs back to the residual dtype so bf16
        # survives end-to-end (see ssl_encoder.WavLMAttention note)
        w = jnp.einsum("bqhd,bkhd->bhqk", q, k)
        w = jax.nn.softmax(w.astype(jnp.float32), axis=-1).astype(v.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", w, v).reshape(b, t, d)
        return nn.Dense(d, name="out")(out)


class _Block(nn.Module):
    n_state: int
    n_head: int
    attn_impl: str = "einsum"
    gelu_impl: str = "erf"
    act_constraint: Optional[Callable] = None

    @nn.compact
    def __call__(self, x):
        # Megatron-SP boundaries (see ssl_encoder.EncoderLayer): the
        # residual stream entering each pre-LN region is token-sharded
        # over the TP axis when the constraint is set
        sp = self.act_constraint if self.act_constraint is not None else (
            lambda y: y
        )
        x = sp(x + _MHA(self.n_state, self.n_head, self.attn_impl, name="attn")(
            LayerNorm(name="attn_ln")(x)
        ))
        h = LayerNorm(name="mlp_ln")(x)
        h = nn.Dense(self.n_state * 4, name="mlp_0")(h)
        h = nn.gelu(h, approximate=(self.gelu_impl == "tanh"))
        h = nn.Dense(self.n_state, name="mlp_2")(h)
        return sp(x + h)


class WhisperEncoder(nn.Module):
    cfg: WhisperEncoderConfig
    # frozen=True: the train driver zeroes updates for the whole frontend
    # subtree (reference Whisper-PMFA stage0 conf: frozen: True, unfrozen
    # in stage1 — examples/voxceleb/v1/Whisper-PMFA/conf)
    frozen: bool = False

    @nn.compact
    def __call__(
        self,
        wav: jax.Array,
        lengths: Optional[jax.Array] = None,
        train: bool = False,
    ) -> Tuple[jax.Array, Optional[jax.Array]]:
        """(B, W) wav -> (B, T', n_state * n_concat) features."""
        cfg = self.cfg
        # log-mel runs f32 internally; return to the caller's compute
        # dtype so a bf16 forward stays bf16 through the encoder stack
        mel = whisper_log_mel(wav, n_mels=cfg.n_mels).astype(wav.dtype)
        approx = cfg.gelu_impl == "tanh"
        h = nn.Conv(cfg.n_state, (3,), padding=[(1, 1)], name="conv1")(mel)
        h = nn.gelu(h, approximate=approx)
        h = nn.Conv(
            cfg.n_state, (3,), strides=(2,), padding=[(1, 1)], name="conv2"
        )(h)
        h = nn.gelu(h, approximate=approx)

        t = min(h.shape[1], cfg.n_ctx)
        h = h[:, :t]
        pos = jnp.asarray(_sinusoids(cfg.n_ctx, cfg.n_state))[:t]
        h = h + pos[None].astype(h.dtype)  # f32 pos table must not promote h

        outs = []
        for i in range(cfg.n_layer):
            h = _Block(
                cfg.n_state, cfg.n_head, cfg.attn_impl, cfg.gelu_impl,
                cfg.act_constraint, name=f"block_{i}",
            )(h)
            if cfg.layer_st <= i <= cfg.layer_ed:
                outs.append(h)
        xs = jnp.concatenate(outs, axis=-1)
        xs = LayerNorm(name="ln_post2")(xs)

        feat_lengths = None
        if lengths is not None:
            # mel frames = W // 160, conv2 stride 2 (same pad): ceil(T/2)
            feat_lengths = jnp.minimum((lengths // 160 + 1) // 2, t)
        return xs, feat_lengths

    @property
    def output_size(self) -> int:
        return self.cfg.output_size


def _np(x):
    try:
        return x.detach().cpu().numpy()
    except AttributeError:
        return np.asarray(x)


def convert_whisper_state_dict(sd: Dict, cfg: WhisperEncoderConfig) -> Dict:
    """OpenAI whisper `encoder.*` state_dict -> WhisperEncoder params.
    (ln_post2 is this fork's extra concat layer-norm — initialized fresh
    when absent.)"""

    def dense(prefix, bias=True):
        out = {"kernel": _np(sd[prefix + ".weight"]).T}
        if bias:
            out["bias"] = _np(sd[prefix + ".bias"])
        return out

    def ln(prefix):
        return {
            "scale": _np(sd[prefix + ".weight"]),
            "bias": _np(sd[prefix + ".bias"]),
        }

    params: Dict = {
        "conv1": {
            "kernel": _np(sd["conv1.weight"]).transpose(2, 1, 0),
            "bias": _np(sd["conv1.bias"]),
        },
        "conv2": {
            "kernel": _np(sd["conv2.weight"]).transpose(2, 1, 0),
            "bias": _np(sd["conv2.bias"]),
        },
    }
    for i in range(cfg.n_layer):
        p = f"blocks.{i}"
        params[f"block_{i}"] = {
            "attn": {
                "query": dense(p + ".attn.query"),
                "key": dense(p + ".attn.key", bias=False),
                "value": dense(p + ".attn.value"),
                "out": dense(p + ".attn.out"),
            },
            "attn_ln": ln(p + ".attn_ln"),
            "mlp_ln": ln(p + ".mlp_ln"),
            "mlp_0": dense(p + ".mlp.0"),
            "mlp_2": dense(p + ".mlp.2"),
        }
    if "ln_post2.weight" in sd:
        params["ln_post2"] = ln("ln_post2")
    else:
        n = cfg.output_size
        params["ln_post2"] = {
            "scale": np.ones(n, np.float32),
            "bias": np.zeros(n, np.float32),
        }
    return params
