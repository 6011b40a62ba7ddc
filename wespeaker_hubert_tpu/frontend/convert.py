"""Torch (HuggingFace) -> flax parameter conversion for the SSL encoders.

Takes a HubertModel/WavLMModel state_dict (torch tensors or numpy arrays)
and produces the parameter pytree of frontend.ssl_encoder.SSLEncoder.
Dense kernels transpose; conv kernels go (out, in/g, k) -> (k, in/g, out);
the positional conv's weight-norm parametrization (original0=g,
original1=v with dim=2) is composed into a plain kernel.
"""

from __future__ import annotations

from typing import Dict

import numpy as np

from .ssl_encoder import SSLEncoderConfig

__all__ = ["convert_hf_state_dict"]


def _np(x):
    try:
        return x.detach().cpu().numpy()
    except AttributeError:
        return np.asarray(x)


def _dense(sd, prefix):
    return {
        "kernel": _np(sd[prefix + ".weight"]).T,
        "bias": _np(sd[prefix + ".bias"]),
    }


def _norm(sd, prefix):
    return {
        "scale": _np(sd[prefix + ".weight"]),
        "bias": _np(sd[prefix + ".bias"]),
    }


def _conv_kernel(w):
    return _np(w).transpose(2, 1, 0)  # (out, in/g, k) -> (k, in/g, out)


def _pos_conv_weight(sd):
    base = "encoder.pos_conv_embed.conv"
    if base + ".weight" in sd:
        w = _np(sd[base + ".weight"])
    else:
        if base + ".parametrizations.weight.original0" in sd:
            g = _np(sd[base + ".parametrizations.weight.original0"])
            v = _np(sd[base + ".parametrizations.weight.original1"])
        else:
            g = _np(sd[base + ".weight_g"])
            v = _np(sd[base + ".weight_v"])
        norm = np.sqrt(np.sum(v**2, axis=(0, 1), keepdims=True))
        w = g * v / np.maximum(norm, 1e-12)
    return _conv_kernel(w)


def convert_hf_state_dict(
    sd: Dict[str, "np.ndarray"], cfg: SSLEncoderConfig
) -> Dict:
    """HF HubertModel/WavLMModel state_dict -> SSLEncoder params dict."""
    params: Dict = {}

    fe: Dict = {}
    for i in range(len(cfg.conv_dim)):
        fe[f"conv_{i}"] = {
            "kernel": _conv_kernel(
                sd[f"feature_extractor.conv_layers.{i}.conv.weight"]
            )
        }
        ln_key = f"feature_extractor.conv_layers.{i}.layer_norm.weight"
        if ln_key in sd:
            fe[f"norm_{i}"] = _norm(
                sd, f"feature_extractor.conv_layers.{i}.layer_norm"
            )
    params["feature_extractor"] = fe

    params["feat_proj_layer_norm"] = _norm(sd, "feature_projection.layer_norm")
    params["feat_projection"] = _dense(sd, "feature_projection.projection")

    params["pos_conv_embed"] = {
        "conv": {
            "kernel": _pos_conv_weight(sd),
            "bias": _np(sd["encoder.pos_conv_embed.conv.bias"]),
        }
    }
    params["encoder_layer_norm"] = _norm(sd, "encoder.layer_norm")

    for i in range(cfg.num_hidden_layers):
        p = f"encoder.layers.{i}"
        attn = {
            "q_proj": _dense(sd, p + ".attention.q_proj"),
            "k_proj": _dense(sd, p + ".attention.k_proj"),
            "v_proj": _dense(sd, p + ".attention.v_proj"),
            "out_proj": _dense(sd, p + ".attention.out_proj"),
        }
        if cfg.model_type == "wavlm":
            attn["gru_rel_pos_const"] = _np(
                sd[p + ".attention.gru_rel_pos_const"]
            )
            attn["gru_rel_pos_linear"] = _dense(
                sd, p + ".attention.gru_rel_pos_linear"
            )
            if i == 0:
                attn["rel_attn_embed"] = _np(
                    sd[p + ".attention.rel_attn_embed.weight"]
                )
        params[f"layer_{i}"] = {
            "attention": attn,
            "layer_norm": _norm(sd, p + ".layer_norm"),
            "final_layer_norm": _norm(sd, p + ".final_layer_norm"),
            "feed_forward": {
                "intermediate_dense": _dense(
                    sd, p + ".feed_forward.intermediate_dense"
                ),
                "output_dense": _dense(sd, p + ".feed_forward.output_dense"),
            },
        }
    return params
