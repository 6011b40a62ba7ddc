"""Model registry: name -> factory returning an nn.Module backbone.

Mirrors the reference's prefix dispatch (reference:
wespeaker/models/speaker_model.py:30-57) but as an explicit table.  All
factories share the signature (feat_dim, embed_dim, pooling_func, **kwargs)
and the returned module is called as module.apply(vars, x, mask=..., train=...)
with x = (B, T, feat_dim) features.

`embedding_from_outputs` captures the reference convention that backbones
may return a single embedding or a tuple whose LAST element is the
embedding (reference utils/executor.py:61, bin/extract.py:115 take
outputs[-1]).
"""

from __future__ import annotations

from typing import Callable, Dict

from . import (
    campplus,
    eres2net,
    redimnet,
    whisper_pmfa,
    ecapa_tdnn,
    gemini_dfresnet,
    repvgg,
    res2net,
    resnet,
    samresnet,
    tdnn,
    xi_vector,
)

__all__ = ["get_speaker_model", "embedding_from_outputs", "MODEL_REGISTRY"]

MODEL_REGISTRY: Dict[str, Callable] = {
    # x-vector
    "XVEC": tdnn.XVEC_factory,
    # ECAPA family
    "ECAPA_TDNN_c512": ecapa_tdnn.ECAPA_TDNN_c512,
    "ECAPA_TDNN_GLOB_c512": ecapa_tdnn.ECAPA_TDNN_GLOB_c512,
    "ECAPA_TDNN_c1024": ecapa_tdnn.ECAPA_TDNN_c1024,
    "ECAPA_TDNN_GLOB_c1024": ecapa_tdnn.ECAPA_TDNN_GLOB_c1024,
    # ResNet r-vector family
    "ResNet18": resnet.ResNet18,
    "ResNet34": resnet.ResNet34,
    "ResNet50": resnet.ResNet50,
    "ResNet101": resnet.ResNet101,
    "ResNet152": resnet.ResNet152,
    "ResNet221": resnet.ResNet221,
    "ResNet293": resnet.ResNet293,
    # Res2Net
    "Res2Net34_Base": res2net.Res2Net34_Base,
    "Res2Net34_Large": res2net.Res2Net34_Large,
    # ERes2Net
    "ERes2Net34_Base": eres2net.ERes2Net34_Base,
    "ERes2Net34_Large": eres2net.ERes2Net34_Large,
    "ERes2Net34_aug": eres2net.ERes2Net34_aug,
    # CAM++
    "CAMPPlus": campplus.CAMPPlus,
    # Gemini DF-ResNet
    "Gemini_DF_ResNet60": gemini_dfresnet.Gemini_DF_ResNet60,
    "Gemini_DF_ResNet114": gemini_dfresnet.Gemini_DF_ResNet114,
    "Gemini_DF_ResNet183": gemini_dfresnet.Gemini_DF_ResNet183,
    "Gemini_DF_ResNet237": gemini_dfresnet.Gemini_DF_ResNet237,
    # SimAM ResNet (VoxBlink2)
    "SimAM_ResNet34_ASP": samresnet.SimAM_ResNet34_ASP,
    "SimAM_ResNet100_ASP": samresnet.SimAM_ResNet100_ASP,
    # Xi-vector
    "XI_VEC_ECAPA_TDNN_c512": xi_vector.XI_VEC_ECAPA_TDNN_c512,
    "XI_VEC_ECAPA_TDNN_c1024": xi_vector.XI_VEC_ECAPA_TDNN_c1024,
    "XI_VEC_XVEC": xi_vector.XI_VEC_XVEC,
}

MODEL_REGISTRY["whisper_PMFA"] = whisper_pmfa.whisper_PMFA
MODEL_REGISTRY["whisper_PMFA_large_v2"] = whisper_pmfa.whisper_PMFA_large_v2
for _i in range(7):
    MODEL_REGISTRY[f"ReDimNetB{_i}"] = getattr(redimnet, f"ReDimNetB{_i}")

# 19 RepVGG variants (REPVGG_TINY_A0 ... REPVGG_D2SE)
MODEL_REGISTRY.update(repvgg.REPVGG_FACTORIES)


def register_model(name: str, factory: Callable) -> None:
    MODEL_REGISTRY[name] = factory


def get_speaker_model(model_name: str) -> Callable:
    try:
        return MODEL_REGISTRY[model_name]
    except KeyError:
        pass
    # Case-insensitive fallback: reference configs are not consistent about
    # casing (e.g. conf/whisper_PMFA_stage0.yaml says 'Whisper_PMFA_large_v2'
    # while wespeaker/models/whisper_PMFA.py exports 'whisper_PMFA_large_v2').
    lowered = {k.lower(): v for k, v in MODEL_REGISTRY.items()}
    if model_name.lower() in lowered:
        return lowered[model_name.lower()]
    raise ValueError(
        f"unknown model {model_name!r}; available: "
        + ", ".join(sorted(MODEL_REGISTRY))
    ) from None


def embedding_from_outputs(outputs):
    """Backbones return either `embed` or `(..., embed)`; take the last."""
    if isinstance(outputs, (tuple, list)):
        return outputs[-1]
    return outputs
