from .registry import (
    MODEL_REGISTRY,
    embedding_from_outputs,
    get_speaker_model,
    register_model,
)
from .projections import get_projection

__all__ = [
    "MODEL_REGISTRY",
    "embedding_from_outputs",
    "get_speaker_model",
    "register_model",
    "get_projection",
]
