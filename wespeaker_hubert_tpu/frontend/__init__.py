"""Frontend registry (reference: wespeaker/frontend/__init__.py:19-22 —
{'fbank': None, 's3prl': S3prlFrontend, 'whisper_encoder': whisper_encoder}).
'fbank' maps to None because the fbank path lives in ops/pipeline.py and
runs in-graph in the train/eval step."""

from .convert import convert_hf_state_dict
from .ssl_encoder import (
    SSLEncoder,
    SSLEncoderConfig,
    feat_extract_output_lengths,
)
from .sslfrontend import SSLFrontend
from .whisper import (
    WhisperEncoder,
    WhisperEncoderConfig,
    convert_whisper_state_dict,
)

frontend_class_dict = {
    "fbank": None,
    "s3prl": SSLFrontend,
    "whisper_encoder": WhisperEncoder,
}

__all__ = [
    "convert_hf_state_dict",
    "WhisperEncoder",
    "WhisperEncoderConfig",
    "convert_whisper_state_dict",
    "SSLEncoder",
    "SSLEncoderConfig",
    "feat_extract_output_lengths",
    "SSLFrontend",
    "frontend_class_dict",
]
