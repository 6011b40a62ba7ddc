from .fbank import FbankConfig, fbank, frame_signal, num_frames
from .feature_utils import apply_cmvn, spec_aug

__all__ = [
    "FbankConfig",
    "fbank",
    "frame_signal",
    "num_frames",
    "apply_cmvn",
    "spec_aug",
]
