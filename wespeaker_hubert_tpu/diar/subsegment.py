"""Sliding-window subsegmentation of SAD segments for diarization.

Reference: wespeaker/diar/extract_emb.py:55-83 (frame-domain windows of
1.5 s / 0.75 s with np.resize tile-padding of short tails) and the seg-id
naming convention `utt-beginms-endms-beginfrm-endfrm` consumed by
make_rttm.py:33.
"""

from __future__ import annotations

from typing import List, Tuple

import numpy as np

__all__ = ["subsegment_fbank", "make_seg_id", "parse_subseg_id"]


def make_seg_id(utt: str, begin_ms: int, end_ms: int) -> str:
    return f"{utt}-{begin_ms:08d}-{end_ms:08d}"


def parse_subseg_id(subseg: str, frame_shift: int = 10):
    """subseg id -> (utt, begin_s, end_s) (reference make_rttm.py:33-41)."""
    utt, begin_ms, end_ms, begin_frames, end_frames = subseg.rsplit("-", 4)
    begin = (int(begin_ms) + int(begin_frames) * frame_shift) / 1000.0
    end = (int(begin_ms) + int(end_frames) * frame_shift) / 1000.0
    return utt, begin, end


def subsegment_fbank(
    fbank: np.ndarray,
    seg_id: str,
    window_fs: int = 150,
    period_fs: int = 75,
    frame_shift: int = 10,
) -> Tuple[List[str], List[np.ndarray]]:
    """Cut one SAD segment's fbank into fixed 1.5 s windows.

    `seg_id` is `utt-beginms-endms`; the nominal segment length in frames
    comes from the id (reference extract_emb.py:59-64 — kaldi fbank yields
    seg_length-2 frames, the id-based length is used for window math).
    Short segments/tails are np.resize tile-padded to window_fs.
    """
    subsegs, subseg_fbanks = [], []
    seg_begin, seg_end = seg_id.rsplit("-", 2)[-2:]
    seg_length = (int(seg_end) - int(seg_begin)) // frame_shift
    num_frames, feat_dim = fbank.shape

    if seg_length <= window_fs:
        subsegs.append(seg_id + f"-{0:08d}-{seg_length:08d}")
        subseg_fbanks.append(np.resize(fbank, (window_fs, feat_dim)))
    else:
        max_subseg_begin = seg_length - window_fs + period_fs
        for subseg_begin in range(0, max_subseg_begin, period_fs):
            subseg_end = min(subseg_begin + window_fs, seg_length)
            subsegs.append(
                seg_id + f"-{subseg_begin:08d}-{subseg_end:08d}"
            )
            subseg_fbanks.append(
                np.resize(
                    fbank[subseg_begin:subseg_end], (window_fs, feat_dim)
                )
            )
    return subsegs, subseg_fbanks
