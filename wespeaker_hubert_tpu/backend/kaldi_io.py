"""Minimal Kaldi binary format readers (PLDA model import).

Equivalent of reference wespeaker/utils/plda/kaldi_utils.py:24 read_plda.
Kaldi binary container: b"\\0B" marker, space-terminated tokens, basic
types prefixed by a byte giving their width; vectors are "FV"/"DV" +
int32 dim + data, matrices "FM"/"DM" + int32 rows + int32 cols + data.
A PLDA model file is: <Plda> mean transform psi </Plda>.
"""

from __future__ import annotations

import struct
from typing import BinaryIO, Tuple

import numpy as np

__all__ = ["read_kaldi_plda", "load_kaldi_plda"]


def _read_token(f: BinaryIO) -> str:
    chars = []
    while True:
        c = f.read(1)
        if not c or c == b" ":
            break
        chars.append(c)
    return b"".join(chars).decode()


def _expect_token(f: BinaryIO, want: str):
    got = _read_token(f)
    if got != want:
        raise ValueError(f"expected kaldi token {want!r}, got {got!r}")


def _read_int32(f: BinaryIO) -> int:
    size = f.read(1)
    if size != b"\x04":
        raise ValueError(f"expected int32 size marker, got {size!r}")
    return struct.unpack("<i", f.read(4))[0]


def _read_vector(f: BinaryIO) -> np.ndarray:
    token = _read_token(f)
    if token == "FV":
        dtype, width = "<f4", 4
    elif token == "DV":
        dtype, width = "<f8", 8
    else:
        raise ValueError(f"expected FV/DV, got {token!r}")
    dim = _read_int32(f)
    return np.frombuffer(f.read(dim * width), dtype=dtype).astype(np.float64)


def _read_matrix(f: BinaryIO) -> np.ndarray:
    token = _read_token(f)
    if token == "FM":
        dtype, width = "<f4", 4
    elif token == "DM":
        dtype, width = "<f8", 8
    else:
        raise ValueError(f"expected FM/DM, got {token!r}")
    rows = _read_int32(f)
    cols = _read_int32(f)
    data = np.frombuffer(f.read(rows * cols * width), dtype=dtype)
    return data.reshape(rows, cols).astype(np.float64)


def read_kaldi_plda(path: str) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """-> (mean, transform, psi)."""
    with open(path, "rb") as f:
        marker = f.read(2)
        if marker != b"\x00B":
            raise ValueError("not a kaldi binary file (missing \\0B)")
        _expect_token(f, "<Plda>")
        mean = _read_vector(f)
        transform = _read_matrix(f)
        psi = _read_vector(f)
        # trailing </Plda> optional to tolerate writer variants
    return mean, transform, psi


def load_kaldi_plda(path: str, normalize_length: bool = True):
    """Kaldi plda file -> backend.plda.TwoCovPLDA (reference
    TwoCovPLDA.load_model(from_kaldi=True) at two_cov_plda.py:349-353)."""
    from .plda import TwoCovPLDA

    mean, transform, psi = read_kaldi_plda(path)
    plda = TwoCovPLDA(dim=len(mean), normalize_length=normalize_length)
    plda.mu = mean
    plda.transform = transform
    plda.psi = psi
    plda.offset = -transform @ mean
    return plda
