"""Composable embedding processing chain: mean-subtract | length-norm |
lda | whitening.

Reference: wespeaker/utils/embedding_processing.py —
chain_string_to_dict:23-67 parses "mean-subtract --scp a | length-norm |
lda --dim 100 | ..." strings; Lda:70 (within-class whitened LDA with
kaldi-style eigenvalue flooring), Length_norm:181, MeanSubtraction:204,
EmbeddingProcessingChain:219 with pickle save/load :243-251.  The
reference's Whitening is an empty stub; here it is implemented (ZCA on the
training covariance).  Persistence is npz instead of pickle.
"""

from __future__ import annotations

import re
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np
import scipy.linalg as spl

__all__ = ["EmbeddingProcessingChain", "parse_chain_string"]


def parse_chain_string(chain_string: Optional[str]):
    """'method --k v --k2 v2 | method2 ...' -> [[method, {k: v}], ...]."""
    if not chain_string:
        return []
    out = []
    for link in chain_string.split("|"):
        parts = link.split("--")
        method = parts.pop(0).strip()
        args = {}
        for p in parts:
            p = re.sub("=", " ", p)
            p = re.sub(" +", " ", p).strip()
            k, v = p.split(" ")
            args[k] = v
        out.append([method, args])
    return out


class _MeanSubtraction:
    def __init__(self, mean: np.ndarray):
        self.mean = np.asarray(mean)

    def __call__(self, embd):
        return embd - self.mean

    def state(self):
        return {"mean": self.mean}


class _LengthNorm:
    def __call__(self, embd):
        return embd / np.sqrt((embd**2).sum(axis=1, keepdims=True))

    def state(self):
        return {}


class _Lda:
    """Within-class-whitened LDA (reference Lda:70-178)."""

    def __init__(self, mean: np.ndarray, lda: np.ndarray):
        self.m = np.asarray(mean)
        self.lda = np.asarray(lda)

    @staticmethod
    def fit(
        spk_to_embeddings: Dict[str, np.ndarray],
        dim: int,
        eps: float = 1e-6,
        equal_speaker_weight: bool = False,
    ) -> "_Lda":
        counts, means, covs = [], [], []
        for vecs in spk_to_embeddings.values():
            mat = np.atleast_2d(np.asarray(vecs, np.float64))
            if len(mat) > 1:
                counts.append(len(mat))
                means.append(mat.mean(0))
                covs.append(np.cov(mat, rowvar=False, bias=True))
        counts = np.asarray(counts)
        means = np.vstack(means)
        covs = np.asarray(covs)
        if equal_speaker_weight:
            mean = means.mean(0)
            bc = np.cov(means, rowvar=False, bias=True)
            wc = covs.sum(0) / len(counts)
        else:
            mean = (counts[:, None] * means).sum(0) / counts.sum()
            bc = np.cov(means, rowvar=False, bias=True, fweights=counts)
            wc = (counts[:, None, None] * covs).sum(0) / counts.sum()

        e, m = spl.eigh(wc)
        e_floor = np.max(e) * eps
        e = np.where(e < e_floor, e_floor, e)
        t1 = np.diag(1.0 / np.sqrt(e)) @ m.T
        bc_w = t1 @ bc @ t1.T
        _, lda_vecs = spl.eigh(bc_w)
        lda = t1.T @ lda_vecs[:, -dim:]
        return _Lda(mean, lda)

    def __call__(self, embd):
        return (embd - self.m) @ self.lda

    def state(self):
        return {"mean": self.m, "lda": self.lda}


class _Whitening:
    """ZCA whitening on the training distribution (reference's Whitening
    class is an empty stub at embedding_processing.py:197-201; implemented
    here)."""

    def __init__(self, mean: np.ndarray, transform: np.ndarray):
        self.mean = np.asarray(mean)
        self.transform = np.asarray(transform)

    @staticmethod
    def fit(embeddings: np.ndarray, eps: float = 1e-6) -> "_Whitening":
        x = np.asarray(embeddings, np.float64)
        mean = x.mean(0)
        cov = np.cov(x - mean, rowvar=False, bias=True)
        e, v = spl.eigh(cov)
        e = np.maximum(e, np.max(e) * eps)
        transform = v @ np.diag(1.0 / np.sqrt(e)) @ v.T
        return _Whitening(mean, transform)

    def __call__(self, embd):
        return (embd - self.mean) @ self.transform

    def state(self):
        return {"mean": self.mean, "transform": self.transform}


class EmbeddingProcessingChain:
    """Fit from a chain string + training data, apply to embeddings, and
    persist as npz (reference EmbeddingProcessingChain:219)."""

    def __init__(self, links=None):
        self.links: List[Tuple[str, object]] = links or []

    def __call__(self, embd: np.ndarray) -> np.ndarray:
        embd = np.atleast_2d(np.asarray(embd, np.float64))
        for _, fn in self.links:
            embd = fn(embd)
        return embd

    # ---- fitting
    def fit(
        self,
        chain_string: str,
        embeddings: np.ndarray,
        utt2spk: Optional[Dict[str, str]] = None,
        keys: Optional[Sequence[str]] = None,
    ) -> "EmbeddingProcessingChain":
        """Each link is fitted on the training data AS TRANSFORMED by the
        links before it (reference passes current_chain into each
        constructor)."""
        spec = parse_chain_string(chain_string)
        self.links = []
        for method, args in spec:
            current = self(embeddings)
            if method == "mean-subtract":
                link = _MeanSubtraction(current.mean(0))
            elif method == "length-norm":
                link = _LengthNorm()
            elif method == "lda":
                assert utt2spk is not None and keys is not None
                spk_to_emb: Dict[str, list] = {}
                for k, e in zip(keys, current):
                    spk = utt2spk.get(k)
                    if spk is not None:
                        spk_to_emb.setdefault(spk, []).append(e)
                link = _Lda.fit(
                    {k: np.stack(v) for k, v in spk_to_emb.items()},
                    dim=int(args.get("dim", current.shape[1])),
                    eps=float(args.get("eps", 1e-6)),
                )
            elif method == "whitening":
                link = _Whitening.fit(current)
            else:
                raise ValueError(f"unknown chain link {method!r}")
            self.links.append((method, link))
        return self

    # ---- persistence
    def save(self, path: str) -> None:
        arrays, spec = {}, []
        for i, (method, fn) in enumerate(self.links):
            spec.append(method)
            for k, v in fn.state().items():
                arrays[f"{i}_{k}"] = v
        np.savez(path, spec=np.asarray(spec), **arrays)

    @staticmethod
    def load(path: str) -> "EmbeddingProcessingChain":
        data = np.load(path, allow_pickle=False)
        links = []
        for i, method in enumerate(str(m) for m in data["spec"]):
            if method == "mean-subtract":
                links.append((method, _MeanSubtraction(data[f"{i}_mean"])))
            elif method == "length-norm":
                links.append((method, _LengthNorm()))
            elif method == "lda":
                links.append(
                    (method, _Lda(data[f"{i}_mean"], data[f"{i}_lda"]))
                )
            elif method == "whitening":
                links.append(
                    (method,
                     _Whitening(data[f"{i}_mean"], data[f"{i}_transform"]))
                )
        return EmbeddingProcessingChain(links)
