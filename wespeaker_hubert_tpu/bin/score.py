"""Trial scoring + AS-Norm + metrics CLI stages (reference bin/score.py:38,
bin/score_norm.py:54, bin/compute_metrics.py:26 rebuilt on the on-device
backend).

Trial files are the reference's text format: `enroll test [target|nontarget]`
per line.  Scores are written as `enroll test score [label]`.
"""

from __future__ import annotations

import logging
import os
from typing import List, Optional, Tuple

import numpy as np

from ..backend import (
    apply_asnorm,
    cohort_mean_std,
    compute_c_norm,
    compute_eer,
    compute_pmiss_pfa,
    trial_cosine_scores,
)
from ..utils.embeddings import load_embeddings

__all__ = [
    "read_trials",
    "write_scores",
    "score_trials",
    "score_norm",
    "compute_metrics",
]


def read_trials(path: str) -> Tuple[List[str], List[str], List[Optional[str]]]:
    enroll, test, labels = [], [], []
    with open(path) as f:
        for line in f:
            parts = line.split()
            if len(parts) < 2:
                continue
            enroll.append(parts[0])
            test.append(parts[1])
            labels.append(parts[2] if len(parts) > 2 else None)
    return enroll, test, labels


def write_scores(path, enroll, test, scores, labels) -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w") as f:
        for e, t, s, lab in zip(enroll, test, scores, labels):
            if lab is None:
                f.write(f"{e} {t} {s:.5f}\n")
            else:
                f.write(f"{e} {t} {s:.5f} {lab}\n")


def score_trials(
    emb_path: str,
    trial_files: List[str],
    store_dir: str,
    mean_vec_path: Optional[str] = None,
) -> List[str]:
    """Cosine-score trial files against an embedding set (reference
    bin/score.py main:75).  Returns written score-file paths."""
    keys, emb = load_embeddings(emb_path)
    key2idx = {k: i for i, k in enumerate(keys)}
    mean_vec = np.load(mean_vec_path) if mean_vec_path else None

    outputs = []
    for trial in trial_files:
        enroll, test, labels = read_trials(trial)
        e_idx = np.asarray([key2idx[k] for k in enroll])
        t_idx = np.asarray([key2idx[k] for k in test])
        scores = trial_cosine_scores(emb, e_idx, t_idx, mean_vec=mean_vec)
        out = os.path.join(store_dir, os.path.basename(trial) + ".score")
        write_scores(out, enroll, test, scores, labels)
        outputs.append(out)
    return outputs


def score_norm(
    score_file: str,
    output_file: str,
    eval_emb_path: str,
    cohort_emb_path: str,
    method: str = "asnorm",
    top_n: int = 300,
    mean_vec_path: Optional[str] = None,
    sharded: bool = False,
) -> str:
    """AS-Norm / S-Norm a score file (reference bin/score_norm.py:54).
    The output keeps the reference's extended format with embedding
    magnitudes + cohort means for QMF calibration (:108-115).

    sharded=True runs the cohort-statistics matmul data-parallel over all
    devices (backend/score.cohort_mean_std with a mesh)."""
    keys, emb = load_embeddings(eval_emb_path)
    ckeys, cohort = load_embeddings(cohort_emb_path)
    mean_vec = np.load(mean_vec_path) if mean_vec_path else 0.0
    emb = emb - mean_vec
    cohort = cohort - mean_vec

    enroll, test, raw = [], [], []
    labels = []
    with open(score_file) as f:
        for line in f:
            parts = line.split()
            enroll.append(parts[0])
            test.append(parts[1])
            raw.append(float(parts[2]))
            labels.append(parts[3] if len(parts) > 3 else None)

    uniq = sorted(set(enroll) | set(test))
    key2row = {k: i for i, k in enumerate(keys)}
    sel = np.asarray([key2row[k] for k in uniq])
    sel_emb = emb[sel]
    n = len(cohort) if method == "snorm" else top_n
    mesh = None
    if sharded:
        import jax

        from ..parallel.mesh import make_mesh

        if len(jax.devices()) > 1:
            mesh = make_mesh(model_parallel=1)
    mean, std = cohort_mean_std(sel_emb, cohort, n, mesh=mesh)
    mean, std = np.asarray(mean), np.asarray(std)
    uniq2i = {k: i for i, k in enumerate(uniq)}
    e_i = np.asarray([uniq2i[k] for k in enroll])
    t_i = np.asarray([uniq2i[k] for k in test])
    normed = apply_asnorm(np.asarray(raw), e_i, t_i, mean, std, mean, std)

    mags = np.linalg.norm(sel_emb, axis=1)
    os.makedirs(os.path.dirname(output_file) or ".", exist_ok=True)
    with open(output_file, "w") as f:
        for i in range(len(raw)):
            lab = labels[i] if labels[i] is not None else ""
            f.write(
                "{} {} {:.5f} {} {:.4f} {:.4f} {:.4f} {:.4f}\n".format(
                    enroll[i], test[i], normed[i], lab,
                    mags[e_i[i]], mags[t_i[i]], mean[e_i[i]], mean[t_i[i]],
                )
            )
    return output_file


def compute_metrics(
    score_file: str, p_target: float = 0.01, c_miss: float = 1.0, c_fa: float = 1.0
) -> Tuple[float, float]:
    """(EER%, minDCF) from a labeled score file (reference
    bin/compute_metrics.py:26)."""
    scores, labels = [], []
    with open(score_file) as f:
        for line in f:
            parts = line.split()
            scores.append(float(parts[2]))
            labels.append(1 if parts[3] == "target" else 0)
    scores = np.asarray(scores)
    labels = np.asarray(labels)
    fnr, fpr = compute_pmiss_pfa(scores, labels)
    eer = compute_eer(fnr, fpr) * 100
    mindcf = compute_c_norm(fnr, fpr, p_target, c_miss, c_fa)
    logging.getLogger("score").info(
        "%s: EER %.3f%% minDCF(p=%.3g) %.4f", score_file, eer, p_target, mindcf
    )
    return eer, mindcf


def main():
    import argparse

    p = argparse.ArgumentParser()
    sub = p.add_subparsers(dest="cmd", required=True)

    s = sub.add_parser("cosine")
    s.add_argument("--emb", required=True)
    s.add_argument("--store_dir", required=True)
    s.add_argument("--mean_vec", default=None)
    s.add_argument("trials", nargs="+")

    s = sub.add_parser("norm")
    s.add_argument("--score_file", required=True)
    s.add_argument("--output", required=True)
    s.add_argument("--eval_emb", required=True)
    s.add_argument("--cohort_emb", required=True)
    s.add_argument("--method", default="asnorm")
    s.add_argument("--top_n", type=int, default=300)
    s.add_argument("--sharded", action="store_true",
                   help="data-parallel cohort statistics over all devices")

    s = sub.add_parser("metrics")
    s.add_argument("--p_target", type=float, default=0.01)
    s.add_argument("scores", nargs="+")

    args = p.parse_args()
    logging.basicConfig(level=logging.INFO)
    if args.cmd == "cosine":
        score_trials(args.emb, args.trials, args.store_dir, args.mean_vec)
    elif args.cmd == "norm":
        score_norm(
            args.score_file, args.output, args.eval_emb, args.cohort_emb,
            args.method, args.top_n, sharded=args.sharded,
        )
    else:
        for sf in args.scores:
            eer, mindcf = compute_metrics(sf, args.p_target)
            print(f"{sf} EER {eer:.3f}% minDCF {mindcf:.4f}")


if __name__ == "__main__":
    main()
