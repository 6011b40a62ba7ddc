"""QMF score-calibration CLI (reference bin/score_calibration.py as
three fire commands: gather_calibration_factors / train_calibration_model
/ infer_calibration).  Factor gathering + Cllr L-BFGS live in
backend/calibration.py."""

from __future__ import annotations

import numpy as np

from ..backend.calibration import (
    apply_calibration,
    gather_factors,
    train_calibration,
)

__all__ = ["calibrate_scores", "train_calibration_on_train_set"]


def train_calibration_on_train_set(
    train_dir: str,
    emb_path: str,
    cohort_path: str,
    mean_vec_path: str,
    exp_dir: str,
    score_dir: str,
    top_n: int = 300,
    each_trial_num: int = 10000,
):
    """Fit the QMF calibrator on trials GENERATED from the training set
    (reference local/score_calibration.sh stages 1-3: wav2dur ->
    generate_calibration_trial -> score -> score_norm -> factor fit) —
    never on the eval trials, which would leak eval labels into the
    calibrator.  Shared by the voxceleb/cnceleb stage-7 drivers.

    train_dir needs wav.scp + utt2spk (utt2dur is created if absent);
    emb_path/cohort_path/mean_vec_path are the train-set embeddings,
    speaker-mean cohort, and mean vector from the earlier stages.
    Returns (params, cllr, num_trials)."""
    import os

    from .score import score_norm, score_trials
    from .tools import generate_calibration_trial, wav2dur

    cal_dur = os.path.join(train_dir, "utt2dur")
    if not os.path.exists(cal_dur):
        wav2dur(os.path.join(train_dir, "wav.scp"), cal_dur)
    cal_trials = os.path.join(exp_dir, "calibration.trials")
    generate_calibration_trial(
        cal_dur,
        os.path.join(train_dir, "utt2spk"),
        cal_trials,
        each_trial_num=each_trial_num,
    )
    cal_score = score_trials(
        emb_path, [cal_trials], score_dir, mean_vec_path
    )[0]
    cal_normed = score_norm(
        cal_score, cal_score + ".asnorm", emb_path, cohort_path,
        method="asnorm", top_n=top_n, mean_vec_path=mean_vec_path,
    )
    durs = _load_durations(cal_dur)
    factors, meta = gather_factors(list(open(cal_normed)), durs)
    labels = np.asarray([1 if m[2] == "target" else 0 for m in meta])
    params, loss = train_calibration(factors, labels)
    return params, loss, len(meta)


def _load_durations(path):
    if not path:
        return None
    return {
        u: float(d) for u, d in (ln.split()[:2] for ln in open(path))
    }


def calibrate_scores(
    train_score_file: str,
    eval_score_file: str,
    output_file: str,
    utt2dur: str = None,
    max_dur: float = 20.0,
):
    """Fit the linear QMF on a labeled (dev) score file, apply to the eval
    score file, write calibrated scores."""
    durations = _load_durations(utt2dur)
    train_lines = [ln for ln in open(train_score_file)]
    factors, meta = gather_factors(train_lines, durations, max_dur)
    labels = np.asarray(
        [1 if m[2] in ("target", "tgt") else 0 for m in meta]
    )
    params, loss = train_calibration(factors, labels)

    eval_lines = [ln for ln in open(eval_score_file)]
    e_factors, e_meta = gather_factors(eval_lines, durations, max_dur)
    calibrated = apply_calibration(params, e_factors)
    with open(output_file, "w") as f:
        for (e, t, lab), s in zip(e_meta, calibrated):
            if lab is None:
                f.write(f"{e} {t} {s:.5f}\n")
            else:
                f.write(f"{e} {t} {s:.5f} {lab}\n")
    return params, loss


def main():
    import argparse

    p = argparse.ArgumentParser()
    p.add_argument("--train_scores", required=True,
                   help="labeled AS-Norm score file (QMF factor columns)")
    p.add_argument("--eval_scores", required=True)
    p.add_argument("--output", required=True)
    p.add_argument("--utt2dur", default=None)
    p.add_argument("--max_dur", type=float, default=20.0)
    args = p.parse_args()
    params, loss = calibrate_scores(
        args.train_scores, args.eval_scores, args.output, args.utt2dur,
        args.max_dur,
    )
    print(f"calibration cllr {loss:.4f}; params {np.round(params, 4)}")


if __name__ == "__main__":
    main()
