#!/usr/bin/env python
"""NIST SRE16 recipe driver (reference examples/sre/v2/run.sh): train on
CTS -> extract -> cosine + PLDA + adapted-PLDA scoring (reference numbers:
cosine 15.4 / PLDA 11.7 / adapted 5.8 pooled EER)."""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "../../.."))

import numpy as np

from wespeaker_hubert_tpu.backend.plda import TwoCovPLDA
from wespeaker_hubert_tpu.bin.score import compute_metrics, read_trials
from wespeaker_hubert_tpu.utils.embeddings import embeddings_dict, load_embeddings


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--train_emb", required=True, help="PLDA training npz")
    p.add_argument("--train_utt2spk", required=True)
    p.add_argument("--enroll_emb", required=True)
    p.add_argument("--enroll_utt2spk", required=True)
    p.add_argument("--test_emb", required=True)
    p.add_argument("--adapt_emb", default=None, help="unlabeled in-domain npz")
    p.add_argument("--trials", required=True)
    p.add_argument("--out_dir", default="exp/sre_scores")
    p.add_argument("--em_iters", type=int, default=5)
    args = p.parse_args()
    os.makedirs(args.out_dir, exist_ok=True)

    # ---- train PLDA
    keys, emb = load_embeddings(args.train_emb)
    utt2spk = {
        u: s for u, s in (ln.split()[:2] for ln in open(args.train_utt2spk))
    }
    spk_to_emb = {}
    for k, e in zip(keys, emb):
        if k in utt2spk:
            spk_to_emb.setdefault(utt2spk[k], []).append(e)
    spk_to_emb = {s: np.stack(v) for s, v in spk_to_emb.items()}
    plda = TwoCovPLDA(dim=emb.shape[1], normalize_length=True)
    plda.train(spk_to_emb, num_em_iters=args.em_iters)
    plda.save(os.path.join(args.out_dir, "plda.npz"))

    # ---- enroll: multisession average per model id
    e_utt2spk = {
        u: s for u, s in (ln.split()[:2] for ln in open(args.enroll_utt2spk))
    }
    e_keys, e_emb = load_embeddings(args.enroll_emb)
    enroll = {}
    for k, e in zip(e_keys, e_emb):
        enroll.setdefault(e_utt2spk.get(k, k), []).append(e)
    enroll = {k: np.stack(v) for k, v in enroll.items()}
    test = embeddings_dict(args.test_emb)

    enroll_ids, test_ids, labels = read_trials(args.trials)
    trials = list(zip(enroll_ids, test_ids))

    def score_and_report(model, tag):
        scores = model.score_trials(enroll, test, trials)
        out = os.path.join(args.out_dir, f"{tag}.score")
        with open(out, "w") as f:
            for (e, t), s, lab in zip(trials, scores, labels):
                f.write(f"{e} {t} {s:.5f} {lab or ''}\n".rstrip() + "\n")
        if labels[0] is not None:
            eer, mindcf = compute_metrics(out)
            print(f"{tag}: EER {eer:.3f}% minDCF {mindcf:.4f}")
        return out

    score_and_report(plda, "plda")

    if args.adapt_emb:
        _, adapt_data = load_embeddings(args.adapt_emb)
        adapted = plda.adapt(adapt_data, ac_scale=0.5, wc_scale=0.5)
        adapted.save(os.path.join(args.out_dir, "plda_adapt.npz"))
        score_and_report(adapted, "plda_adapt")


if __name__ == "__main__":
    main()
