#!/usr/bin/env python
"""NIST SRE (16/18/21) v3 backend driver — the reference's key addition
over v2 is the embedding-processing CHAIN fitted before the PLDA backend
(reference examples/sre/v3/run.sh stages 6-8 + README "Explanation of
embedding processing"):

  stage 6: fit "mean-subtract | length-norm | lda --dim D | length-norm"
           on the (augmented) CTS embeddings, train PLDA on the processed
           embeddings, score every eval set through the chain;
  stage 7: swap link 0 for an in-domain mean (sre16 major / sre18
           unlabeled) via update_embd_proc and rescore;
  stage 8: adapt PLDA covariances on the chain-processed in-domain data
           and rescore.

Extractor training/extraction is the v2 flow (examples/voxceleb/v2 or
sre/v2); this driver consumes .npz embedding sets.

Usage:
  python run.py --stage 6 --stop_stage 8 \
    --train_emb exp/emb/cts_aug.npz --train_utt2spk data/cts_aug/utt2spk \
    --enroll_emb exp/emb/sre16_enroll.npz \
    --enroll_utt2spk data/sre16/eval/enrollment/utt2spk \
    --test_emb exp/emb/sre16_test.npz --trials data/sre16/eval/trials \
    --indomain_emb exp/emb/sre16_major.npz --lda_dim 100
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "../../.."))

import numpy as np

from wespeaker_hubert_tpu.backend.plda import TwoCovPLDA
from wespeaker_hubert_tpu.bin.embd_proc import (
    apply_chain,
    prep_chain,
    update_chain,
)
from wespeaker_hubert_tpu.bin.plda_bins import eval_plda, train_plda
from wespeaker_hubert_tpu.utils.embeddings import load_embeddings

DEFAULT_CHAIN = (
    "mean-subtract | length-norm | lda --dim {dim} | length-norm"
)


def apply_chain_file(chain_path, emb_path, out_path):
    apply_chain(chain_path, emb_path, out_path)
    return out_path


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--stage", type=int, default=6)
    p.add_argument("--stop_stage", type=int, default=8)
    p.add_argument("--exp_dir", default="exp/sre_v3")
    p.add_argument("--train_emb", required=True,
                   help="CTS(-aug) backend-training embeddings .npz")
    p.add_argument("--train_utt2spk", required=True)
    p.add_argument("--enroll_emb", required=True)
    p.add_argument("--enroll_utt2spk", default=None,
                   help="utt2mdl mapping for multisession enrollment")
    p.add_argument("--test_emb", required=True)
    p.add_argument("--trials", required=True)
    p.add_argument("--indomain_emb", default=None,
                   help="unlabeled in-domain .npz (sre16 major / sre18 unlab)")
    p.add_argument("--lda_dim", type=int, default=100)
    p.add_argument("--chain", default=None,
                   help="override the processing-chain string")
    p.add_argument("--em_iters", type=int, default=5)
    args = p.parse_args()

    os.makedirs(args.exp_dir, exist_ok=True)
    chain_str = args.chain or DEFAULT_CHAIN.format(dim=args.lda_dim)
    chain_path = os.path.join(args.exp_dir, "embd_proc_cts.npz")
    plda_path = os.path.join(args.exp_dir, "plda.npz")
    proc_dir = os.path.join(args.exp_dir, "proc_emb")
    os.makedirs(proc_dir, exist_ok=True)

    def in_range(s):
        return args.stage <= s <= args.stop_stage

    def score_with(chain_file, plda_file, tag):
        """chain-process enroll/test and PLDA-score the trials."""
        enroll_p = apply_chain_file(
            chain_file, args.enroll_emb, os.path.join(proc_dir, f"{tag}_enroll.npz")
        )
        test_p = apply_chain_file(
            chain_file, args.test_emb, os.path.join(proc_dir, f"{tag}_test.npz")
        )
        return eval_plda(
            plda_file, enroll_p, test_p, args.trials,
            os.path.join(args.exp_dir, "scores", f"{tag}.score"),
            enroll_utt2spk=args.enroll_utt2spk,
        )

    if in_range(6):
        print(f"stage 6: fit chain [{chain_str}] + train PLDA + score")
        prep_chain(
            chain_str, args.train_emb, chain_path,
            utt2spk=args.train_utt2spk,
        )
        train_p = apply_chain_file(
            chain_path, args.train_emb, os.path.join(proc_dir, "cts.npz")
        )
        train_plda(train_p, args.train_utt2spk, plda_path,
                   em_iters=args.em_iters)
        score_with(chain_path, plda_path, "plda_ctsmean")

    chain_indom = os.path.join(args.exp_dir, "embd_proc_indomain.npz")
    if in_range(7) and args.indomain_emb:
        print("stage 7: in-domain mean (update chain link 0) + rescore")
        # replaces the CTS mean-subtract with the in-domain mean, refitting
        # nothing else (reference bin/update_embd_proc.py semantics)
        update_chain(chain_path, args.indomain_emb, chain_indom)
        score_with(chain_indom, plda_path, "plda_indomainmean")

    if in_range(8) and args.indomain_emb:
        print("stage 8: PLDA adaptation on chain-processed in-domain data")
        chain_file = chain_indom if os.path.exists(chain_indom) else chain_path
        indom_p = apply_chain_file(
            chain_file, args.indomain_emb,
            os.path.join(proc_dir, "indomain.npz"),
        )
        _, indom = load_embeddings(indom_p)
        plda = TwoCovPLDA.load(plda_path)
        adapted = plda.adapt(indom, ac_scale=0.5, wc_scale=0.5)
        adapted_path = os.path.join(args.exp_dir, "plda_adapt.npz")
        adapted.save(adapted_path)
        score_with(chain_file, adapted_path, "plda_adapt")


if __name__ == "__main__":
    main()
