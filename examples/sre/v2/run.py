#!/usr/bin/env python
"""NIST SRE16 recipe driver (reference examples/sre/v2/run.sh):

  stage 1  aug stores (MUSAN + RIRs)
  stage 2  data lists with VAD cropping (shard list for swbd_sre
           training, raw lists for the PLDA/eval sets — run.sh:39-67)
  stage 3  train the extractor on swbd_sre (run.sh:69-85)
  stage 4  average + extract embeddings for sre / sre16_major /
           sre16_eval_enroll / sre16_eval_test (run.sh:87-112,
           local/extract_sre.sh)
  stage 5  cosine scoring, sre16_major mean subtracted
           (local/score.sh)
  stage 6  PLDA trained on sre, unsupervised adaptation on sre16_major,
           trial scoring (local/score_plda.sh) — also callable
           standalone with explicit --*_emb paths (the round-1 backend
           entry point)
  stage 7  export (run.sh:132-138)

Data layout under --data_root (reference local/prepare_data.sh):
  swbd_sre/{wav.scp,utt2spk[,vad]}       extractor training (CTS superset)
  sre/{wav.scp,utt2spk[,vad]}            PLDA backend training
  sre16_major/{wav.scp[,vad]}            unlabeled in-domain adaptation
  sre16_eval_enroll/{wav.scp,utt2spk[,vad]}
  sre16_eval_test/{wav.scp[,vad]}
  musan/wav.scp  rirs/wav.scp            augmentation sources
Reference numbers: cosine 15.4 / PLDA 11.7 / adapted 5.8 pooled EER.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "../../.."))

import numpy as np

from wespeaker_hubert_tpu.backend.plda import TwoCovPLDA
from wespeaker_hubert_tpu.bin.average_model import average_model
from wespeaker_hubert_tpu.bin.extract import extract
from wespeaker_hubert_tpu.bin.score import (
    compute_metrics,
    read_trials,
)
from wespeaker_hubert_tpu.bin.tools import (
    build_aug_store,
    make_raw_list,
    make_shard_list,
)
from wespeaker_hubert_tpu.bin.train import train
from wespeaker_hubert_tpu.utils.config import load_config
from wespeaker_hubert_tpu.utils.embeddings import (
    embeddings_dict,
    load_embeddings,
)

EVAL_SETS = ("sre", "sre16_major", "sre16_eval_enroll", "sre16_eval_test")


def _utt2spk(path):
    return {u: s for u, s in (ln.split()[:2] for ln in open(path))}


def backend_stage(
    train_emb,
    train_utt2spk,
    enroll_emb,
    enroll_utt2spk,
    test_emb,
    trials_path,
    out_dir,
    adapt_emb=None,
    em_iters=5,
):
    """Stage 6: PLDA train -> multisession scoring -> BUT adaptation
    (reference local/score_plda.sh + wespeaker/bin/{train,adapt}_plda)."""
    os.makedirs(out_dir, exist_ok=True)
    keys, emb = load_embeddings(train_emb)
    utt2spk = _utt2spk(train_utt2spk)
    spk_to_emb = {}
    for k, e in zip(keys, emb):
        if k in utt2spk:
            spk_to_emb.setdefault(utt2spk[k], []).append(e)
    spk_to_emb = {s: np.stack(v) for s, v in spk_to_emb.items()}
    plda = TwoCovPLDA(dim=emb.shape[1], normalize_length=True)
    plda.train(spk_to_emb, num_em_iters=em_iters)
    plda.save(os.path.join(out_dir, "plda.npz"))

    e_utt2spk = _utt2spk(enroll_utt2spk)
    e_keys, e_emb = load_embeddings(enroll_emb)
    enroll = {}
    for k, e in zip(e_keys, e_emb):
        enroll.setdefault(e_utt2spk.get(k, k), []).append(e)
    enroll = {k: np.stack(v) for k, v in enroll.items()}
    test = embeddings_dict(test_emb)

    enroll_ids, test_ids, labels = read_trials(trials_path)
    trials = list(zip(enroll_ids, test_ids))

    def score_and_report(model, tag):
        scores = model.score_trials(enroll, test, trials)
        out = os.path.join(out_dir, f"{tag}.score")
        with open(out, "w") as f:
            for (e, t), s, lab in zip(trials, scores, labels):
                f.write(f"{e} {t} {s:.5f} {lab or ''}\n".rstrip() + "\n")
        if labels[0] is not None:
            eer, mindcf = compute_metrics(out)
            print(f"{tag}: EER {eer:.3f}% minDCF {mindcf:.4f}")
        return out

    score_and_report(plda, "plda")

    if adapt_emb:
        _, adapt_data = load_embeddings(adapt_emb)
        adapted = plda.adapt(adapt_data, ac_scale=0.5, wc_scale=0.5)
        adapted.save(os.path.join(out_dir, "plda_adapt.npz"))
        score_and_report(adapted, "plda_adapt")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--stage", type=int, default=6)
    p.add_argument("--stop_stage", type=int, default=6)
    p.add_argument("--config", default=None, help="train yaml (stages 3+)")
    p.add_argument("--data_root", default="data")
    p.add_argument("--trials", default=None)
    p.add_argument("--out_dir", default="exp/sre_scores")
    p.add_argument("--em_iters", type=int, default=5)
    # standalone stage-6 entry: explicit embedding sets (skip stages 1-5)
    p.add_argument("--train_emb", default=None, help="PLDA training npz")
    p.add_argument("--train_utt2spk", default=None)
    p.add_argument("--enroll_emb", default=None)
    p.add_argument("--enroll_utt2spk", default=None)
    p.add_argument("--test_emb", default=None)
    p.add_argument("--adapt_emb", default=None,
                   help="unlabeled in-domain npz")
    args = p.parse_args()

    if args.train_emb:
        # backend-only invocation (explicit npz paths)
        backend_stage(
            args.train_emb, args.train_utt2spk, args.enroll_emb,
            args.enroll_utt2spk, args.test_emb, args.trials,
            args.out_dir, adapt_emb=args.adapt_emb,
            em_iters=args.em_iters,
        )
        return

    config = load_config(args.config)
    exp_dir = config["exp_dir"]
    emb_dir = os.path.join(exp_dir, "embeddings")
    avg_ckpt = os.path.join(exp_dir, "avg_model.ckpt")

    def in_range(s):
        return args.stage <= s <= args.stop_stage

    def vad_of(dset):
        v = os.path.join(args.data_root, dset, "vad")
        return v if os.path.exists(v) else None

    if in_range(1):
        print("stage 1: build aug stores (MUSAN + RIRs)")
        build_aug_store(
            os.path.join(args.data_root, "musan/wav.scp"),
            os.path.join(args.data_root, "musan_aug_store"),
        )
        build_aug_store(
            os.path.join(args.data_root, "rirs/wav.scp"),
            os.path.join(args.data_root, "rirs_aug_store"),
        )

    if in_range(2):
        print("stage 2: data lists (VAD-cropped, run.sh:39-67)")
        d = os.path.join(args.data_root, "swbd_sre")
        if config.get("data_type", "raw") == "shard":
            make_shard_list(
                os.path.join(d, "wav.scp"), os.path.join(d, "utt2spk"),
                os.path.join(d, "shards"), os.path.join(d, "shard.list"),
                vad_file=vad_of("swbd_sre"),
            )
        make_raw_list(
            os.path.join(d, "wav.scp"), os.path.join(d, "utt2spk"),
            os.path.join(d, "raw.list"), vad_of("swbd_sre"),
        )
        for dset in EVAL_SETS:
            dd = os.path.join(args.data_root, dset)
            u2s = os.path.join(dd, "utt2spk")
            if not os.path.exists(u2s):
                # unlabeled sets (sre16_major / eval_test): identity map
                with open(os.path.join(dd, "wav.scp")) as ws, \
                        open(u2s, "w") as f:
                    for ln in ws:
                        u = ln.split()[0]
                        f.write(f"{u} {u}\n")
            make_raw_list(
                os.path.join(dd, "wav.scp"), u2s,
                os.path.join(dd, "raw.list"), vad_of(dset),
            )

    if in_range(3):
        print("stage 3: train extractor on swbd_sre")
        train(config)

    if in_range(4):
        print("stage 4: average + extract embeddings")
        average_model(
            os.path.join(exp_dir, "models"), avg_ckpt,
            num=config.get("num_avg", 10),
        )
        for dset in EVAL_SETS:
            extract(
                config,
                os.path.join(args.data_root, dset, "raw.list"),
                avg_ckpt,
                os.path.join(emb_dir, f"{dset}.npz"),
            )

    if in_range(5):
        print("stage 5: cosine scoring (sre16_major mean subtracted)")
        # reference local/score.sh subtracts the unlabeled in-domain
        # (sre16 major) mean before cosine
        _, major = load_embeddings(os.path.join(emb_dir, "sre16_major.npz"))
        mean = major.mean(0)
        enroll_u2s = _utt2spk(os.path.join(
            args.data_root, "sre16_eval_enroll", "utt2spk"
        ))
        e_keys, e_emb = load_embeddings(
            os.path.join(emb_dir, "sre16_eval_enroll.npz")
        )
        models = {}
        for k, e in zip(e_keys, e_emb):
            models.setdefault(enroll_u2s.get(k, k), []).append(e - mean)
        models = {
            m: np.mean(np.stack(v), axis=0) for m, v in models.items()
        }
        test = {
            k: e - mean
            for k, e in embeddings_dict(
                os.path.join(emb_dir, "sre16_eval_test.npz")
            ).items()
        }
        enroll_ids, test_ids, labels = read_trials(args.trials)
        os.makedirs(args.out_dir, exist_ok=True)
        out = os.path.join(args.out_dir, "cosine.score")
        with open(out, "w") as f:
            for e, t, lab in zip(enroll_ids, test_ids, labels):
                a, b = models[e], test[t]
                s = float(
                    np.dot(a, b)
                    / max(np.linalg.norm(a) * np.linalg.norm(b), 1e-9)
                )
                f.write(f"{e} {t} {s:.5f} {lab or ''}\n".rstrip() + "\n")
        if labels[0] is not None:
            eer, mindcf = compute_metrics(out)
            print(f"cosine: EER {eer:.3f}% minDCF {mindcf:.4f}")

    if in_range(6):
        print("stage 6: PLDA + adaptation")
        backend_stage(
            os.path.join(emb_dir, "sre.npz"),
            os.path.join(args.data_root, "sre", "utt2spk"),
            os.path.join(emb_dir, "sre16_eval_enroll.npz"),
            os.path.join(args.data_root, "sre16_eval_enroll", "utt2spk"),
            os.path.join(emb_dir, "sre16_eval_test.npz"),
            args.trials, args.out_dir,
            adapt_emb=os.path.join(emb_dir, "sre16_major.npz"),
            em_iters=args.em_iters,
        )

    if in_range(7):
        print("stage 7: export model bundle")
        from wespeaker_hubert_tpu.bin.export_model import (
            export_model,
            export_stablehlo,
        )

        out_dir = export_model(
            exp_dir, os.path.join(exp_dir, "exported"), checkpoint=avg_ckpt
        )
        export_stablehlo(
            load_config(os.path.join(out_dir, "config.yaml")),
            avg_ckpt, os.path.join(out_dir, "model.stablehlo"),
        )
        print(f"  exported {out_dir}")


if __name__ == "__main__":
    main()
