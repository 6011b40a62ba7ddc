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


# ---------------------------------------------------------------- stage 1-2
# Front-half data prep, the roles of the reference's local/ scripts
# (prepare_cts_superset.sh, make_system_sad.py, utt2voice_duration.py,
# filter_utt_accd_dur.py, generate_sre_aug.py).


def prepare_cts(cts_dir, out_dir):
    """CTS-superset key TSV -> wav.scp / utt2spk / spk2utt
    (reference local/prepare_cts_superset.sh:16-33: column 1 is the
    segment file, column 3 the speaker id).  Audio is referenced under
    <cts_dir>/data/ with whatever extension exists (.sph in LDC2021E08;
    .wav in tests — the pipeline reads either via the wav loader)."""
    key = os.path.join(cts_dir, "docs", "cts_superset_segment_key.tsv")
    os.makedirs(out_dir, exist_ok=True)
    spk2utt = {}
    n_sph = 0
    with open(key) as f, open(os.path.join(out_dir, "wav.scp"), "w") as ws, \
            open(os.path.join(out_dir, "utt2spk"), "w") as us:
        next(f)  # header
        for line in f:
            cols = line.rstrip("\n").split("\t")
            if len(cols) < 3:
                continue
            utt = os.path.splitext(cols[0])[0]
            spk = cols[2]
            base = os.path.join(cts_dir, "data", utt)
            path = next(
                (base + ext for ext in (".wav", ".sph", "")
                 if os.path.exists(base + ext)), base + ".sph",
            )
            if path.endswith(".sph"):
                n_sph += 1
            ws.write(f"{utt} {path}\n")
            us.write(f"{utt} {spk}\n")
            spk2utt.setdefault(spk, []).append(utt)
    if n_sph:
        # the wav loader reads RIFF/WAVE only — LDC ships NIST SPHERE;
        # fail HERE with the remedy instead of at the first SAD read
        # (the reference pipes through ffmpeg in wav.scp,
        # local/prepare_cts_superset.sh:26)
        raise SystemExit(
            f"prepare_cts: {n_sph} utterances are NIST SPHERE (.sph); "
            "convert them to RIFF wav first, e.g.\n"
            "  for f in data/*.sph; do "
            "ffmpeg -i $f -ar 8000 ${f%.sph}.wav; done\n"
            "then re-run stage 1 (the .wav next to each .sph is "
            "preferred automatically)."
        )
    with open(os.path.join(out_dir, "spk2utt"), "w") as f:
        for spk in sorted(spk2utt):
            f.write(spk + " " + " ".join(spk2utt[spk]) + "\n")
    return len(spk2utt)


def make_system_sad_file(wav_scp, vad_out, vad_npz=None,
                         min_duration=0.255, threshold=0.18):
    """Silero (or energy-fallback) SAD over a wav.scp -> kaldi-style vad
    file with `seg_id utt begin end` lines (reference
    local/make_system_sad.py:44-66 writes the same layout; threshold
    0.18 is its documented operating point)."""
    from wespeaker_hubert_tpu.data import read_wav
    from wespeaker_hubert_tpu.diar.sad import system_sad

    vad_model = None
    if vad_npz and os.path.exists(vad_npz):
        from wespeaker_hubert_tpu.diar.silero import SileroVAD

        vad_model = SileroVAD.from_file(vad_npz)
    n = 0
    with open(wav_scp) as f, open(vad_out, "w") as out:
        for line in f:
            parts = line.split()
            if len(parts) < 2:
                continue
            utt, path = parts[0], parts[1]
            wav, sr = read_wav(path)
            if vad_model is not None and sr != 16000:
                # silero runs at 16 kHz only; CTS telephony is 8 kHz
                # (reference make_system_sad.py resamples the same way);
                # timestamps are seconds so they map back directly
                import math

                from scipy.signal import resample_poly

                g = math.gcd(sr, 16000)
                wav = resample_poly(wav, 16000 // g, sr // g).astype(
                    "float32"
                )
                sr = 16000
            segs = system_sad(
                wav, sr, vad_model=vad_model,
                min_duration=min_duration, threshold=threshold,
            )
            for i, (b, e) in enumerate(segs):
                out.write(f"{utt}-{i:04d} {utt} {b:.3f} {e:.3f}\n")
                n += 1
    return n


def utt2voice_duration(vad_file, out_path):
    """Sum per-utt voiced seconds from a vad file (reference
    local/utt2voice_duration.py)."""
    durs = {}
    order = []
    with open(vad_file) as f:
        for line in f:
            parts = line.split()
            utt, b, e = parts[-3], float(parts[-2]), float(parts[-1])
            if utt not in durs:
                durs[utt] = 0.0
                order.append(utt)
            durs[utt] += e - b
    with open(out_path, "w") as f:
        for utt in order:
            f.write(f"{utt} {durs[utt]}\n")
    return durs


def filter_by_voice_dur(wav_scp, utt2dur_path, out_scp, dur_thres=5.0):
    """Keep utts with more than `dur_thres` voiced seconds (reference
    local/filter_utt_accd_dur.py)."""
    durs = {}
    with open(utt2dur_path) as f:
        for line in f:
            u, d = line.split()
            durs[u] = float(d)
    n = 0
    with open(wav_scp) as f, open(out_scp, "w") as out:
        for line in f:
            utt = line.split()[0]
            if durs.get(utt, 0.0) > dur_thres:
                out.write(line)
                n += 1
    return n


def generate_aug_copies(ori_dir, aug_dir, aug_copy_num=2):
    """Replicate wav.scp/utt2spk/vad rows with `_copy-i` suffixes
    (reference local/generate_sre_aug.py) — the copies draw independent
    reverb/noise at extraction time, widening the PLDA training set."""
    os.makedirs(aug_dir, exist_ok=True)
    for name in ("wav.scp", "utt2spk"):
        src = os.path.join(ori_dir, name)
        with open(src) as f, open(os.path.join(aug_dir, name), "w") as out:
            for line in f:
                parts = line.rstrip("\n").split(None, 1)
                if len(parts) < 2:
                    continue
                for i in range(aug_copy_num + 1):
                    out.write(f"{parts[0]}_copy-{i} {parts[1]}\n")
    vad = os.path.join(ori_dir, "vad")
    if os.path.exists(vad):
        with open(vad) as f, open(os.path.join(aug_dir, "vad"), "w") as out:
            for line in f:
                seg, utt, rest = line.rstrip("\n").split(None, 2)
                for i in range(aug_copy_num + 1):
                    out.write(f"{seg}_copy-{i} {utt}_copy-{i} {rest}\n")


def combine_data(out_dir, in_dirs):
    """Concatenate wav.scp / utt2spk / vad of several data dirs
    (the reference's cts_vox = CTS superset + VoxCeleb merge)."""
    os.makedirs(out_dir, exist_ok=True)
    for name in ("wav.scp", "utt2spk", "vad"):
        rows = []
        for d in in_dirs:
            p = os.path.join(d, name)
            if os.path.exists(p):
                rows.extend(open(p).read().splitlines())
        if rows:
            with open(os.path.join(out_dir, name), "w") as f:
                f.write("\n".join(rows) + "\n")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--stage", type=int, default=6)
    p.add_argument("--stop_stage", type=int, default=8)
    p.add_argument("--exp_dir", default="exp/sre_v3")
    p.add_argument("--train_emb", default=None,
                   help="CTS(-aug) backend-training embeddings .npz "
                        "(derived from --config stages 1-5 when omitted)")
    p.add_argument("--train_utt2spk", default=None)
    p.add_argument("--enroll_emb", default=None)
    p.add_argument("--enroll_utt2spk", default=None,
                   help="utt2mdl mapping for multisession enrollment")
    p.add_argument("--test_emb", default=None)
    p.add_argument("--trials", default=None)
    p.add_argument("--indomain_emb", default=None,
                   help="unlabeled in-domain .npz (sre16 major / sre18 unlab)")
    p.add_argument("--lda_dim", type=int, default=100)
    p.add_argument("--chain", default=None,
                   help="override the processing-chain string")
    p.add_argument("--em_iters", type=int, default=5)
    # front half (stages 1-5) — reference run.sh stages 1-5
    p.add_argument("--config", default=None, help="extractor train yaml")
    p.add_argument("--data_root", default="data")
    p.add_argument("--cts_dir", default=None,
                   help="LDC CTS-superset root (docs/ + data/)")
    p.add_argument("--vox_dir", default=None,
                   help="optional VoxCeleb data dir to merge into cts_vox")
    p.add_argument("--vad_npz", default=None,
                   help="converted silero weights; energy VAD fallback")
    p.add_argument("--aug_copies", type=int, default=2)
    p.add_argument("--dur_thres", type=float, default=5.0)
    p.add_argument("--eval_sets", default="sre16_major,sre16_enroll,sre16_test",
                   help="data-root subdirs (wav.scp [+utt2spk]) to extract")
    args = p.parse_args()

    os.makedirs(args.exp_dir, exist_ok=True)

    def in_front(s):
        return args.stage <= s <= args.stop_stage

    config = exp_dir = emb_dir = None
    if args.config:
        from wespeaker_hubert_tpu.utils.config import load_config

        config = load_config(args.config)
        exp_dir = config["exp_dir"]
        emb_dir = os.path.join(exp_dir, "embeddings")

    if in_front(1) and args.cts_dir:
        print("stage 1: CTS-superset prep + system SAD + voice-dur filter")
        cts = os.path.join(args.data_root, "cts")
        prepare_cts(args.cts_dir, cts)
        make_system_sad_file(
            os.path.join(cts, "wav.scp"), os.path.join(cts, "vad"),
            vad_npz=args.vad_npz,
        )
        utt2voice_duration(
            os.path.join(cts, "vad"), os.path.join(cts, "utt2voice_dur")
        )
        # prune short utts (reference run.sh filter_utt_accd_dur 5 s),
        # rewriting wav.scp in place like local/prepare_data.sh
        filtered = os.path.join(cts, "wav.scp.filtered")
        filter_by_voice_dur(
            os.path.join(cts, "wav.scp"),
            os.path.join(cts, "utt2voice_dur"), filtered,
            dur_thres=args.dur_thres,
        )
        os.replace(filtered, os.path.join(cts, "wav.scp"))
        # extractor training set: CTS (+ VoxCeleb when provided)
        merge = [cts] + ([args.vox_dir] if args.vox_dir else [])
        combine_data(os.path.join(args.data_root, "cts_vox"), merge)
        # PLDA backend set: augmented copies
        generate_aug_copies(
            cts, os.path.join(args.data_root, "cts_aug"),
            aug_copy_num=args.aug_copies,
        )

    if in_front(2):
        print("stage 2: shard/raw lists (VAD-cropped) + aug stores")
        from wespeaker_hubert_tpu.bin.tools import (
            build_aug_store,
            make_raw_list,
            make_shard_list,
        )

        def vad_of(d):
            v = os.path.join(d, "vad")
            return v if os.path.exists(v) else None

        cv = os.path.join(args.data_root, "cts_vox")
        if os.path.exists(os.path.join(cv, "wav.scp")):
            if config and config.get("data_type", "raw") == "shard":
                make_shard_list(
                    os.path.join(cv, "wav.scp"), os.path.join(cv, "utt2spk"),
                    os.path.join(cv, "shards"), os.path.join(cv, "shard.list"),
                    vad_file=vad_of(cv),
                )
            make_raw_list(
                os.path.join(cv, "wav.scp"), os.path.join(cv, "utt2spk"),
                os.path.join(cv, "raw.list"), vad_of(cv),
            )
        for dset in ["cts_aug"] + [
            s for s in args.eval_sets.split(",") if s.strip()
        ]:
            dd = os.path.join(args.data_root, dset)
            if not os.path.exists(os.path.join(dd, "wav.scp")):
                continue
            u2s = os.path.join(dd, "utt2spk")
            if not os.path.exists(u2s):
                # unlabeled sets: dummy identity map (run.sh stage 2)
                with open(os.path.join(dd, "wav.scp")) as ws, \
                        open(u2s, "w") as f:
                    for ln in ws:
                        f.write(f"{ln.split()[0]} unk\n")
            make_raw_list(
                os.path.join(dd, "wav.scp"), u2s,
                os.path.join(dd, "raw.list"), vad_of(dd),
            )
        for x in ("musan", "rirs"):
            scp = os.path.join(args.data_root, x, "wav.scp")
            store = os.path.join(args.data_root, f"{x}_aug_store")
            if os.path.exists(scp) and not os.path.exists(store):
                build_aug_store(scp, store)

    if in_front(3) and config:
        print("stage 3: train extractor on cts_vox")
        from wespeaker_hubert_tpu.bin.train import train

        train(config)

    if in_front(4) and config:
        print("stage 4: average + extract embeddings per set")
        from wespeaker_hubert_tpu.bin.average_model import average_model
        from wespeaker_hubert_tpu.bin.extract import extract

        avg_ckpt = os.path.join(exp_dir, "avg_model.ckpt")
        average_model(
            os.path.join(exp_dir, "models"), avg_ckpt,
            num=config.get("num_avg", 10),
        )
        for dset in ["cts_aug"] + [
            s for s in args.eval_sets.split(",") if s.strip()
        ]:
            lst = os.path.join(args.data_root, dset, "raw.list")
            if os.path.exists(lst):
                extract(config, lst, avg_ckpt,
                        os.path.join(emb_dir, f"{dset}.npz"))

    if in_front(5) and config:
        print("stage 5: export the final model")
        from wespeaker_hubert_tpu.bin.export_model import export_model

        export_model(
            exp_dir, os.path.join(exp_dir, "export"),
            checkpoint=os.path.join(exp_dir, "avg_model.ckpt"),
        )

    if args.stop_stage < 6:
        return
    # default the backend inputs from the front half's outputs
    if emb_dir and not args.train_emb:
        args.train_emb = os.path.join(emb_dir, "cts_aug.npz")
        args.train_utt2spk = args.train_utt2spk or os.path.join(
            args.data_root, "cts_aug", "utt2spk"
        )
    if args.train_emb is None or args.enroll_emb is None:
        if args.stage >= 6:
            p.error("stages 6-8 need --train_emb/--enroll_emb/--test_emb "
                    "(or --config with extracted embeddings)")
        return
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
