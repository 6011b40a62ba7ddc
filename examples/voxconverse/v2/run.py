#!/usr/bin/env python
"""VoxConverse diarization recipe driver (reference
examples/voxconverse/v2/run.sh: SAD -> fbank -> sliding-window embeddings
-> clustering -> RTTM -> DER).  Uses a trained speaker model dir (Speaker
API) and the in-framework DER metric (no external md-eval.pl)."""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "../../.."))

from wespeaker_hubert_tpu.cli.speaker import load_model
from wespeaker_hubert_tpu.diar import der_details, read_rttm, write_rttm


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model_dir", required=True)
    p.add_argument("--wav_scp", required=True, help="utt wav-path per line")
    p.add_argument("--ref_rttm", default=None)
    p.add_argument("--out_rttm", default="exp/diar/hyp.rttm")
    p.add_argument("--clusterer", choices=["spectral", "density"],
                   default="spectral")
    p.add_argument("--collar", type=float, default=0.25)
    p.add_argument("--window_secs", type=float, default=1.5,
                   help="subsegment window (reference run.sh stage 5)")
    p.add_argument("--period_secs", type=float, default=0.75,
                   help="subsegment shift")
    p.add_argument("--subseg_cmn", default=True,
                   type=lambda x: x.lower() == "true",
                   help="true: CMN per window (reference default); false: "
                        "CMN once per VAD segment (make_fbank.py)")
    args = p.parse_args()

    model = load_model(args.model_dir)
    model.set_diarization_params(
        args.window_secs, args.period_secs, subseg_cmn=args.subseg_cmn
    )
    os.makedirs(os.path.dirname(args.out_rttm) or ".", exist_ok=True)

    all_segments = []
    with open(args.wav_scp) as f:
        for line in f:
            utt, path = line.split()[:2]
            segs = model.diarize(path, utt=utt, clusterer=args.clusterer)
            all_segments += [
                (u, b, e, f"spk{lab}") for (u, b, e, lab) in segs
            ]
            print(f"{utt}: {len(segs)} segments")
    write_rttm(args.out_rttm, all_segments)
    print(f"hypothesis RTTM -> {args.out_rttm}")

    if args.ref_rttm:
        ref = read_rttm(args.ref_rttm)
        hyp = read_rttm(args.out_rttm)
        d = der_details(ref, hyp, collar=args.collar)
        if d["total"] > 0:
            print(
                "DER {:.2f}% (miss {:.2f}% fa {:.2f}% conf {:.2f}%)".format(
                    100 * d["der"],
                    100 * d["miss"] / d["total"],
                    100 * d["fa"] / d["total"],
                    100 * d["confusion"] / d["total"],
                )
            )
        else:
            print("DER undefined: reference has no scored speech "
                  f"(fa {d['fa']:.2f}s)")


if __name__ == "__main__":
    main()
