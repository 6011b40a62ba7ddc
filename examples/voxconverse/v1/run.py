#!/usr/bin/env python
"""VoxConverse v1 diarization driver (reference
examples/voxconverse/v1/run.sh — the original compact 6-stage pipeline:
SAD [oracle from ground-truth RTTM / silero system] -> one-shot
clusterer over the SAD segments [diar/clusterer.py role: windowed
embeddings + spectral clustering in one pass] -> labels -> RTTM -> DER).

v2 (run.py next door) is the staged successor with per-stage artifacts,
umap clustering and the subseg_cmn knob; v1 keeps the original surface:
dev partition, spectral clustering, oracle|system SAD.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "../../.."))

from wespeaker_hubert_tpu.cli.speaker import load_model
from wespeaker_hubert_tpu.data import read_wav
from wespeaker_hubert_tpu.diar import (
    der_details,
    oracle_sad,
    read_rttm,
    write_rttm,
)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model_dir", required=True)
    p.add_argument("--wav_scp", required=True, help="utt wav-path per line")
    p.add_argument("--sad_type", choices=["oracle", "system"],
                   default="oracle")
    p.add_argument("--ref_rttm_dir", default=None,
                   help="per-utt ground-truth <utt>.rttm dir (oracle SAD "
                        "+ DER scoring)")
    p.add_argument("--min_duration", type=float, default=0.255)
    p.add_argument("--out_rttm", default="exp/diar_v1/hyp.rttm")
    p.add_argument("--collar", type=float, default=0.25)
    args = p.parse_args()

    model = load_model(args.model_dir)
    if args.sad_type == "system":
        # silero weights from the model dir's vad.npz when present
        # (energy VAD otherwise — Speaker.set_vad fallback policy)
        model.set_vad(True)
    os.makedirs(os.path.dirname(args.out_rttm) or ".", exist_ok=True)

    entries = []
    with open(args.wav_scp) as f:
        for line in f:
            parts = line.split()
            if len(parts) >= 2:
                entries.append((parts[0], parts[1]))

    # stage 3 (SAD) + stage 4 (clusterer) + stage 5 (labels->RTTM):
    # oracle SAD comes from the ground-truth RTTM (make_oracle_sad.py
    # semantics); system SAD is the model's VAD inside diarize()
    all_segments = []
    for utt, path in entries:
        if args.sad_type == "oracle":
            assert args.ref_rttm_dir, "--ref_rttm_dir needed for oracle SAD"
            ref = read_rttm(os.path.join(args.ref_rttm_dir, f"{utt}.rttm"))
            sad = oracle_sad(
                {utt: ref.get(utt, [])}, min_duration=args.min_duration
            ).get(utt, [])
            wav, sr = read_wav(path)
            # diarize the oracle speech regions: concatenate-free — feed
            # the known segments through the pcm path with VAD overridden
            segs = model.diarize_segments(
                wav, sad, utt=utt, clusterer="spectral"
            )
        else:
            segs = model.diarize(path, utt=utt, clusterer="spectral")
        all_segments += [(u, b, e, f"spk{lab}") for (u, b, e, lab) in segs]
        print(f"{utt}: {len(segs)} segments")
    write_rttm(args.out_rttm, all_segments)
    print(f"hypothesis RTTM -> {args.out_rttm}")

    # stage 6: DER (in-framework md-eval role, collar 0.25)
    if args.ref_rttm_dir:
        ref = {}
        for utt, _ in entries:
            ref.update(read_rttm(
                os.path.join(args.ref_rttm_dir, f"{utt}.rttm")
            ))
        d = der_details(ref, read_rttm(args.out_rttm), collar=args.collar)
        if d["total"] > 0:
            print("DER {:.2f}% (miss {:.2f}% fa {:.2f}% conf {:.2f}%)".format(
                100 * d["der"], 100 * d["miss"] / d["total"],
                100 * d["fa"] / d["total"], 100 * d["confusion"] / d["total"],
            ))


if __name__ == "__main__":
    main()
