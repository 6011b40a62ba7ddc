"""Data-preparation tools.

Equivalents of the reference's tools/ (reference: tools/make_raw_list.py,
tools/make_shard_list.py (tar shards, multiprocess), tools/vector_mean.py
(speaker-level means for the AS-Norm cohort), tools/wav2dur.py (durations
for QMF)) plus an AugStore builder replacing tools/make_lmdb.py.
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import tarfile
import wave
from typing import Dict, List, Optional

import numpy as np

__all__ = [
    "make_raw_list",
    "make_feat_list",
    "make_shard_list",
    "compute_feats",
    "vector_mean",
    "wav2dur",
    "generate_calibration_trial",
    "build_aug_store",
]


def _read_table(path: str) -> List[List[str]]:
    with open(path) as f:
        return [line.split() for line in f if line.strip()]


def make_raw_list(
    wav_scp: str, utt2spk: str, out_list: str,
    vad_file: Optional[str] = None,
) -> int:
    """wav.scp + utt2spk (+ optional vad segments) -> JSONL raw list
    (reference tools/make_raw_list.py)."""
    utt2wav = {u: w for u, w in (r[:2] for r in _read_table(wav_scp))}
    utt2spk_map = {u: s for u, s in (r[:2] for r in _read_table(utt2spk))}
    vad: Dict[str, list] = {}
    if vad_file:
        for row in _read_table(vad_file):
            # seg_id utt begin end
            vad.setdefault(row[1], []).append((row[2], row[3]))
    n = 0
    with open(out_list, "w") as f:
        for utt, wav in utt2wav.items():
            if utt not in utt2spk_map:
                continue
            obj = {"key": utt, "wav": wav, "spk": utt2spk_map[utt]}
            if utt in vad:
                obj["vad"] = vad[utt]
            f.write(json.dumps(obj) + "\n")
            n += 1
    return n


def make_feat_list(feat_scp: str, utt2spk: str, out_list: str) -> int:
    """feat.scp (utt -> kaldi matrix-ark rxspecifier 'file.ark:offset')
    + utt2spk -> JSONL feat list {key, feat, spk} for data_type=feat
    (reference tools/make_feat_list.py)."""
    utt2feat = {u: p for u, p in (r[:2] for r in _read_table(feat_scp))}
    utt2spk_map = {u: s for u, s in (r[:2] for r in _read_table(utt2spk))}
    n = 0
    with open(out_list, "w") as f:
        for utt, feat in utt2feat.items():
            if utt not in utt2spk_map:
                continue
            f.write(json.dumps(
                {"key": utt, "feat": feat, "spk": utt2spk_map[utt]}
            ) + "\n")
            n += 1
    return n


def compute_feats(
    wav_scp: str,
    ark_path: str,
    scp_path: str,
    num_mel_bins: int = 80,
    frame_shift: int = 10,
    frame_length: int = 25,
) -> int:
    """Offline fbank extraction: wav.scp -> kaldi matrix ark + scp
    (the role kaldi's compute-fbank-feats plays upstream of the
    reference's feat recipes).  Runs the same in-graph fbank as
    training (ops/fbank.py), dither off, one utterance at a time with
    pow2 length bucketing to bound XLA compiles."""
    import jax.numpy as jnp

    from ..backend.kaldi_io import write_kaldi_matrices
    from ..ops.fbank import FbankConfig, fbank
    from ..data.wav_io import read_wav

    cfg = FbankConfig(
        num_mel_bins=num_mel_bins,
        frame_shift_ms=frame_shift,
        frame_length_ms=frame_length,
        dither=0.0,
    )
    import jax

    @jax.jit
    def _fb(wav, length):
        feats, feat_lengths = fbank(wav[None], cfg, lengths=length[None])
        return feats[0], feat_lengths[0]

    names, mats = [], []
    for utt, path in (r[:2] for r in _read_table(wav_scp)):
        wav, _sr = read_wav(path)
        n = len(wav)
        pow2 = 1 << max(0, (n - 1)).bit_length()  # pad to pow2 buckets
        buf = np.zeros((max(pow2, 512),), np.float32)
        buf[:n] = wav
        feats, t = _fb(jnp.asarray(buf), jnp.asarray(n, jnp.int32))
        names.append(utt)
        mats.append(np.asarray(feats)[: int(t)])
    write_kaldi_matrices(ark_path, names, mats, scp_path)
    return len(names)


def _write_shard(args) -> str:
    import io

    shard_path, items, compress = args
    if compress == "zstd":
        # write the plain tar, then stream-compress (py tarfile has no
        # zstd mode; the native loader + zstd_io reader consume it)
        plain = shard_path + ".plain.tmp"
        _write_shard((plain, items, None))
        from ..data.zstd_io import compress_file

        try:
            compress_file(plain, shard_path)
        finally:
            os.unlink(plain)
        return shard_path
    mode = "w:gz" if compress == "gz" else "w"
    with tarfile.open(shard_path, mode) as tf:
        for utt, wav_path, spk, vad in items:
            if vad:
                # VAD-cropped packing (reference make_shard_list.py
                # --vad_file): keep only the speech segments
                from ..data.wav_io import read_wav

                wav, sr = read_wav(wav_path)
                parts = [
                    wav[int(float(b) * sr):int(float(e) * sr)]
                    for b, e in vad
                ]
                cropped = np.concatenate([p for p in parts if len(p)])
                pcm = np.clip(
                    cropped * 32768.0, -32768, 32767
                ).astype("<i2")
                buf = io.BytesIO()
                with wave.open(buf, "wb") as w:
                    w.setnchannels(1)
                    w.setsampwidth(2)
                    w.setframerate(sr)
                    w.writeframes(pcm.tobytes())
                data = buf.getvalue()
                info = tarfile.TarInfo(f"{utt}.wav")
                info.size = len(data)
                tf.addfile(info, io.BytesIO(data))
            else:
                tf.add(wav_path, arcname=f"{utt}.wav")
            spk_bytes = spk.encode()
            info = tarfile.TarInfo(f"{utt}.spk")
            info.size = len(spk_bytes)
            tf.addfile(info, io.BytesIO(spk_bytes))
    return shard_path


def make_shard_list(
    wav_scp: str,
    utt2spk: str,
    shards_dir: str,
    out_list: str,
    num_utts_per_shard: int = 1000,
    num_workers: int = 4,
    shuffle: bool = True,
    seed: int = 42,
    vad_file: Optional[str] = None,
    compress: Optional[str] = None,
) -> List[str]:
    """Pack utterances into webdataset-style tar shards
    (reference tools/make_shard_list.py; `vad_file` crops each
    utterance to its speech segments while packing, --vad_file role).
    `compress`: None (plain tar), 'gz', or 'zstd' — all three stream
    through the native C++ loader and the python pipeline."""
    if compress not in (None, "gz", "zstd"):
        raise ValueError(f"compress must be None/'gz'/'zstd', got {compress!r}")
    if compress == "zstd":
        from ..data.zstd_io import zstd_available

        if not zstd_available():
            raise OSError("compress='zstd' requires libzstd on this host")
    os.makedirs(shards_dir, exist_ok=True)
    utt2wav = {u: w for u, w in (r[:2] for r in _read_table(wav_scp))}
    utt2spk_map = {u: s for u, s in (r[:2] for r in _read_table(utt2spk))}
    vad: Dict[str, list] = {}
    if vad_file:
        for row in _read_table(vad_file):
            # seg_id utt begin end
            vad.setdefault(row[1], []).append((row[2], row[3]))
    items = [
        (u, utt2wav[u], utt2spk_map[u], vad.get(u))
        for u in utt2wav
        if u in utt2spk_map
    ]
    if shuffle:
        rng = np.random.default_rng(seed)
        rng.shuffle(items)
    chunks = [
        items[i : i + num_utts_per_shard]
        for i in range(0, len(items), num_utts_per_shard)
    ]
    suffix = {None: ".tar", "gz": ".tar.gz", "zstd": ".tar.zst"}[compress]
    tasks = [
        (os.path.join(shards_dir, f"shard_{i:06d}{suffix}"), chunk, compress)
        for i, chunk in enumerate(chunks)
    ]
    if num_workers > 1 and len(tasks) > 1:
        with mp.Pool(num_workers) as pool:
            paths = pool.map(_write_shard, tasks)
    else:
        paths = [_write_shard(t) for t in tasks]
    with open(out_list, "w") as f:
        for p in paths:
            f.write(p + "\n")
    return paths


def vector_mean(emb_path: str, utt2spk: str, out_path: str) -> int:
    """Per-speaker mean embeddings -> npz set (reference
    tools/vector_mean.py; feeds the AS-Norm cohort)."""
    from ..utils.embeddings import load_embeddings, save_embeddings, speaker_means

    keys, emb = load_embeddings(emb_path)
    utt2spk_map = {u: s for u, s in (r[:2] for r in _read_table(utt2spk))}
    spks, means = speaker_means(keys, emb, utt2spk_map)
    save_embeddings(out_path, spks, means)
    return len(spks)


def wav2dur(wav_scp: str, out_path: str) -> Dict[str, float]:
    """utt -> duration seconds (reference tools/wav2dur.py; QMF factor)."""
    out = {}
    with open(out_path, "w") as f:
        for utt, path in (r[:2] for r in _read_table(wav_scp)):
            with wave.open(path, "rb") as w:
                dur = w.getnframes() / w.getframerate()
            out[utt] = dur
            f.write(f"{utt} {dur:.3f}\n")
    return out


def generate_calibration_trial(
    utt2dur: str,
    utt2spk: str,
    trial_path: str,
    each_trial_num: int = 10000,
    seed: int = 42,
) -> int:
    """QMF calibration trials from the TRAINING set (reference
    tools/generate_calibration_trial.py): short (2-6 s) and long (>6 s)
    utterance pools per speaker; each round emits short2short,
    short2long and long2long target/nontarget pairs.  Training the
    calibration on these — never on the evaluation trials — is what
    keeps QMF leakage-free.

    Deviations: speaker identity comes from `utt2spk` (the reference
    parses it from the utterance path); when a duration band has
    fewer than two speakers (tiny corpora) both bands fall back to the
    full utterance pool so a trial list always materializes; and
    same-pool target pairs exclude enroll==test whenever the pool has
    >= 2 utterances (the reference's random.choices(k=2) samples WITH
    replacement, so it emits self-trials whose cosine-1.0 scores skew
    the target distribution the calibrator fits)."""
    import random as _random

    durs = {u: float(d) for u, d in (r[:2] for r in _read_table(utt2dur))}
    spk_of = {u: s for u, s in (r[:2] for r in _read_table(utt2spk))}
    short: Dict[str, List[str]] = {}
    long_: Dict[str, List[str]] = {}
    for u, d in durs.items():
        s = spk_of.get(u)
        if s is None:
            continue
        if 2.0 < d < 6.0:
            short.setdefault(s, []).append(u)
        if d > 6.0:
            long_.setdefault(s, []).append(u)
    # keep only speakers present in BOTH bands (reference :45-55)
    common = sorted(set(short) & set(long_))
    if len(common) >= 2:
        short = {s: short[s] for s in common}
        long_ = {s: long_[s] for s in common}
    else:  # tiny/synthetic corpora: single pool in both roles
        pool: Dict[str, List[str]] = {}
        for u, s in spk_of.items():
            if u in durs:
                pool.setdefault(s, []).append(u)
        pool = {s: us for s, us in pool.items() if us}
        if len(pool) < 2:
            raise ValueError("need >= 2 speakers for calibration trials")
        short = long_ = pool
    spks = sorted(short)
    rng = _random.Random(seed)

    def pick(pool, exclude=None):
        if exclude is not None and len(pool) > 1:
            c = rng.choice(pool)
            while c == exclude:
                c = rng.choice(pool)
            return c
        return rng.choice(pool)

    n = 0
    with open(trial_path, "w") as f:
        for _ in range(max(1, each_trial_num // 2)):
            enroll_spk = rng.choice(spks)
            others = [s for s in spks if s != enroll_spk]
            nontarget_spk = rng.choice(others)
            for e_pool, t_pool in (
                (short, short),
                (short, long_),
                (long_, long_),
            ):
                enroll_utt = pick(e_pool[enroll_spk])
                test_utt = pick(t_pool[enroll_spk], exclude=enroll_utt)
                f.write(f"{enroll_utt} {test_utt} target\n")
                test_utt = pick(t_pool[nontarget_spk])
                f.write(f"{enroll_utt} {test_utt} nontarget\n")
                n += 2
    return n


def build_aug_store(wav_scp: str, out_dir: str):
    """MUSAN/RIR wav.scp -> AugStore directory (replaces tools/make_lmdb.py;
    keys keep their noise/speech/music prefixes for SNR banding)."""
    from ..data.aug_store import AugStore

    items = [(u, p) for u, p in (r[:2] for r in _read_table(wav_scp))]
    return AugStore.build_from_wavs(out_dir, items)


def main():
    import argparse

    p = argparse.ArgumentParser()
    sub = p.add_subparsers(dest="cmd", required=True)

    s = sub.add_parser("make_raw_list")
    s.add_argument("wav_scp")
    s.add_argument("utt2spk")
    s.add_argument("out_list")
    s.add_argument("--vad", default=None)

    s = sub.add_parser("make_shard_list")
    s.add_argument("wav_scp")
    s.add_argument("utt2spk")
    s.add_argument("shards_dir")
    s.add_argument("out_list")
    s.add_argument("--num_utts_per_shard", type=int, default=1000)
    s.add_argument("--num_workers", type=int, default=4)
    s.add_argument("--vad_file", default=None)
    s.add_argument("--compress", default=None, choices=["gz", "zstd"])

    s = sub.add_parser("vector_mean")
    s.add_argument("emb_path")
    s.add_argument("utt2spk")
    s.add_argument("out_path")

    s = sub.add_parser("wav2dur")
    s.add_argument("wav_scp")
    s.add_argument("out_path")

    s = sub.add_parser("make_feat_list")
    s.add_argument("feat_scp")
    s.add_argument("utt2spk")
    s.add_argument("out_list")

    s = sub.add_parser("compute_feats")
    s.add_argument("wav_scp")
    s.add_argument("ark_path")
    s.add_argument("scp_path")
    s.add_argument("--num_mel_bins", type=int, default=80)
    s.add_argument("--frame_shift", type=int, default=10)
    s.add_argument("--frame_length", type=int, default=25)

    s = sub.add_parser("generate_calibration_trial")
    s.add_argument("utt2dur")
    s.add_argument("utt2spk")
    s.add_argument("trial_path")
    s.add_argument("--each_trial_num", type=int, default=10000)
    s.add_argument("--seed", type=int, default=42)

    s = sub.add_parser("build_aug_store")
    s.add_argument("wav_scp")
    s.add_argument("out_dir")

    args = p.parse_args()
    if args.cmd == "make_raw_list":
        print(make_raw_list(args.wav_scp, args.utt2spk, args.out_list, args.vad))
    elif args.cmd == "make_shard_list":
        print(len(make_shard_list(args.wav_scp, args.utt2spk, args.shards_dir,
                                  args.out_list, args.num_utts_per_shard,
                                  args.num_workers,
                                  vad_file=args.vad_file,
                                  compress=args.compress)))
    elif args.cmd == "vector_mean":
        print(vector_mean(args.emb_path, args.utt2spk, args.out_path))
    elif args.cmd == "wav2dur":
        print(len(wav2dur(args.wav_scp, args.out_path)))
    elif args.cmd == "make_feat_list":
        print(make_feat_list(args.feat_scp, args.utt2spk, args.out_list))
    elif args.cmd == "compute_feats":
        print(compute_feats(
            args.wav_scp, args.ark_path, args.scp_path,
            args.num_mel_bins, args.frame_shift, args.frame_length,
        ))
    elif args.cmd == "generate_calibration_trial":
        print(generate_calibration_trial(
            args.utt2dur, args.utt2spk, args.trial_path,
            args.each_trial_num, args.seed))
    elif args.cmd == "build_aug_store":
        store = build_aug_store(args.wav_scp, args.out_dir)
        print(len(store))


if __name__ == "__main__":
    main()
