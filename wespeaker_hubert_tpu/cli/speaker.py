"""User-facing Speaker API + CLI.

Reference: wespeaker/cli/speaker.py — Speaker:38 (extract_embedding:123
with optional VAD, compute_similarity:181 with [-1,1]->[0,1] normalized
cosine :189-192, register/recognize:194-212 in-memory enrollment,
diarize:214 full VAD->subseg->embed->cluster->merge pipeline,
extract_embedding_list:170), load_model:300 / load_model_pt:306, CLI
main:325 with tasks embedding / embedding_kaldi / similarity /
diarization / diarization_list (cli/utils.py:19).

Model loading is from a local model directory (config.yaml +
avg_model.ckpt as produced by bin/train + bin/average_model) or a hub
alias resolved offline by cli/hub.py ('chinese', 'english', ... — the
reference's modelscope aliases), including automatic conversion of a
published torch avg_model.pt bundle.
"""

from __future__ import annotations

import logging
import os
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..data import read_wav
from ..diar import (
    density_cluster,
    energy_vad,
    make_seg_id,
    merge_segments,
    spectral_cluster,
    subsegment_fbank,
    write_rttm,
)
from ..ops.fbank import FbankConfig, fbank
from ..ops.feature_utils import apply_cmvn
from ..train import make_eval_embed
from ..utils.checkpoint import load_partial
from ..utils.config import load_config
from ..bin.train import build_speaker_net
from ..ops.pipeline import FeaturePipelineConfig

__all__ = ["Speaker", "load_model"]



def _pow2_bucket(n: int, floor: int = 1 << 14) -> int:
    """Smallest power-of-two >= n with a floor (~1 s at 16 kHz): padded
    XLA shapes stay few while mask-aware ops keep results exact."""
    return max(floor, 1 << (max(n, 2) - 1).bit_length())


# largest flat sample pool one device upload may carry: gather indices
# are int32 on device, and _pow2_bucket(2^30) == 2^30 still fits
_FLAT_SAMPLE_LIMIT = 1 << 30


class Speaker:
    def __init__(self, model_dir: str):
        config = load_config(os.path.join(model_dir, "config.yaml"))
        ckpt = None
        for cand in ("avg_model.ckpt", "final_model.ckpt"):
            p = os.path.join(model_dir, cand)
            if os.path.exists(p):
                ckpt = p
                break
        if ckpt is None:
            # newest epoch checkpoint
            from ..utils.checkpoint import latest_checkpoint

            ckpt = latest_checkpoint(os.path.join(model_dir, "models"))
        assert ckpt, f"no checkpoint found under {model_dir}"

        self.config = config
        fb = config.get("dataset_args", {}).get("fbank_args", {})
        self.fbank_cfg = FbankConfig(
            num_mel_bins=fb.get("num_mel_bins", 80),
            frame_shift_ms=fb.get("frame_shift", 10),
            frame_length_ms=fb.get("frame_length", 25),
            dither=0.0,
        )
        self.resample_rate = config.get("dataset_args", {}).get(
            "resample_rate", 16000
        )
        self.apply_vad = False
        self.vad_model = None
        self.model_dir = model_dir
        self.net = build_speaker_net(config, num_class=2)
        feat_dim = self.fbank_cfg.num_mel_bins
        variables = self.net.init(
            jax.random.key(0),
            jnp.zeros((1, 100, feat_dim)),
            jnp.zeros((1,), jnp.int32),
            0.0,
            train=False,
        )
        target = {
            "params": variables["params"],
            "batch_stats": variables.get("batch_stats", {}),
        }
        restored, _, _ = load_partial(ckpt, target)
        self.variables = {
            "params": restored["params"],
            "batch_stats": restored["batch_stats"],
        }
        self._embed_fn = make_eval_embed(
            self.net,
            feature_cfg=FeaturePipelineConfig(
                fbank=self.fbank_cfg, spec_aug=False
            ),
        )
        # jitted window-features -> embedding path for diarization (an
        # unjitted net.apply executes op-by-op — catastrophic over a
        # remote-device link)
        self._embed_feats_fn = jax.jit(
            lambda v, f, cmn: self.net.apply(
                v, apply_cmvn(f) if cmn else f,
                train=False, method=self.net.embed,
            ),
            static_argnums=2,
        )
        self.table: Dict[str, np.ndarray] = {}
        # diarization params (reference cli defaults)
        self.diar_window_secs = 1.5
        self.diar_period_secs = 0.75
        # True: CMN per 1.5 s window (reference diar/extract_emb.py:88-90,
        # the make_fbank.py --subseg-cmn default); False: CMN once per VAD
        # segment before windowing (make_fbank.py:85-86)
        self.diar_subseg_cmn = True
        # spectral-clustering implementation: 'host' (reference-exact
        # numpy/scipy), 'device', or 'auto' (see diar/spectral.cluster —
        # 'auto' only moves fixed-num_spks recordings onto the device)
        self.diar_cluster_impl = "auto"

    # ------------------------------------------------------------ basics
    def set_vad(self, enable: bool, model_path: str = None):
        """Enable VAD.  model_path: converted silero weights (.npz, see
        diar/silero.py); the model dir's vad.npz is picked up automatically.
        Without weights the energy VAD is used (reference cli loads silero
        from torch.hub, cli/speaker.py:129-153)."""
        self.apply_vad = enable
        if model_path is None:
            cand = os.path.join(self.model_dir, "vad.npz")
            model_path = cand if os.path.exists(cand) else None
        if enable and model_path:
            from ..diar.silero import SileroVAD

            self.vad_model = SileroVAD.from_file(model_path)

    def _vad_segments(self, wav: np.ndarray):
        """(begin_s, end_s) speech segments with the configured VAD."""
        if self.vad_model is not None:
            from ..diar.silero import SR as VAD_SR, get_speech_timestamps

            vad_wav = wav
            if self.resample_rate != VAD_SR:
                # silero runs at 16 kHz regardless of the model's target
                # rate (reference resamples to a dedicated
                # vad_sample_rate, cli/speaker.py:132-141); timestamps
                # are seconds, so they map back directly
                import math

                from scipy.signal import resample_poly

                g = math.gcd(self.resample_rate, VAD_SR)
                vad_wav = resample_poly(
                    wav, VAD_SR // g, self.resample_rate // g
                ).astype(np.float32)
            ts = get_speech_timestamps(vad_wav, self.vad_model)
            return [(t["start"] / VAD_SR, t["end"] / VAD_SR) for t in ts]
        return energy_vad(wav, self.resample_rate)

    def _replace_fbank(self, **kwargs):
        """Swap FbankConfig fields and rebuild the jitted pipeline."""
        import dataclasses

        self.fbank_cfg = dataclasses.replace(self.fbank_cfg, **kwargs)
        self._embed_fn = make_eval_embed(
            self.net,
            feature_cfg=FeaturePipelineConfig(
                fbank=self.fbank_cfg, spec_aug=False
            ),
        )

    def set_resample_rate(self, resample_rate: int):
        """Target sample rate: input audio at other rates is resampled
        to it and fbank runs at it (reference cli/speaker.py:65,155-160
        — torchaudio Resample + sample_frequency=resample_rate)."""
        self.resample_rate = resample_rate
        self._replace_fbank(sample_rate=resample_rate)

    def set_window_type(self, window_type: str):
        """Fbank window (reference :62); rebuilds the feature pipeline."""
        self._replace_fbank(window_type=window_type)

    def set_wavform_norm(self, wavform_norm: bool):
        """Scale-to-int16 off means operate on [-1, 1] floats directly
        (reference :59 — campplus/eres2net models are trained that way)."""
        self._replace_fbank(scale_to_int16=not wavform_norm)

    def set_diarization_params(
        self,
        window_secs: float = 1.5,
        period_secs: float = 0.75,
        subseg_cmn: bool = True,
        cluster_impl: str = "auto",
    ):
        """Sliding-window subsegmentation parameters (reference :75) and
        CMN placement (reference diar/make_fbank.py --subseg-cmn: True
        normalizes per window, False once per VAD segment).
        cluster_impl forces the spectral-clustering path: 'host' is the
        reference-exact numpy/scipy pipeline, 'device' runs the cosine/
        Laplacian/eigh stack on the accelerator, 'auto' picks the device
        only when the speaker count is fixed (diar/spectral.cluster)."""
        if cluster_impl not in ("auto", "host", "device"):
            raise ValueError(
                f"cluster_impl must be auto|host|device, got {cluster_impl!r}"
            )
        self.diar_window_secs = window_secs
        self.diar_period_secs = period_secs
        self.diar_subseg_cmn = subseg_cmn
        self.diar_cluster_impl = cluster_impl

    def _load_audio(self, audio_path: str) -> np.ndarray:
        wav, sr = read_wav(audio_path)
        if sr != self.resample_rate:
            # reference resamples mismatched inputs to the target rate
            # (cli/speaker.py:155-157, torchaudio.transforms.Resample);
            # polyphase host-side resample is its numpy equivalent
            import math

            from scipy.signal import resample_poly

            g = math.gcd(sr, self.resample_rate)
            wav = resample_poly(
                wav, self.resample_rate // g, sr // g
            ).astype(np.float32)
        return wav

    def extract_embedding_from_pcm(self, wav: np.ndarray) -> np.ndarray:
        if self.apply_vad:
            segs = self._vad_segments(wav)
            if segs:
                wav = np.concatenate(
                    [
                        wav[int(b * self.resample_rate) : int(e * self.resample_rate)]
                        for b, e in segs
                    ]
                )
        # pad to a power-of-two bucket: mask-aware pooling makes the
        # embedding identical to the exact-length forward, and the CLI
        # compiles a handful of XLA shapes instead of one per file length
        n = len(wav)
        bucket = _pow2_bucket(n)
        padded = np.zeros(bucket, np.float32)
        padded[:n] = wav
        emb = self._embed_fn(
            self.variables,
            {
                "wav": jnp.asarray(padded[None]),
                "length": jnp.asarray([n]),
            },
        )
        return np.asarray(emb[0])

    def extract_embedding(self, audio_path: str) -> np.ndarray:
        return self.extract_embedding_from_pcm(self._load_audio(audio_path))

    def extract_embedding_list(self, scp_path: str):
        """wav.scp (utt path per line) -> (names, embeddings)
        (reference :170-180)."""
        names, embs = [], []
        with open(scp_path) as f:
            for line in f:
                parts = line.split()
                if len(parts) < 2:
                    continue
                names.append(parts[0])
                embs.append(self.extract_embedding(parts[1]))
        return names, embs

    # ------------------------------------------------------- verification
    def compute_similarity(self, audio_path1: str, audio_path2: str) -> float:
        e1 = self.extract_embedding(audio_path1)
        e2 = self.extract_embedding(audio_path2)
        return self.cosine_similarity(e1, e2)

    @staticmethod
    def cosine_similarity(e1: np.ndarray, e2: np.ndarray) -> float:
        """Cosine mapped from [-1,1] to [0,1] (reference :189-192)."""
        s = float(
            np.dot(e1, e2) / (np.linalg.norm(e1) * np.linalg.norm(e2))
        )
        return (s + 1.0) / 2.0

    def register(self, name: str, audio_path: str):
        assert name not in self.table, f"speaker {name} already registered"
        self.table[name] = self.extract_embedding(audio_path)

    def recognize(self, audio_path: str):
        q = self.extract_embedding(audio_path)
        best_name, best_score = "", 0.0
        for name, e in self.table.items():
            score = self.cosine_similarity(q, e)
            if score > best_score:
                best_name, best_score = name, score
        return {"name": best_name, "confidence": best_score}

    # ------------------------------------------------------- diarization
    def diarize(
        self,
        audio_path: str,
        utt: str = "unk",
        clusterer: str = "density",
    ) -> List[Tuple[str, float, float, int]]:
        """(utt, begin, end, speaker) list (reference :214-281):
        VAD -> per-segment fbank -> 1.5s/0.75s subsegments -> batched
        embedding -> clustering -> merged segments."""
        return self.diarize_pcm(
            self._load_audio(audio_path), utt=utt, clusterer=clusterer
        )

    def diarize_segments(
        self,
        wav: np.ndarray,
        vad_segments: List[Tuple[float, float]],
        utt: str = "unk",
        clusterer: str = "density",
    ) -> List[Tuple[str, float, float, int]]:
        """Diarize with EXTERNAL speech segments (oracle SAD — reference
        voxconverse run.sh sad_type=oracle feeds make_oracle_sad.py
        output into the clusterer instead of running the VAD)."""
        return self.diarize_pcm(
            wav, utt=utt, clusterer=clusterer, vad_segments=vad_segments
        )

    def diarize_pcm(
        self,
        wav: np.ndarray,
        utt: str = "unk",
        clusterer: str = "density",
        vad_segments: Optional[List[Tuple[float, float]]] = None,
    ) -> List[Tuple[str, float, float, int]]:
        """diarize() on in-memory samples (the serving entry point —
        reference runtime/server/diarization_gpu run ensemble consumes
        a raw waveform tensor the same way)."""
        if vad_segments is None:
            vad_segments = self._vad_segments(wav)
        if not vad_segments:
            return []

        seg_feats = self._segment_fbanks(wav, vad_segments)
        if not self.diar_subseg_cmn:
            # CMN once per VAD segment, before windowing (reference
            # diar/make_fbank.py:85-86); the per-window CMN is skipped
            # in the embed path below
            seg_feats = [f - f.mean(axis=0) for f in seg_feats]
        subsegs, fbanks = [], []
        for (begin, end), feats in zip(vad_segments, seg_feats):
            seg_id = make_seg_id(utt, int(begin * 1000), int(end * 1000))
            # frames/second follows the configured fbank frame shift
            # (reference threads diar_frame_shift through subsegment
            # and the id parse, cli/speaker.py:232-264)
            fs_ms = self.fbank_cfg.frame_shift_ms
            s, m = subsegment_fbank(
                feats, seg_id,
                window_fs=int(self.diar_window_secs * 1000 / fs_ms),
                period_fs=int(self.diar_period_secs * 1000 / fs_ms),
                frame_shift=int(fs_ms),
            )
            subsegs += s
            fbanks += m

        embeddings = self._extract_embedding_feats(np.stack(fbanks))

        if clusterer == "spectral":
            labels = spectral_cluster(
                embeddings, impl=self.diar_cluster_impl
            )
        else:
            labels = density_cluster(embeddings)

        from ..diar.subsegment import parse_subseg_id

        items = []
        for sub, lab in zip(subsegs, labels):
            u, b, e = parse_subseg_id(
                sub, frame_shift=int(self.fbank_cfg.frame_shift_ms)
            )
            items.append((b, e, str(lab)))
        items.sort()
        merged = merge_segments({utt: items})
        return [(u, b, e, int(lab)) for (u, b, e, lab) in merged]

    # -------------------------------------------- batched diarization
    def _fbank_slices_device(self, segs):
        """Bucket-batched fbank over waveform slices, KEPT ON DEVICE.

        Same bucketing as `_fbank_slices`, but the (32, Tb, 80) feature
        batches stay as jax arrays and the caller receives, per slice,
        (batch_index, row, n_frames).  Device-resident features are what
        make multi-conversation diarization host-bandwidth-free: the
        sliding windows are GATHERED on device (`_embed_windows_device`)
        instead of downloading every segment fbank and re-uploading ~2x
        the bytes as overlapping windows (measured 70 of 94 wall-seconds
        over the dev tunnel)."""
        # ONE flat upload of the exact segment bytes; the (32, bucket)
        # padded batch rows are sliced out ON DEVICE.  Uploading padded
        # rows instead costs ~25x the bytes (pow2 padding x 32-row
        # batches), which dominated wall time over constrained
        # host->device links.
        #
        # device gather indices are int32 (jax x64 is off), so the flat
        # pool plus its pow2 padding must stay below 2^31 samples; a
        # larger pool is processed in sub-pools with the batch indices
        # offset — a wrapped int32 offset would gather from wrong
        # samples silently
        flat_limit = _FLAT_SAMPLE_LIMIT
        total = sum(len(s) for s in segs)
        if total > flat_limit and len(segs) > 1:
            batches, meta = [], []
            group, gtotal = [], 0
            for s in list(segs) + [None]:
                if group and (s is None or gtotal + len(s) > flat_limit):
                    b, m = self._fbank_slices_device(group)
                    off = len(batches)
                    batches += b
                    meta += [(bi + off, row, nf) for bi, row, nf in m]
                    group, gtotal = [], 0
                if s is not None:
                    group.append(s)
                    gtotal += len(s)
            return batches, meta
        if total > flat_limit:
            raise ValueError(
                f"a single {total}-sample VAD segment (~{total / 16000 / 3600:.1f} h "
                "at 16 kHz) exceeds the 2^31 int32 device-index range; "
                "split the recording before diarization"
            )
        flat = (
            np.concatenate(segs) if segs else np.zeros((1,), np.float32)
        )
        starts_all = np.zeros(len(segs), np.int64)
        off = 0
        for j, s in enumerate(segs):
            starts_all[j] = off
            off += len(s)
        # per-call pow2 capacity: pow2 quantization means only log-many
        # distinct flat shapes ever exist, each bucket program compiles
        # once per (bucket, capacity) pair and stays cached — and unlike
        # a grow-only capacity, a small batch never pays a historical
        # maximum's upload bytes
        pad_flat = _pow2_bucket(max(len(flat), 1))
        # PCM16-exact audio ships as int16 (half the upload bytes) and
        # dequantizes on device bit-identically (wav_io.pcm16_lossless)
        from ..data.wav_io import pcm16_lossless

        q = pcm16_lossless(flat.astype(np.float32))
        if q is not None:
            flat_dev = jnp.asarray(np.pad(q, (0, pad_flat - len(q))))
        else:
            flat_dev = jnp.asarray(
                np.pad(flat.astype(np.float32), (0, pad_flat - len(flat)))
            )

        if not hasattr(self, "_slice_fbank_fns"):
            self._slice_fbank_fns = {}

        def slice_fbank_fn(bucket):
            # fbank_cfg in the key: set_window_type/set_wavform_norm/
            # set_resample_rate replace it, and a stale cached program
            # would silently keep the old window/scale/sample-rate
            key = (bucket, pad_flat, self.diar_subseg_cmn, self.fbank_cfg)
            if key not in self._slice_fbank_fns:
                cfg = self.fbank_cfg
                cmn_per_seg = not self.diar_subseg_cmn

                @jax.jit
                def _fn(flat_w, starts, lens):
                    pos = jnp.arange(bucket)[None, :]
                    idx = jnp.minimum(
                        starts[:, None] + pos, flat_w.shape[0] - 1
                    )
                    w = flat_w[idx]
                    if w.dtype == jnp.int16:  # lossless PCM16 upload
                        w = w.astype(jnp.float32) / 32768.0
                    w = w * (pos < lens[:, None])
                    feats, feat_lens = fbank(w, cfg, lengths=lens)
                    if cmn_per_seg:
                        # CMN once per VAD segment (masked, on device) —
                        # the host path's f - f.mean(axis=0) per prefix
                        feats = apply_cmvn(feats, lengths=feat_lens)
                    return feats, feat_lens

                self._slice_fbank_fns[key] = _fn
            return self._slice_fbank_fns[key]

        # 128 segment rows per dispatch: every dispatch pays the full
        # host->device round trip, so fewer/bigger programs win (results
        # are row-independent, hence identical to the 32-row host path)
        rows_per = 128
        order = sorted(range(len(segs)), key=lambda i: len(segs[i]))
        batches = []
        meta = [None] * len(segs)
        pending = []
        i = 0
        while i < len(order):
            bucket = _pow2_bucket(len(segs[order[i]]))
            idx = []
            while (
                i < len(order)
                and len(segs[order[i]]) <= bucket
                and len(idx) < rows_per
            ):
                idx.append(order[i])
                i += 1
            starts = np.zeros((rows_per,), np.int32)
            lens = np.zeros((rows_per,), np.int32)
            for row, j in enumerate(idx):
                starts[row] = starts_all[j]
                lens[row] = len(segs[j])
            feats, feat_lens = slice_fbank_fn(bucket)(
                flat_dev, jnp.asarray(starts), jnp.asarray(lens)
            )
            batches.append(feats)
            pending.append((feat_lens, idx))
        # fetch every feat_lens AFTER all dispatches are in flight: the
        # downloads pipeline behind the device queue instead of paying
        # one tunnel round trip per batch
        for bpos, (feat_lens, idx) in enumerate(pending):
            fl = np.asarray(feat_lens)
            for row, j in enumerate(idx):
                meta[j] = (bpos, row, int(fl[row]))
        return batches, meta

    def _fbank_slices_from_rows(self, srcs, seg_locs):
        """Bucket-batched segment fbank sliced from ALREADY-UPLOADED
        conversation rows (the silero VAD upload), keeping features on
        device.  seg_locs: per segment (src_idx, row, start_sample,
        n_samples).  Returns the same (batches, meta) contract as
        `_fbank_slices_device` — and bit-identical features, since the
        gathered+masked waveform rows are the same values — while
        skipping the second host->device transfer of the voiced audio
        entirely (round-3 phase split: that upload was ~30% of steady
        wall time over the tunnel)."""
        if not hasattr(self, "_row_fbank_fns"):
            self._row_fbank_fns = {}

        def row_fbank_fn(bucket):
            key = (bucket, self.diar_subseg_cmn, self.fbank_cfg)
            if key not in self._row_fbank_fns:
                cfg = self.fbank_cfg
                cmn_per_seg = not self.diar_subseg_cmn

                @jax.jit
                def _fn(src, rows, starts, lens):
                    pos = jnp.arange(bucket)[None, :]
                    idx = jnp.minimum(
                        starts[:, None] + pos, src.shape[1] - 1
                    )
                    w = src[rows[:, None], idx]
                    if w.dtype == jnp.int16:  # lossless PCM16 upload
                        w = w.astype(jnp.float32) / 32768.0
                    w = w * (pos < lens[:, None])
                    feats, feat_lens = fbank(w, cfg, lengths=lens)
                    if cmn_per_seg:
                        feats = apply_cmvn(feats, lengths=feat_lens)
                    return feats, feat_lens

                self._row_fbank_fns[key] = _fn
            return self._row_fbank_fns[key]

        rows_per = 128
        order = sorted(
            range(len(seg_locs)),
            key=lambda i: (seg_locs[i][0], seg_locs[i][3]),
        )
        batches = []
        meta = [None] * len(seg_locs)
        pending = []
        i = 0
        while i < len(order):
            src_idx = seg_locs[order[i]][0]
            bucket = _pow2_bucket(max(seg_locs[order[i]][3], 1))
            idx = []
            while (
                i < len(order)
                and seg_locs[order[i]][0] == src_idx
                and seg_locs[order[i]][3] <= bucket
                and len(idx) < rows_per
            ):
                idx.append(order[i])
                i += 1
            rows = np.zeros((rows_per,), np.int32)
            starts = np.zeros((rows_per,), np.int32)
            lens = np.zeros((rows_per,), np.int32)
            for row, j in enumerate(idx):
                _, r, s, n = seg_locs[j]
                rows[row], starts[row], lens[row] = r, s, n
            feats, feat_lens = row_fbank_fn(bucket)(
                srcs[src_idx], jnp.asarray(rows), jnp.asarray(starts),
                jnp.asarray(lens),
            )
            batches.append(feats)
            pending.append((feat_lens, idx))
        for bpos, (feat_lens, idx) in enumerate(pending):
            fl = np.asarray(feat_lens)
            for row, j in enumerate(idx):
                meta[j] = (bpos, row, int(fl[row]))
        return batches, meta

    def _embed_windows_device(self, feats_dev, windows, chunk=512,
                              defer=False):
        """Embed sliding windows gathered ON DEVICE from a (32, Tb, 80)
        feature batch.  windows: (row, start, m) with m = valid frames
        (np.resize tile semantics: window row r reads frame
        start + (r mod m); m == 0 yields zeros).  Returns (N, D), or
        with ``defer=True`` the undownloaded (device_array, k) handles
        so multi-batch callers can overlap every download."""
        win = int(self.diar_window_secs * 1000
                  / self.fbank_cfg.frame_shift_ms)
        if getattr(self, "_win_embed_win", None) != win:
            self._win_embed_win = win

            def _fn(v, feats, rows, starts, ms, cmn):
                r = jnp.arange(win)[None, :]
                m = jnp.maximum(ms[:, None], 1)
                idx = starts[:, None] + r % m
                w = feats[rows[:, None], idx]  # (N, win, F) gather
                w = jnp.where((ms > 0)[:, None, None], w, 0.0)
                if cmn:
                    w = apply_cmvn(w)
                return self.net.apply(
                    v, w, train=False, method=self.net.embed
                )

            self._win_embed_fn = jax.jit(_fn, static_argnums=5)
        handles = []
        n = len(windows)
        for s in range(0, n, chunk):
            part = windows[s : s + chunk]
            k = len(part)
            rows = np.zeros((chunk,), np.int32)
            starts = np.zeros((chunk,), np.int32)
            ms = np.zeros((chunk,), np.int32)
            for t, (row, start, m) in enumerate(part):
                rows[t], starts[t], ms[t] = row, start, m
            emb = self._win_embed_fn(
                self.variables, feats_dev, jnp.asarray(rows),
                jnp.asarray(starts), jnp.asarray(ms),
                self.diar_subseg_cmn,
            )
            handles.append((emb, k))
        if defer:
            return handles
        # fetch after every chunk is dispatched (downloads pipeline
        # behind the device queue instead of serializing per chunk)
        out = [np.asarray(emb)[:k] for emb, k in handles]
        return np.concatenate(out) if out else np.zeros((0, 1), np.float32)

    def _vad_segments_batch(self, wavs, return_device=False):
        """Per-conversation (begin_s, end_s) lists with ONE silero
        dispatch per pow2 bucket across the whole conversation batch
        (diar/silero.silero_probs_batch); the threshold state machine
        stays per-conversation on host.  Row-independent math keeps the
        segments identical to `_vad_segments` per conversation.

        With ``return_device=True`` additionally returns the silero
        upload's device batches + conv->(batch_idx, row) map when they
        hold the diarization-rate audio verbatim (resample_rate ==
        VAD_SR), so the segment fbank can slice from the SAME upload —
        otherwise (energy VAD, telephony resample) returns (segs, None,
        None) and the caller pays the flat segment upload as before."""
        if self.vad_model is None:
            segs = [energy_vad(w, self.resample_rate) for w in wavs]
            return (segs, None, None) if return_device else segs
        from ..diar.silero import SR as VAD_SR
        from ..diar.silero import get_speech_timestamps, silero_probs_batch

        reusable = self.resample_rate == VAD_SR
        vad_wavs = []
        for wav in wavs:
            if not reusable:
                import math

                from scipy.signal import resample_poly

                g = math.gcd(self.resample_rate, VAD_SR)
                wav = resample_poly(
                    wav, VAD_SR // g, self.resample_rate // g
                ).astype(np.float32)
            vad_wavs.append(wav)
        probs, batches, locs = silero_probs_batch(
            self.vad_model.params, vad_wavs, return_device=True
        )
        out = []
        for w, p in zip(vad_wavs, probs):
            ts = get_speech_timestamps(w, model=lambda _w, _p=p: _p)
            out.append([(t["start"] / VAD_SR, t["end"] / VAD_SR) for t in ts])
        if return_device:
            return out, (batches if reusable else None), (
                locs if reusable else None
            )
        return out

    def diarize_pcm_batch(
        self,
        wavs: List[np.ndarray],
        utts: Optional[List[str]] = None,
        clusterer: str = "density",
        cluster_workers: int = 4,
    ) -> List[List[Tuple[str, float, float, int]]]:
        """Throughput-oriented multi-conversation diarization.

        Role of the reference's Triton diarization ensemble
        (runtime/server/diarization_gpu/model_repo/run/1/model.py:9) —
        but instead of per-conversation streams, the batch POOLS device
        work across conversations: one VAD dispatch per length bucket,
        one fbank dispatch per segment bucket (segments from all
        conversations share buckets), and full embedding batches over the
        pooled subsegment windows.  Host-side clustering runs in a thread
        pool (BLAS/eigh release the GIL).  Every per-conversation result
        is bit-identical to `diarize_pcm` (tests/test_diar_batch.py): the
        pooled programs are the same shapes and row-independent.

        Phase wall times for the last call land in
        ``self.last_diar_timings`` (vad / fbank / embed / cluster
        seconds) — the perf harness reads them to attribute the wall
        clock over constrained host<->device links."""
        import time as _time

        timings = {}
        _t0 = _time.perf_counter()
        if utts is None:
            utts = [f"utt{i}" for i in range(len(wavs))]
        vad_segs, vad_dev, vad_locs = self._vad_segments_batch(
            wavs, return_device=True
        )
        timings["vad"] = _time.perf_counter() - _t0
        _t0 = _time.perf_counter()

        # pool all VAD segments from all conversations into one fbank run
        # whose outputs STAY ON DEVICE (bytes to host: embeddings only).
        # When the silero upload holds the diarization-rate audio
        # (vad_dev), slice segments out of THAT upload — no second
        # voiced-audio transfer; otherwise fall back to the flat upload.
        n_segs = sum(len(s) for s in vad_segs)
        if n_segs == 0:
            feat_batches, meta = [], []
        elif vad_dev is not None:
            seg_locs = []
            for ci, segs in enumerate(vad_segs):
                src_idx, row = vad_locs[ci]
                for begin, end in segs:
                    b_idx = int(begin * self.resample_rate)
                    e_idx = min(int(end * self.resample_rate),
                                len(wavs[ci]))
                    seg_locs.append(
                        (src_idx, row, b_idx, max(e_idx - b_idx, 0))
                    )
            feat_batches, meta = self._fbank_slices_from_rows(
                vad_dev, seg_locs
            )
        else:
            slices = []
            for wav, segs in zip(wavs, vad_segs):
                for begin, end in segs:
                    b_idx = int(begin * self.resample_rate)
                    e_idx = int(end * self.resample_rate)
                    slices.append(wav[b_idx:e_idx])
            feat_batches, meta = self._fbank_slices_device(slices)
        timings["fbank"] = _time.perf_counter() - _t0
        _t0 = _time.perf_counter()

        # window TABLES per conversation (host: ids + (row, start, m));
        # contents are gathered on device per fbank batch
        from ..diar.subsegment import subsegment_windows

        fs_ms = self.fbank_cfg.frame_shift_ms
        win = int(self.diar_window_secs * 1000 / fs_ms)
        period = int(self.diar_period_secs * 1000 / fs_ms)
        conv_subsegs: List[List[str]] = [[] for _ in wavs]
        counts = [0] * len(wavs)
        per_batch: List[List[Tuple[int, int, int, int]]] = [
            [] for _ in feat_batches
        ]
        n_windows = 0
        seg_ptr = 0
        for ci, segs in enumerate(vad_segs):
            for begin, end in segs:
                b_idx, row, n_frames = meta[seg_ptr]
                seg_ptr += 1
                seg_id = make_seg_id(
                    utts[ci], int(begin * 1000), int(end * 1000)
                )
                ids, table = subsegment_windows(
                    seg_id, n_frames, window_fs=win, period_fs=period,
                    frame_shift=int(fs_ms),
                )
                conv_subsegs[ci] += ids
                counts[ci] += len(ids)
                for start, m in table:
                    per_batch[b_idx].append((n_windows, row, start, m))
                    n_windows += 1

        embeddings = np.zeros((max(n_windows, 1), 1), np.float32)
        if n_windows:
            embeddings = None
            # dispatch ALL embedding chunks across all feature batches
            # first, then download: the tunnel round trips overlap with
            # device compute instead of serializing per batch
            deferred = []
            for b_idx, wins in enumerate(per_batch):
                if not wins:
                    continue
                handles = self._embed_windows_device(
                    feat_batches[b_idx], [w[1:] for w in wins],
                    defer=True,
                )
                deferred.append((wins, handles))
            for wins, handles in deferred:
                parts = [np.asarray(h)[:k] for h, k in handles]
                emb = (np.concatenate(parts) if parts
                       else np.zeros((0, 1), np.float32))
                if embeddings is None:
                    embeddings = np.zeros(
                        (n_windows, emb.shape[-1]), emb.dtype
                    )
                for (gidx, _, _, _), e in zip(wins, emb):
                    embeddings[gidx] = e
        timings["embed"] = _time.perf_counter() - _t0
        _t0 = _time.perf_counter()

        # per-conversation clustering on host threads
        from concurrent.futures import ThreadPoolExecutor

        bounds = np.cumsum([0] + counts)
        if clusterer == "spectral":
            impl = self.diar_cluster_impl

            def cluster_fn(e):
                return spectral_cluster(e, impl=impl)
        else:
            cluster_fn = density_cluster

        def one(ci):
            emb = embeddings[bounds[ci]:bounds[ci + 1]]
            if not len(emb):
                return []
            labels = cluster_fn(emb)
            from ..diar.subsegment import parse_subseg_id

            items = []
            for sub, lab in zip(conv_subsegs[ci], labels):
                u, b, e = parse_subseg_id(sub, frame_shift=int(fs_ms))
                items.append((b, e, str(lab)))
            items.sort()
            merged = merge_segments({utts[ci]: items})
            return [(u, b, e, int(lab)) for (u, b, e, lab) in merged]

        with ThreadPoolExecutor(max_workers=max(1, cluster_workers)) as ex:
            results = list(ex.map(one, range(len(wavs))))
        timings["cluster"] = _time.perf_counter() - _t0
        self.last_diar_timings = timings
        return results

    def warm_diarize(self, max_seconds: float = 30.0) -> None:
        """Pre-compile every XLA program the diarization path can hit up
        to `max_seconds`-long VAD segments: the VAD model, one fbank
        program per pow2 sample bucket, and the window-embedding forward.
        Servers call this at startup so the first /diarize request does
        not stall behind the whole compile chain (bin/serve.py warms the
        embed buckets for the same reason)."""
        sr = self.resample_rate
        # the VAD pads to pow2 chunk buckets; warm each bucket shape
        n = sr
        while True:
            self._vad_segments(np.zeros(n, np.float32))
            if n >= int(max_seconds * sr):
                break
            n *= 2
        bucket = _pow2_bucket(1)
        top = _pow2_bucket(int(max_seconds * sr))
        while True:
            fbank(
                jnp.zeros((32, bucket), jnp.float32), self.fbank_cfg,
                lengths=jnp.full((32,), bucket, jnp.int32),
            )[0].block_until_ready()
            if bucket >= top:
                break
            bucket *= 2
        window = jnp.zeros(
            (
                32,
                int(self.diar_window_secs * 1000
                    / self.fbank_cfg.frame_shift_ms),
                self.fbank_cfg.num_mel_bins,
            ),
            jnp.float32,
        )
        self._embed_feats_fn(
            self.variables, window, self.diar_subseg_cmn
        ).block_until_ready()
        # warm the BATCHED path too (serve.py pools /diarize requests
        # through diarize_pcm_batch): one synthetic speech-bearing
        # conversation compiles the batched-silero, row-sliced fbank and
        # window-gather embedding programs for the common buckets
        t = np.arange(int(min(max_seconds, 8.0) * sr)) / sr
        tone = (0.1 * np.sin(2 * np.pi * 220.0 * t)).astype(np.float32)
        try:
            self.diarize_pcm_batch([tone], utts=["warm"])
        except Exception:  # warmup must never block serving
            pass

    def _segment_fbanks(self, wav, vad_segments):
        """Per-VAD-segment fbank, batched by length bucket.

        Each segment is an independent waveform (reference
        diar/make_fbank.py semantics — frames never cross a segment
        boundary), but naive per-segment calls compile one XLA program
        PER DISTINCT LENGTH.  Segments are padded to power-of-two sample
        buckets and batched through `fbank(..., lengths=...)`, whose
        frame masking makes the valid frames bit-identical to a
        per-segment call: a handful of compiled shapes total."""
        segs = []
        for begin, end in vad_segments:
            b_idx = int(begin * self.resample_rate)
            e_idx = int(end * self.resample_rate)
            segs.append(wav[b_idx:e_idx])
        return self._fbank_slices(segs)

    def _fbank_slices(self, segs):
        """Bucket-batched fbank over a flat list of waveform slices
        (shared by the single-conversation path and diarize_batch, which
        pools segments from MANY conversations into the same buckets)."""
        order = sorted(range(len(segs)), key=lambda i: len(segs[i]))
        out: Dict[int, np.ndarray] = {}
        i = 0
        while i < len(order):
            bucket = _pow2_bucket(len(segs[order[i]]))
            idx = []
            while (
                i < len(order)
                and len(segs[order[i]]) <= bucket
                and len(idx) < 32
            ):
                idx.append(order[i])
                i += 1
            # batch dim fixed at 32 too — a varying row count would be
            # one more compiled shape per count
            wavs = np.zeros((32, bucket), np.float32)
            lens = np.zeros((32,), np.int32)
            for row, j in enumerate(idx):
                wavs[row, : len(segs[j])] = segs[j]
                lens[row] = len(segs[j])
            feats, feat_lens = fbank(
                jnp.asarray(wavs), self.fbank_cfg,
                lengths=jnp.asarray(lens),
            )
            feats = np.asarray(feats)
            feat_lens = np.asarray(feat_lens)
            for row, j in enumerate(idx):
                out[j] = feats[row, : feat_lens[row]]
        return [out[j] for j in range(len(segs))]

    def _extract_embedding_feats(
        self, fbanks: np.ndarray, batch_size: int = 32
    ) -> np.ndarray:
        """Batched forward over fixed-size fbank windows with per-window
        CMN (reference :106-121)."""
        out = []
        for s in range(0, len(fbanks), batch_size):
            chunk = fbanks[s : s + batch_size]
            k = len(chunk)
            if k < batch_size:
                # pad the tail batch to the fixed size: a varying batch
                # dim would compile one extra XLA program per remainder
                chunk = np.concatenate(
                    [chunk,
                     np.zeros((batch_size - k,) + chunk.shape[1:],
                              chunk.dtype)]
                )
            emb = self._embed_feats_fn(
                self.variables, jnp.asarray(chunk), self.diar_subseg_cmn
            )
            out.append(np.asarray(emb)[:k])
        return np.concatenate(out)

    def diarize_list(self, scp_path: str, clusterer: str = "density",
                     batch: int = 8):
        """wav.scp -> dict of per-utt merged segments (reference :272).

        Conversations are diarized through `diarize_pcm_batch` in groups
        of `batch` — per-utt results are identical to one-at-a-time
        `diarize` but device dispatches pool across the group."""
        entries = []
        with open(scp_path) as f:
            for line in f:
                parts = line.split()
                if len(parts) >= 2:
                    entries.append((parts[0], parts[1]))
        results = {}
        for s in range(0, len(entries), max(1, batch)):
            group = entries[s : s + max(1, batch)]
            wavs = [self._load_audio(p) for _, p in group]
            outs = self.diarize_pcm_batch(
                wavs, utts=[u for u, _ in group], clusterer=clusterer
            )
            for (u, _), segs in zip(group, outs):
                results[u] = segs
        return results

    def make_rttm(self, merged_segments, outfile: str):
        write_rttm(
            outfile,
            [(u, b, e, f"spk{lab}") for (u, b, e, lab) in merged_segments],
        )


def load_model(model_dir_or_alias: str) -> Speaker:
    """Load from a local model directory or a hub alias (reference
    load_model:300 + cli/hub.py Hub.get_model — here resolved offline
    via cli/hub.py, with automatic torch-bundle conversion)."""
    from .hub import Hub, ensure_native_checkpoint

    if os.path.isdir(model_dir_or_alias):
        return Speaker(ensure_native_checkpoint(model_dir_or_alias))
    return Speaker(Hub.get_model(model_dir_or_alias))


def main():
    import argparse

    parser = argparse.ArgumentParser("wespeaker-tpu")
    parser.add_argument(
        "-t", "--task",
        choices=["embedding", "embedding_kaldi", "similarity",
                 "diarization", "diarization_list"],
        default="embedding",
    )
    # model selection mirrors the reference (cli/utils.py:32-60 +
    # cli/speaker.py:327-343): explicit dir/alias via -p, else a model
    # flag, else the language alias
    parser.add_argument("-p", "--pretrain", default="",
                        help="model directory or hub alias (cli/hub.py)")
    parser.add_argument("-l", "--language", choices=["chinese", "english"],
                        default="chinese")
    parser.add_argument("--campplus", action="store_true",
                        help="use the campplus_cn_common hub model")
    parser.add_argument("--eres2net", action="store_true",
                        help="use the eres2net_cn_common hub model")
    parser.add_argument("--vblinkp", action="store_true",
                        help="use the samresnet34 voxblink2-pretrained model")
    parser.add_argument("--vblinkf", action="store_true",
                        help="use the samresnet34 voxblink2+voxceleb2 model")
    parser.add_argument("--audio_file", default=None)
    parser.add_argument("--audio_file2", default=None)
    parser.add_argument("--wav_scp", default=None)
    parser.add_argument("--output_file", default=None)
    parser.add_argument("--resample_rate", type=int, default=16000)
    parser.add_argument("--vad", action="store_true")
    parser.add_argument("--diar_window_secs", type=float, default=1.5)
    parser.add_argument("--diar_period_secs", type=float, default=0.75)
    parser.add_argument(
        "--diar_subseg_cmn", default=True,
        type=lambda x: x.lower() == "true",
        help="true: CMN per window (reference default); false: CMN once "
             "per VAD segment (diar/make_fbank.py --subseg-cmn)",
    )
    args = parser.parse_args()

    logging.basicConfig(level=logging.INFO)
    if args.pretrain:
        model = load_model(args.pretrain)
    elif args.campplus:
        model = load_model("campplus")
        model.set_wavform_norm(True)
        model.set_window_type("povey")
    elif args.eres2net:
        model = load_model("eres2net")
        model.set_wavform_norm(True)
        model.set_window_type("povey")
    elif args.vblinkp:
        model = load_model("vblinkp")
    elif args.vblinkf:
        model = load_model("vblinkf")
    else:
        model = load_model(args.language)
    model.set_resample_rate(args.resample_rate)
    model.set_vad(args.vad)
    model.set_diarization_params(
        window_secs=args.diar_window_secs,
        period_secs=args.diar_period_secs,
        subseg_cmn=args.diar_subseg_cmn,
    )

    if args.task == "embedding":
        emb = model.extract_embedding(args.audio_file)
        out = args.output_file or "embedding.txt"
        np.savetxt(out, emb)
        print(f"embedding -> {out}")
    elif args.task == "embedding_kaldi":
        names, embs = model.extract_embedding_list(args.wav_scp)
        from ..utils.embeddings import save_embeddings

        save_embeddings(args.output_file, names, np.stack(embs))
        print(f"{len(names)} embeddings -> {args.output_file}")
    elif args.task == "similarity":
        print(model.compute_similarity(args.audio_file, args.audio_file2))
    elif args.task == "diarization":
        segs = model.diarize(args.audio_file)
        if args.output_file:
            model.make_rttm(segs, args.output_file)
        else:
            for u, b, e, lab in segs:
                print(f"{u} {b:.3f} {e:.3f} spk{lab}")
    elif args.task == "diarization_list":
        with open(args.wav_scp) as f, open(args.output_file, "w") as out:
            for line in f:
                utt, path = line.split()[:2]
                segs = model.diarize(path, utt=utt)
                for u, b, e, lab in segs:
                    out.write(
                        f"SPEAKER {u} 1 {b:.3f} {e - b:.3f} "
                        f"<NA> <NA> spk{lab} <NA> <NA>\n"
                    )


if __name__ == "__main__":
    main()
