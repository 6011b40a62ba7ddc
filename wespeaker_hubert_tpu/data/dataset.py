"""Sharded host-side input pipeline.

Rebuild of the reference's UIO chain (reference: wespeaker/dataset/
dataset.py:136-229 chains DataList -> url_opener -> tar_file_and_group /
parse_raw -> filter -> shuffle -> spk_to_id -> resample -> speed_perturb ->
random_chunk -> add_reverb_noise -> compute_fbank) with the TPU split of
responsibilities: the host DECODES + SELECTS (shard striping, shuffle,
chunk choice, aug parameter sampling) and ships fixed-shape numpy batches;
all DSP (resample/reverb/noise/fbank) runs on-device (ops/augment.py,
ops/pipeline.py).

Data formats:
  * raw list — JSONL lines {"key", "wav", "spk"} (reference parse_raw
    processor.py:119); optional "vad" crop list.
  * shard — tar archives whose members are KEY.wav / KEY.spk pairs
    (reference tar_file_and_group processor.py:68, tools/make_shard_list.py).

Striping matches DistributedSampler.sample (reference dataset.py:85-100):
`shards[rank::world_size][worker::num_workers]` with an epoch-seeded
shuffle of the shard list.
"""

from __future__ import annotations

import dataclasses
import json
import random
import tarfile
from typing import Dict, Iterable, Iterator, List, Optional, Sequence

import numpy as np

from ..ops.augment import speed_input_len
from .aug_store import AugStore, snr_range_for_key
from .wav_io import read_wav, read_wav_bytes

__all__ = [
    "TrainPipelineConfig",
    "shard_list_for_rank",
    "iter_raw_list",
    "iter_feat_list",
    "iter_tar_shards",
    "buffer_shuffle",
    "TrainPipeline",
    "PrefetchPipeline",
    "NativeTrainPipeline",
    "EvalPipeline",
    "chunk_samples_for_frames",
]


def chunk_samples_for_frames(
    num_frms: int, frame_shift_ms: float = 10.0, frame_length_ms: float = 25.0,
    sample_rate: int = 16000,
) -> int:
    """Samples required for exactly num_frms fbank frames (reference
    dataset.py:209-217)."""
    return int(
        ((num_frms - 1) * frame_shift_ms + frame_length_ms) * sample_rate / 1000
    )


def shard_list_for_rank(
    entries: Sequence[str],
    epoch: int,
    rank: int = 0,
    world_size: int = 1,
    worker: int = 0,
    num_workers: int = 1,
    shuffle: bool = True,
    seed: int = 42,
) -> List[str]:
    data = list(entries)
    if shuffle:
        rng = random.Random(seed + epoch)
        rng.shuffle(data)
    return data[rank::world_size][worker::num_workers]


def load_data_list(path: str) -> List[str]:
    """Read a data-list file into entry strings.  For 'raw' type each line
    is a JSON object {key, wav, spk} (reference tools/make_raw_list.py);
    for 'shard' each line is a tar path — striping happens at LINE
    granularity like the reference DistributedSampler."""
    with open(path, "r", encoding="utf-8") as f:
        return [ln.strip() for ln in f if ln.strip()]


def _read_wav_fast(path: str):
    """Native C decode when available (releases the GIL -> worker threads
    scale; bit-identical to wav_io.read_wav), python fallback otherwise."""
    global _NATIVE_DECODE
    if _NATIVE_DECODE is None:
        try:
            from .native_loader import decode_wav_native_sr, native_available

            _NATIVE_DECODE = decode_wav_native_sr if native_available() else False
        except Exception:
            _NATIVE_DECODE = False
    if _NATIVE_DECODE:
        try:
            return _NATIVE_DECODE(path)
        except Exception:
            pass  # unusual container (e.g. 8-bit PCM): python reader
    return read_wav(path)


_NATIVE_DECODE = None


def iter_raw_list(entries: Iterable[str]) -> Iterator[dict]:
    """JSON entry lines -> {key, wav(float32), sample_rate, spk}
    (reference parse_raw processor.py:119)."""
    for line in entries:
        try:
            obj = json.loads(line)
            wav, sr = _read_wav_fast(obj["wav"])
            if "vad" in obj:
                parts = [
                    wav[int(float(s) * sr) : int(float(e) * sr)]
                    for s, e in obj["vad"]
                ]
                wav = np.concatenate(parts) if parts else wav[:0]
            yield {
                "key": obj["key"],
                # eval/trial lists carry no speaker label — default empty
                "spk": obj.get("spk", ""),
                "wav": wav,
                "sample_rate": sr,
            }
        except Exception as e:  # corrupt sample: warn + skip
            import logging

            logging.warning("failed to read sample: %s", e)


def iter_feat_list(entries: Iterable[str]) -> Iterator[dict]:
    """JSON entry lines {key, feat, spk} -> {key, feat(T,F float32), spk}
    (reference parse_feat processor.py:171; 'feat' is a kaldi matrix-ark
    rxspecifier 'file.ark:offset' as written by tools/make_feat_list)."""
    from ..backend.kaldi_io import read_kaldi_matrix

    for line in entries:
        try:
            obj = json.loads(line)
            # asarray: no copy when the ark is already f32 (the hot path)
            feat = np.asarray(read_kaldi_matrix(obj["feat"]), np.float32)
            yield {
                "key": obj["key"],
                "spk": obj.get("spk", ""),
                "feat": feat,
            }
        except Exception as e:  # corrupt sample: warn + skip (parity)
            import logging

            logging.warning("failed to read feat sample: %s", e)


def iter_tar_shards(paths: Iterable[str]) -> Iterator[dict]:
    """Webdataset-style tar shards: KEY.wav + KEY.spk grouped by prefix
    (reference tar_file_and_group processor.py:68-116)."""
    import logging

    for path in paths:
        zf = None
        try:
            # py3.12 tarfile reads gz/bz2/xz but not zstd; route zstd
            # streams through the ctypes libzstd reader (zstd_io.py)
            from .zstd_io import open_maybe_zstd

            zf = open_maybe_zstd(path)
            ctx = (tarfile.open(fileobj=zf, mode="r|") if zf is not None
                   else tarfile.open(path, "r|*"))
            with ctx as tf:
                cur_key: Optional[str] = None
                cur: dict = {}
                for member in tf:
                    if not member.isfile():
                        continue
                    name = member.name
                    base, _, ext = name.rpartition(".")
                    if base != cur_key:
                        if cur_key is not None and "wav" in cur:
                            yield cur | {"key": cur_key, "spk": cur.get("spk", "")}
                        cur_key, cur = base, {}
                    data = tf.extractfile(member).read()
                    if ext == "wav":
                        wav, sr = read_wav_bytes(data)
                        cur["wav"] = wav
                        cur["sample_rate"] = sr
                    elif ext in ("spk", "txt"):
                        cur["spk"] = data.decode("utf-8").strip()
                if cur_key is not None and "wav" in cur:
                    yield cur | {"key": cur_key, "spk": cur.get("spk", "")}
        except Exception as e:
            logging.warning("failed to read shard %s: %s", path, e)
        finally:
            if zf is not None:
                zf.close()


def buffer_shuffle(it: Iterator, buffer_size: int, rng: random.Random) -> Iterator:
    """Streaming shuffle with a bounded buffer (reference processor.py:198)."""
    buf = []
    for x in it:
        buf.append(x)
        if len(buf) >= buffer_size:
            idx = rng.randrange(len(buf))
            buf[idx], buf[-1] = buf[-1], buf[idx]
            yield buf.pop()
    rng.shuffle(buf)
    yield from buf


def _random_chunk(x: np.ndarray, chunk_len: int, rng: random.Random) -> np.ndarray:
    """Random crop, or tile-pad when short (reference processor.py:291-323).
    Works on samples (1-D wav) or frames (2-D feature matrices, axis 0)."""
    n = len(x)
    if n >= chunk_len:
        start = rng.randint(0, n - chunk_len)
        return x[start : start + chunk_len]
    reps = chunk_len // max(n, 1) + 1
    return np.tile(x, (reps,) + (1,) * (x.ndim - 1))[:chunk_len]


@dataclasses.dataclass
class TrainPipelineConfig:
    data_type: str = "raw"  # 'raw' | 'shard' | 'feat'
    num_frms: int = 200
    frame_shift_ms: float = 10.0
    frame_length_ms: float = 25.0
    sample_rate: int = 16000
    shuffle: bool = True
    shuffle_size: int = 2500
    filter_min_frames: int = 100
    filter_max_frames: int = 800
    speed_perturb: bool = True
    aug_prob: float = 0.6
    rir_max_samples: int = 8000
    batch_size: int = 64
    drop_last: bool = True
    seed: int = 42
    # packed aug layout: each batch is sorted into fixed-count slots
    # [reverb | noise | clean] so the device FFT-convolves only the reverb
    # rows (ops/augment.add_reverb_noise_packed).  Counts are rounded to
    # multiples of `aug_align` (set it to the data-parallel degree so
    # GSPMD row slices stay shard-aligned).
    packed_aug: bool = True
    aug_align: int = 1


class TrainPipeline:
    """End-to-end host pipeline: shard list -> device-ready numpy batches.

    Batch dict fields:
      wav:       (B, L_in) float32  — raw chunks (over-long if speed_perturb
                 so the device resampler always has input; L_in =
                 speed_input_len(chunk_samples))
      speed_idx: (B,) int32         — 0/1/2 for speeds 1.0/0.9/1.1
      label:     (B,) int32         — spk id, already x3-expanded for speed
                 (reference processor.py:286 label += num_spks * idx)
      aug_type:  (B,) int32         — 0 none / 1 reverb / 2 noise
      rir:       (B, R) float32
      noise:     (B, chunk_samples) float32
      snr:       (B,) float32
    """

    def __init__(
        self,
        data_list: Sequence[str],
        spk2id: Dict[str, int],
        cfg: TrainPipelineConfig = TrainPipelineConfig(),
        reverb_store: Optional[AugStore] = None,
        noise_store: Optional[AugStore] = None,
        rank: int = 0,
        world_size: int = 1,
        worker: int = 0,
        num_workers: int = 1,
    ):
        self.data_list = list(data_list)
        self.spk2id = spk2id
        self.cfg = cfg
        self.reverb_store = reverb_store
        self.noise_store = noise_store
        self.rank = rank
        self.world_size = world_size
        self.worker = worker
        self.num_workers = max(1, num_workers)
        self.epoch = 0
        self.chunk_samples = chunk_samples_for_frames(
            cfg.num_frms, cfg.frame_shift_ms, cfg.frame_length_ms, cfg.sample_rate
        )
        self.input_samples = (
            speed_input_len(self.chunk_samples)
            if cfg.speed_perturb
            else self.chunk_samples
        )
        self.aug_counts = self._compute_aug_counts()

    def _compute_aug_counts(self):
        """Fixed (n_reverb, n_noise) per batch for the packed layout.
        Expected fractions match the reference's per-sample draws
        (processor.py: Bernoulli(aug_prob) then 50/50 reverb/noise; if a
        store is missing its share falls through like the unpacked path)."""
        cfg = self.cfg
        if cfg.data_type == "feat" or not cfg.packed_aug:
            # precomputed features: no waveform-domain aug possible
            # (reference dataset.py:194-199 skips resample/speed/aug/fbank)
            return (0, 0)
        a = max(1, cfg.aug_align)

        def rnd(x):
            return max(0, int(round(x / a)) * a)

        b, p = cfg.batch_size, cfg.aug_prob
        if self.reverb_store and self.noise_store:
            return (rnd(b * p / 2), rnd(b * p / 2))
        if self.noise_store:  # reverb draws fall through to noise
            return (0, rnd(b * p))
        if self.reverb_store:  # noise draws are dropped (no fallthrough)
            return (rnd(b * p / 2), 0)
        return (0, 0)

    def set_epoch(self, epoch: int) -> None:
        self.epoch = epoch

    def _samples(self) -> Iterator[dict]:
        cfg = self.cfg
        shards = shard_list_for_rank(
            self.data_list,
            self.epoch,
            self.rank,
            self.world_size,
            worker=self.worker,
            num_workers=self.num_workers,
            shuffle=cfg.shuffle,
            seed=cfg.seed,
        )
        it = {
            "shard": iter_tar_shards,
            "feat": iter_feat_list,
        }.get(cfg.data_type, iter_raw_list)(shards)
        rng = random.Random(
            cfg.seed + 77 * self.epoch + self.rank + 10007 * self.worker
        )
        if cfg.shuffle:
            it = buffer_shuffle(it, cfg.shuffle_size, rng)

        if cfg.data_type == "feat":
            # precomputed features (reference dataset.py:194-199): filter
            # by frame count, random_chunk on frames; no resample/speed/
            # aug/fbank — CMVN + SpecAug still run in-graph on device
            # (executor step, like the reference's GPU-side split)
            for s in it:
                feat = s["feat"]
                if not (
                    cfg.filter_min_frames <= len(feat) <= cfg.filter_max_frames
                ):
                    continue
                if s["spk"] not in self.spk2id:
                    continue
                yield {
                    "feat": _random_chunk(
                        feat, cfg.num_frms, rng
                    ).astype(np.float32),
                    "label": np.int32(self.spk2id[s["spk"]]),
                }
            return

        min_samp = int(cfg.filter_min_frames * cfg.frame_shift_ms / 1000 * cfg.sample_rate)
        max_samp = int(cfg.filter_max_frames * cfg.frame_shift_ms / 1000 * cfg.sample_rate)
        nprng = np.random.default_rng(
            cfg.seed + 1000 * self.epoch + self.rank + 10007 * self.worker
        )

        n_rev, n_noise = self.aug_counts
        pos = 0  # slot within the current batch (packed layout)
        for s in it:
            wav = s["wav"]
            # both bounds enforced like the reference filter
            # (processor.py:filter) so the sampling distribution matches:
            # the reference drops > max_num_frames utterances entirely
            # (there to bound CPU fbank cost; kept here for parity —
            # set filter_max_frames very large to chunk instead of drop)
            if not (min_samp <= len(wav) <= max_samp):
                continue
            spk = s["spk"]
            if spk not in self.spk2id:
                continue
            label = self.spk2id[spk]

            speed_idx = 0
            if cfg.speed_perturb:
                speed_idx = rng.randint(0, 2)
                # x3 label space (reference processor.py:286)
                label = label + len(self.spk2id) * (speed_idx if speed_idx else 0)
            chunk = _random_chunk(wav, self.input_samples, rng)

            sample = {
                "wav": chunk.astype(np.float32),
                "label": np.int32(label),
            }
            if cfg.speed_perturb:
                # only present when enabled: its presence is what routes
                # the batch through the device resampler (train/executor
                # prepare_wav), and disabled batches are already exactly
                # chunk_samples long
                sample["speed_idx"] = np.int32(speed_idx)
            if cfg.packed_aug:
                # slot decides the aug type; params drawn only when needed
                if pos < n_rev:
                    _, r = self.reverb_store.random_one(nprng)
                    r = np.asarray(r, np.float32)[: cfg.rir_max_samples]
                    rir = np.zeros((cfg.rir_max_samples,), np.float32)
                    rir[: len(r)] = r
                    sample["rir"] = rir
                elif pos < n_rev + n_noise:
                    key, nz = self.noise_store.random_one(nprng)
                    sample["noise"] = _random_chunk(
                        np.asarray(nz, np.float32), self.chunk_samples, rng
                    ).astype(np.float32)
                    lo, hi = snr_range_for_key(key)
                    sample["snr"] = np.float32(rng.uniform(lo, hi))
            else:
                aug_type, snr = 0, 0.0
                rir = np.zeros((cfg.rir_max_samples,), np.float32)
                noise = np.zeros((self.chunk_samples,), np.float32)
                if (
                    cfg.aug_prob > rng.random()
                    and (self.reverb_store or self.noise_store)
                ):
                    aug_type = rng.randint(1, 2)
                    if aug_type == 1 and self.reverb_store is not None:
                        _, r = self.reverb_store.random_one(nprng)
                        r = np.asarray(r, np.float32)[: cfg.rir_max_samples]
                        rir[: len(r)] = r
                    elif self.noise_store is not None:
                        aug_type = 2
                        key, nz = self.noise_store.random_one(nprng)
                        noise = _random_chunk(
                            np.asarray(nz, np.float32), self.chunk_samples, rng
                        )
                        lo, hi = snr_range_for_key(key)
                        snr = rng.uniform(lo, hi)
                    else:
                        aug_type = 0
                sample.update(
                    aug_type=np.int32(aug_type),
                    rir=rir,
                    noise=noise.astype(np.float32),
                    snr=np.float32(snr),
                )
            yield sample
            pos = (pos + 1) % cfg.batch_size

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        cfg = self.cfg
        buf: List[dict] = []
        for s in self._samples():
            buf.append(s)
            if len(buf) == cfg.batch_size:
                yield self._collate(buf)
                buf = []
        if buf and not cfg.drop_last:
            yield self._collate(buf)

    def _collate(self, samples: List[dict]) -> Dict[str, np.ndarray]:
        if not self.cfg.packed_aug:
            return {k: np.stack([s[k] for s in samples]) for k in samples[0]}
        # packed layout: compact per-slot arrays (batch rows are already
        # ordered [reverb | noise | clean] by _samples' slot counter)
        n_rev, n_noise = self.aug_counts
        n = len(samples)
        n_rev = min(n_rev, n)
        n_noise = min(n_noise, max(0, n - n_rev))
        batch = {
            k: np.stack([s[k] for s in samples])
            for k in ("wav", "feat", "speed_idx", "label")
            if k in samples[0]
        }
        if n_rev or n_noise:
            batch["rir"] = (
                np.stack([s["rir"] for s in samples[:n_rev]])
                if n_rev
                else np.zeros((0, self.cfg.rir_max_samples), np.float32)
            )
            noise_rows = samples[n_rev : n_rev + n_noise]
            batch["noise"] = (
                np.stack([s["noise"] for s in noise_rows])
                if n_noise
                else np.zeros((0, self.chunk_samples), np.float32)
            )
            batch["snr"] = np.asarray(
                [s["snr"] for s in noise_rows], np.float32
            )
        return batch


class PrefetchPipeline:
    """Multi-worker prefetching train loader (the reference's
    `DataLoader(num_workers=N, prefetch_factor=...)` role,
    reference bin/train.py dataloader_args).

    N worker threads each run a TrainPipeline over the `[worker::N]`
    stripe of this rank's list (shard_list_for_rank, identical striping
    to the reference DistributedSampler+worker split) and fill their own
    bounded queue; consumption is ROUND-ROBIN over workers, so the batch
    order is a pure function of (seed, epoch, N) — deterministic and
    resume-exact regardless of thread timing.  Wav decode runs in the
    native C decoder (GIL released), so threads scale on real cores.
    """

    _END = object()

    def __init__(
        self,
        data_list: Sequence[str],
        spk2id: Dict[str, int],
        cfg: TrainPipelineConfig = TrainPipelineConfig(),
        reverb_store: Optional[AugStore] = None,
        noise_store: Optional[AugStore] = None,
        rank: int = 0,
        world_size: int = 1,
        num_workers: int = 4,
        prefetch: int = 4,
    ):
        self.num_workers = max(1, num_workers)
        self.prefetch = max(1, prefetch)
        self.workers = [
            TrainPipeline(
                data_list, spk2id, cfg, reverb_store, noise_store,
                rank=rank, world_size=world_size,
                worker=w, num_workers=self.num_workers,
            )
            for w in range(self.num_workers)
        ]
        # uniform surface with TrainPipeline for bin/train
        w0 = self.workers[0]
        self.cfg = w0.cfg
        self.spk2id = w0.spk2id
        self.chunk_samples = w0.chunk_samples
        self.input_samples = w0.input_samples
        self.aug_counts = w0.aug_counts

    def set_epoch(self, epoch: int) -> None:
        for w in self.workers:
            w.set_epoch(epoch)

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        import queue as queue_mod
        import threading

        # bind exception classes locally: during interpreter shutdown the
        # queue module globals may already be cleared when a suspended
        # generator's finally-block runs
        QueueFull, QueueEmpty = queue_mod.Full, queue_mod.Empty
        qs = [queue_mod.Queue(maxsize=self.prefetch) for _ in self.workers]
        stop = threading.Event()

        def feed(pipe, q):
            err = None
            try:
                for b in pipe:
                    while not stop.is_set():
                        try:
                            q.put(b, timeout=0.2)
                            break
                        except QueueFull:
                            continue
                    if stop.is_set():
                        return
            except BaseException as e:  # surfaced in the consumer
                err = e
            finally:
                # non-blocking end marker: during teardown the consumer no
                # longer drains, and a blocking put here would wedge the
                # thread (and join) forever
                while not stop.is_set():
                    try:
                        q.put((self._END, err), timeout=0.2)
                        break
                    except QueueFull:
                        continue

        threads = [
            threading.Thread(target=feed, args=(p, q), daemon=True)
            for p, q in zip(self.workers, qs)
        ]
        for t in threads:
            t.start()
        try:
            from collections import deque

            live = deque(range(self.num_workers))
            while live:
                w = live[0]
                b = qs[w].get()
                if isinstance(b, tuple) and len(b) == 2 and b[0] is self._END:
                    if b[1] is not None:
                        # a crashed feeder must fail the epoch loudly, not
                        # silently shrink the dataset by 1/num_workers
                        raise RuntimeError(
                            f"prefetch worker {w} failed"
                        ) from b[1]
                    live.popleft()  # exhausted: next worker keeps the turn
                    continue
                yield b
                live.rotate(-1)
        finally:
            stop.set()
            # drain so feeders blocked on put() can observe stop and exit;
            # keep draining until each thread is gone (a feeder may re-fill
            # the queue once between a single drain and its stop check)
            for q, t in zip(qs, threads):
                deadline = 50  # x0.1s = 5s per worker max
                while t.is_alive() and deadline > 0:
                    try:
                        while True:
                            q.get_nowait()
                    except QueueEmpty:
                        pass
                    t.join(timeout=0.1)
                    deadline -= 1


class NativeTrainPipeline:
    """TrainPipeline surface over the deterministic C++ loader.

    Decode + filter + chunk + speed-draw + batch assembly run in C++
    threads (no GIL), the reference's FeaturePipeline/ThreadPool role
    (runtime/core/frontend); python only draws the small packed-aug rows
    (rir/noise/snr) per batch.  Batch composition is deterministic for
    any thread count (reorder-window emission, data/native/loader.cc
    Loader2), so step-exact resume holds.  Sample ORDER differs from the
    python TrainPipeline (full-permutation shuffle vs bounded-buffer
    streaming shuffle; a strictly stronger shuffle) — both are valid
    realizations of the reference's sampling distribution.

    Raw JSONL lists use the reorder-window Loader2; tar-shard lists use
    the shard-striped Loader3 (per-worker bounded-buffer shuffle,
    round-robin batch emission — also deterministic; plain or gzip
    tars).  Entries with VAD
    crops, zstd/xz shards, or unpacked-aug/unshuffled/keep-last
    configs need the python pipeline (bin/train falls back
    automatically).
    """

    def __init__(
        self,
        data_list: Sequence[str],
        spk2id: Dict[str, int],
        cfg: TrainPipelineConfig = TrainPipelineConfig(),
        reverb_store: Optional[AugStore] = None,
        noise_store: Optional[AugStore] = None,
        rank: int = 0,
        world_size: int = 1,
        num_threads: int = 8,
    ):
        from .native_loader import (
            DeterministicNativeLoader,
            DeterministicNativeShardLoader,
        )

        if cfg.data_type not in ("raw", "shard"):
            # 'feat' (kaldi-ark features) stays on the python pipeline:
            # ark decode is a cheap seek+read, not the decode bottleneck
            # the native loaders exist for
            raise ValueError(
                f"data_type {cfg.data_type!r} needs the python pipeline"
            )
        if not cfg.packed_aug and (reverb_store or noise_store):
            # the unpacked per-row aug layout is python-pipeline only;
            # proceeding would silently train WITHOUT reverb/noise
            raise ValueError(
                "native pipeline requires packed_aug with aug stores"
            )
        if not cfg.shuffle:
            raise ValueError(
                "native pipeline always shuffles (full permutation); "
                "shuffle=false needs the python pipeline"
            )
        if not cfg.drop_last:
            raise ValueError(
                "native pipeline drops the last partial batch; "
                "drop_last=false needs the python pipeline"
            )
        self.cfg = cfg
        self.spk2id = spk2id
        self.reverb_store = reverb_store
        self.noise_store = noise_store
        self.rank = rank
        self.epoch = 0
        self.chunk_samples = chunk_samples_for_frames(
            cfg.num_frms, cfg.frame_shift_ms, cfg.frame_length_ms,
            cfg.sample_rate,
        )
        self.input_samples = (
            speed_input_len(self.chunk_samples)
            if cfg.speed_perturb
            else self.chunk_samples
        )
        self.aug_counts = TrainPipeline._compute_aug_counts(self)

        min_samp = int(
            cfg.filter_min_frames * cfg.frame_shift_ms / 1000 * cfg.sample_rate
        )
        max_samp = int(
            cfg.filter_max_frames * cfg.frame_shift_ms / 1000 * cfg.sample_rate
        )
        num_spks = len(spk2id) if cfg.speed_perturb else 0
        if cfg.data_type == "shard":
            # the C++ tar reader streams plain, gzip (zlib) and — when
            # the .so was built against libzstd — zstd tars.  Unsupported
            # compressions would decode to an empty stream, so probe
            # magics up front and raise — bin/train then falls back to
            # the python pipeline
            from .native_loader import native_zstd_available

            unsupported = [(0xFD, 0x37)]  # xz — never native
            if not native_zstd_available():
                unsupported.append((0x28, 0xB5))
            for sp in data_list:
                with open(sp, "rb") as f:
                    magic = f.read(2)
                if len(magic) == 2 and (magic[0], magic[1]) in unsupported:
                    raise ValueError(
                        f"compressed shard {sp!r}: this native tar reader "
                        "build handles plain/gzip"
                        + ("/zstd" if native_zstd_available() else "")
                        + " tars only (python pipeline handles the rest)"
                    )
            # tar shards: shard-striped C++ worker pool + per-worker
            # bounded-buffer shuffle, round-robin batch emission (Loader3)
            self._loader = DeterministicNativeShardLoader(
                list(data_list), spk2id,
                chunk_samples=self.input_samples,
                batch_size=cfg.batch_size,
                num_spks=num_spks,
                min_samples=min_samp,
                max_samples=max_samp,
                shuffle_size=cfg.shuffle_size,
                seed=cfg.seed,
                num_threads=num_threads,
                rank=rank,
                world_size=world_size,
            )
        else:
            paths, labels = [], []
            for line in data_list:
                obj = json.loads(line)
                if "vad" in obj:
                    raise ValueError(
                        "VAD-cropped entries need the python pipeline"
                    )
                spk = obj.get("spk", "")
                if spk not in spk2id:
                    continue
                paths.append(obj["wav"])
                labels.append(spk2id[spk])
            self._loader = DeterministicNativeLoader(
                paths, labels,
                chunk_samples=self.input_samples,
                batch_size=cfg.batch_size,
                num_spks=num_spks,
                min_samples=min_samp,
                max_samples=max_samp,
                seed=cfg.seed,
                num_threads=num_threads,
                rank=rank,
                world_size=world_size,
            )

    def set_epoch(self, epoch: int) -> None:
        self.epoch = epoch

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        cfg = self.cfg
        n_rev, n_noise = self.aug_counts
        nprng = np.random.default_rng(
            cfg.seed + 1000 * self.epoch + self.rank
        )
        rng = random.Random(cfg.seed + 77 * self.epoch + self.rank)
        for wav, label, speed in self._loader.epoch(self.epoch):
            batch = {"wav": wav, "label": label}
            if cfg.speed_perturb:
                batch["speed_idx"] = speed
            if n_rev:
                rir = np.zeros((n_rev, cfg.rir_max_samples), np.float32)
                for i in range(n_rev):
                    _, r = self.reverb_store.random_one(nprng)
                    r = np.asarray(r, np.float32)[: cfg.rir_max_samples]
                    rir[i, : len(r)] = r
                batch["rir"] = rir
            elif n_noise:
                batch["rir"] = np.zeros(
                    (0, cfg.rir_max_samples), np.float32
                )
            if n_noise:
                noise = np.empty((n_noise, self.chunk_samples), np.float32)
                snr = np.empty((n_noise,), np.float32)
                for i in range(n_noise):
                    key, nz = self.noise_store.random_one(nprng)
                    noise[i] = _random_chunk(
                        np.asarray(nz, np.float32), self.chunk_samples, rng
                    )
                    lo, hi = snr_range_for_key(key)
                    snr[i] = rng.uniform(lo, hi)
                batch["noise"] = noise
                batch["snr"] = snr
            elif n_rev:
                batch["noise"] = np.zeros(
                    (0, self.chunk_samples), np.float32
                )
                batch["snr"] = np.zeros((0,), np.float32)
            yield batch
        failures = self._loader.decode_failures()
        if failures:
            import logging

            logging.getLogger("data").warning(
                "native loader: %d item(s) skipped (wavs the C parser "
                "cannot decode, or compressed/unreadable shards) — "
                "unusual formats need the python pipeline "
                "(num_workers: 0)", failures,
            )

    def close(self):
        self._loader.close()


class EvalPipeline:
    """Whole-utterance extraction batches with length bucketing.

    The reference extracts with batch=1 to avoid padding
    (local/extract_vox.sh:31-33); here utterances are bucketed to a small
    set of padded lengths (powers-of-two frames) so XLA compiles a handful
    of shapes and pooling masks keep results exact.

    Utterances longer than the largest base bucket are NOT cropped: the
    bucket set extends by doubling (6400, 12800, ... frames) up to
    `max_bucket_frames`, with the per-bucket batch size shrunk
    proportionally so batch x frames stays bounded.  Each extended bucket
    is a new compiled shape — a one-time cost paid only when the eval set
    actually contains such utterances (matches the reference's
    whole-utterance batch=1 semantics).  Only past `max_bucket_frames`
    (default ~8.5 min) is audio cropped, with a warning.
    """

    def __init__(
        self,
        data_list: Sequence[str],
        data_type: str = "raw",
        batch_size: int = 32,
        bucket_frames: Sequence[int] = (200, 400, 800, 1600, 3200),
        frame_shift_ms: float = 10.0,
        frame_length_ms: float = 25.0,
        sample_rate: int = 16000,
        extend_buckets: bool = True,
        max_bucket_frames: int = 51200,
    ):
        self.data_list = list(data_list)
        self.data_type = data_type
        self.batch_size = batch_size
        if data_type == "feat":
            # precomputed features: bucket units are FRAMES, not samples
            self.bucket_samples = list(bucket_frames)
            self.max_bucket_samples = max_bucket_frames
        else:
            self.bucket_samples = [
                chunk_samples_for_frames(
                    b, frame_shift_ms, frame_length_ms, sample_rate
                )
                for b in bucket_frames
            ]
            self.max_bucket_samples = chunk_samples_for_frames(
                max_bucket_frames, frame_shift_ms, frame_length_ms, sample_rate
            )
        self.extend_buckets = extend_buckets

    def _bucket_for(self, n: int) -> int:
        for b in self.bucket_samples:
            if n <= b:
                return b
        b = self.bucket_samples[-1]
        if not self.extend_buckets:
            return b
        while n > b and b < self.max_bucket_samples:
            b = min(b * 2, self.max_bucket_samples)
        return b

    def _batch_for(self, bucket: int) -> int:
        """Shrink batch for extended buckets so batch x samples stays
        bounded by batch_size x largest-base-bucket."""
        base = self.bucket_samples[-1]
        if bucket <= base:
            return self.batch_size
        return max(1, self.batch_size * base // bucket)

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        is_feat = self.data_type == "feat"
        it = {
            "shard": iter_tar_shards,
            "feat": iter_feat_list,
        }.get(self.data_type, iter_raw_list)(self.data_list)
        buckets: Dict[int, List[dict]] = {}
        for s in it:
            x = s["feat"] if is_feat else s["wav"]
            b = self._bucket_for(len(x))
            if len(x) > b:  # only past max_bucket_samples
                import logging

                logging.warning(
                    "cropping %s from %d to %d %s (max_bucket_frames)",
                    s["key"], len(x), b,
                    "frames" if is_feat else "samples",
                )
                x = x[:b]
            buckets.setdefault(b, []).append(
                {"key": s["key"], "x": x, "length": len(x)}
            )
            if len(buckets[b]) >= self._batch_for(b):
                yield self._collate(buckets.pop(b), b)
        for b, samples in buckets.items():
            if samples:
                yield self._collate(samples, b)

    def _collate(self, samples: List[dict], bucket: int) -> Dict[str, np.ndarray]:
        n = len(samples)
        lengths = np.zeros((n,), np.int32)
        if self.data_type == "feat":
            dim = samples[0]["x"].shape[1]
            feat = np.zeros((n, bucket, dim), np.float32)
            for i, s in enumerate(samples):
                feat[i, : s["length"]] = s["x"]
                lengths[i] = s["length"]
            return {
                "feat": feat,
                "feat_length": lengths,
                "keys": [s["key"] for s in samples],
            }
        wav = np.zeros((n, bucket), np.float32)
        for i, s in enumerate(samples):
            wav[i, : s["length"]] = s["x"]
            lengths[i] = s["length"]
        return {
            "wav": wav,
            "length": lengths,
            "keys": [s["key"] for s in samples],
        }
