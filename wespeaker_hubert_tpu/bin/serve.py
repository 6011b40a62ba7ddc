"""Batch embedding server — the TPU-native stand-in for the reference's
Triton GPU serving stack (reference: runtime/server/x86_gpu model_repo
with kaldifeat feature extractor + TensorRT speaker model ensemble).

Design: a stdlib HTTP server whose worker threads enqueue requests into a
micro-batching queue; a single device thread drains up to `max_batch`
requests every `batch_window_ms` and runs the CHUNKED fixed-shape
embedding path (train/chunked.py — one compiled shape regardless of
utterance length, the serving property the reference gets from its
198-frame C++ SpeakerEngine).  Endpoints:

  POST /embed        body: WAV bytes            -> {"embedding": [...]}
  POST /similarity   body: WAV||WAV (multipart boundary b"--8<--")
                                                -> {"similarity": s}
  GET  /stats                                   -> throughput counters

KServe-v2 (Triton HTTP) protocol, so clients written against the
reference's Triton server (runtime/server/x86_gpu client.py) can point
here unchanged:

  GET  /v2/health/live | /v2/health/ready       -> 200
  GET  /v2/models/<name>                        -> model metadata
  POST /v2/models/<name>/infer
       {"inputs": [{"name": "WAV", "shape": [1, N], "datatype": "FP32",
                    "data": [...]}]}
       -> {"outputs": [{"name": "EMB", "shape": [1, D],
                        "datatype": "FP32", "data": [...]}]}
"""

from __future__ import annotations

import json
import queue
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import List, Optional, Tuple

import numpy as np

__all__ = ["EmbeddingService", "serve"]

BOUNDARY = b"--8<--"


class EmbeddingService:
    """Micro-batching wrapper around a Speaker model directory."""

    def __init__(
        self,
        model_dir: str,
        max_batch: int = 16,
        batch_window_ms: float = 5.0,
        max_seconds: float = 30.0,
        chunk_frames: int = 198,
        bf16: bool = True,
        warm_diarize: bool = True,
    ):
        import jax.numpy as jnp

        from ..cli.speaker import Speaker
        from ..train.chunked import make_chunked_embed
        from ..utils.observability import ThroughputMeter

        self.speaker = Speaker(model_dir)
        self.max_batch = max_batch
        self.window = batch_window_ms / 1000.0
        self.max_samples = int(max_seconds * self.speaker.resample_rate)
        # length buckets: each batch pads to the smallest bucket covering
        # its longest utterance, so host->device transfer and compute
        # scale with actual audio length instead of max_seconds (one
        # compiled shape per bucket, same policy as EvalPipeline)
        sr = self.speaker.resample_rate
        self.buckets = []
        s = 2.0
        while s < max_seconds:
            self.buckets.append(int(s * sr))
            s *= 2
        self.buckets.append(self.max_samples)
        self._compute_dtype = jnp.bfloat16 if bf16 else None
        self._variables = self.speaker.variables
        if bf16:
            from ..train import cast_variables_bf16

            self._variables = cast_variables_bf16(self._variables)
        self._embed = make_chunked_embed(
            self.speaker.net, self.speaker.fbank_cfg, chunk_frames,
            compute_dtype=self._compute_dtype,
        )
        # compile every bucket shape up front: a lazily-compiled bucket
        # would stall the single batch thread (and every queued client)
        # for the whole XLA compile the first time that length appears
        for b in self.buckets:
            self._embed(
                self._variables,
                {
                    "wav": jnp.zeros((self.max_batch, b), jnp.float32),
                    "length": jnp.full((self.max_batch,), b, jnp.int32),
                },
            ).block_until_ready()
        if warm_diarize:
            # same policy for the /diarize path: compile its VAD, fbank
            # buckets and window-embedding programs now, not under the
            # first request's lock
            self.speaker.warm_diarize(max_seconds)
        self.meter = ThroughputMeter()
        # /diarize gets its own counters: mixing it into the micro-batch
        # meter would corrupt the embed-path rtf/audio_seconds_per_s
        self.diar_meter = ThroughputMeter()
        self.embed_dim = int(
            self.speaker.net.backbone.embed_dim
            if hasattr(self.speaker.net.backbone, "embed_dim") else -1
        )
        self._q: "queue.Queue[Tuple[np.ndarray, queue.Queue]]" = queue.Queue()
        self._stop = False
        self._worker = threading.Thread(target=self._loop, daemon=True)
        self._worker.start()
        # /diarize micro-batching: concurrent requests pool into ONE
        # diarize_pcm_batch call (per-conversation results bit-identical
        # to the sequential path — tests/test_diar_batch.py), the same
        # cross-request pooling the reference's Triton diarization
        # ensemble gets from dynamic batching
        self.diar_max_batch = 8
        self._diar_window = max(self.window, 0.02)
        self._diar_q: "queue.Queue[Tuple[np.ndarray, str, queue.Queue]]" = (
            queue.Queue()
        )
        self._diar_worker = threading.Thread(
            target=self._diar_loop, daemon=True
        )
        self._diar_worker.start()

    # ------------------------------------------------------------- device
    def _loop(self):
        import jax.numpy as jnp

        variables = self._variables
        while not self._stop:
            try:
                first = self._q.get(timeout=0.1)
            except queue.Empty:
                continue
            batch: List[Tuple[np.ndarray, queue.Queue]] = [first]
            deadline = time.perf_counter() + self.window
            while len(batch) < self.max_batch:
                remaining = deadline - time.perf_counter()
                if remaining <= 0:
                    break
                try:
                    batch.append(self._q.get(timeout=remaining))
                except queue.Empty:
                    break

            n = len(batch)
            longest = max(len(w) for w, _ in batch)
            bucket = next(
                b for b in self.buckets if b >= min(longest, self.max_samples)
            )
            wav = np.zeros((self.max_batch, bucket), np.float32)
            lengths = np.zeros((self.max_batch,), np.int32)
            for i, (w, _) in enumerate(batch):
                w = w[: self.max_samples]
                wav[i, : len(w)] = w
                lengths[i] = len(w)
            emb = np.asarray(
                self._embed(
                    variables,
                    {"wav": jnp.asarray(wav), "length": jnp.asarray(lengths)},
                )
            )
            audio_s = float(lengths[:n].sum()) / self.speaker.resample_rate
            self.meter.update(audio_s, n)
            for i, (_, out_q) in enumerate(batch):
                out_q.put(emb[i])

    # --------------------------------------------------------------- api
    def embed_wav_bytes(self, data: bytes) -> np.ndarray:
        from ..data.wav_io import read_wav_bytes

        wav, sr = read_wav_bytes(data)
        assert sr == self.speaker.resample_rate, f"sample rate {sr}"
        return self.embed_samples(wav)

    def embed_samples(self, wav: np.ndarray) -> np.ndarray:
        """Embed raw float32 samples at the model sample rate."""
        out_q: queue.Queue = queue.Queue()
        self._q.put((np.asarray(wav, np.float32).reshape(-1), out_q))
        return out_q.get(timeout=60)

    def similarity(self, a: bytes, b: bytes) -> float:
        e1 = self.embed_wav_bytes(a)
        e2 = self.embed_wav_bytes(b)
        return self.speaker.cosine_similarity(e1, e2)

    def _diar_loop(self):
        while not self._stop:
            try:
                first = self._diar_q.get(timeout=0.1)
            except queue.Empty:
                continue
            batch = [first]
            deadline = time.perf_counter() + self._diar_window
            while len(batch) < self.diar_max_batch:
                remaining = deadline - time.perf_counter()
                if remaining <= 0:
                    break
                try:
                    batch.append(self._diar_q.get(timeout=remaining))
                except queue.Empty:
                    break
            wavs = [w for w, _, _ in batch]
            utts = [u for _, u, _ in batch]
            try:
                outs = self.speaker.diarize_pcm_batch(wavs, utts=utts)
                results = [(True, o) for o in outs]
            except Exception as e:  # propagate to every waiting client
                results = [(False, e)] * len(batch)
            for (_, _, out_q), res in zip(batch, results):
                out_q.put(res)

    def diarize_wav_bytes(self, data: bytes, utt: str = "unk"):
        """Full diarization of one wav: VAD -> subsegment embeddings ->
        clustering -> merged (utt, begin, end, speaker) segments — the
        reference's diarization_gpu Triton ensemble role
        (runtime/server/diarization_gpu/model_repo/run/1/model.py: BLS
        over SAD + chunking + embedding + clusterer -> LABELS).
        Concurrent requests micro-batch through diarize_pcm_batch (one
        pooled VAD/fbank/embedding device schedule), bit-identical per
        conversation to the sequential path."""
        from ..data.wav_io import read_wav_bytes

        wav, sr = read_wav_bytes(data)
        assert sr == self.speaker.resample_rate, f"sample rate {sr}"
        return self.diarize_samples(wav, utt=utt)

    def features_samples(self, wav: np.ndarray) -> np.ndarray:
        """Kaldi fbank + per-utterance CMN -> (T, num_mel_bins): the
        'feature_extractor' KServe model (reference x86_gpu model_repo
        feature_extractor/1/model.py — kaldifeat fbank then mean
        subtraction over time).  Pow2-bucketed, one compiled program per
        bucket."""
        import jax
        import jax.numpy as jnp

        from ..ops.fbank import fbank
        from ..ops.feature_utils import apply_cmvn

        wav = np.asarray(wav, np.float32).reshape(-1)[: self.max_samples]
        n = len(wav)
        bucket = next(
            (b for b in self.buckets if b >= n), self.max_samples
        )
        if not hasattr(self, "_feat_fns"):
            self._feat_fns = {}
        if bucket not in self._feat_fns:
            cfg = self.speaker.fbank_cfg

            @jax.jit
            def _fn(w, length):
                feats, lens = fbank(w[None], cfg, lengths=length[None])
                feats = apply_cmvn(feats, lengths=lens)
                return feats[0], lens[0]

            self._feat_fns[bucket] = _fn
        w = np.zeros((bucket,), np.float32)
        w[:n] = wav
        feats, t = self._feat_fns[bucket](
            jnp.asarray(w), jnp.asarray(n, jnp.int32)
        )
        return np.asarray(feats)[: int(t)]

    def embed_feats_samples(self, feats: np.ndarray) -> np.ndarray:
        """(T, num_mel_bins) features -> embedding: the 'speaker_model'
        KServe model (reference x86_gpu speaker_model TensorRT role —
        consumes feature_extractor's CMN'd fbank).  Pow2-bucketed T with
        a validity mask; the eval path re-applies mean-CMN, a no-op on
        already-CMN'd input."""
        import jax.numpy as jnp

        from ..train import make_eval_embed

        feats = np.asarray(feats, np.float32)
        if feats.ndim == 3:
            feats = feats[0]
        t, f = feats.shape
        bucket = max(128, 1 << max(t - 1, 1).bit_length())
        if not hasattr(self, "_feats_embed_fn"):
            self._feats_embed_fn = make_eval_embed(
                self.speaker.net, compute_dtype=self._compute_dtype
            )
        n = min(t, bucket)
        pad = np.zeros((1, bucket, f), np.float32)
        pad[0, :n] = feats[:n]
        emb = self._feats_embed_fn(
            self._variables,
            {"feat": jnp.asarray(pad),
             "feat_length": jnp.asarray([n], jnp.int32)},
        )
        return np.asarray(emb)[0]

    def diarize_samples(self, wav: np.ndarray, utt: str = "unk"):
        """Diarize raw float32 samples through the micro-batch queue
        (gRPC 'run' model + HTTP /diarize both land here)."""
        out_q: queue.Queue = queue.Queue()
        self._diar_q.put((np.asarray(wav, np.float32).reshape(-1), utt,
                          out_q))
        ok, payload = out_q.get(timeout=600)
        if not ok:
            raise payload
        self.diar_meter.update(len(wav) / self.speaker.resample_rate, 1)
        return payload

    def stats(self) -> dict:
        t = self.meter.totals()
        t["audio_seconds_per_s"] = self.meter.audio_seconds_per_s
        t["rtf"] = self.meter.rtf
        d = self.diar_meter.totals()
        d["audio_seconds_per_s"] = self.diar_meter.audio_seconds_per_s
        d["rtf"] = self.diar_meter.rtf
        t["diarization"] = d
        return t

    def close(self):
        self._stop = True
        self._worker.join(timeout=2)
        self._diar_worker.join(timeout=2)


def _make_handler(service: EmbeddingService):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *args):
            pass

        def _json(self, code, obj):
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/stats":
                self._json(200, service.stats())
            elif self.path in ("/v2/health/live", "/v2/health/ready", "/v2"):
                self._json(200, {})
            elif self.path.startswith("/v2/models/"):
                name = self.path[len("/v2/models/"):].split("/")[0]
                if name in ("run", "diarization"):
                    # diarization BLS model (reference diarization_gpu
                    # ensemble protocol)
                    self._json(200, {
                        "name": name,
                        "platform": "jax_xla",
                        "inputs": [{"name": "input", "datatype": "FP32",
                                    "shape": [1, -1]}],
                        "outputs": [{"name": "LABELS", "datatype": "FP32",
                                     "shape": [-1, 3]}],
                    })
                    return
                if name == "feature_extractor":
                    # reference x86_gpu feature_extractor contract:
                    # wav FP32 [-1] -> speech FP32 [-1, num_mel_bins]
                    nm = int(service.speaker.fbank_cfg.num_mel_bins)
                    self._json(200, {
                        "name": name,
                        "platform": "jax_xla",
                        "inputs": [{"name": "wav", "datatype": "FP32",
                                    "shape": [1, -1]}],
                        "outputs": [{"name": "speech", "datatype": "FP32",
                                     "shape": [-1, nm]}],
                    })
                    return
                if name == "speaker_model":
                    # reference x86_gpu speaker_model contract:
                    # feats FP32 [-1, num_mel] -> embs FP32 [embed_dim]
                    nm = int(service.speaker.fbank_cfg.num_mel_bins)
                    self._json(200, {
                        "name": name,
                        "platform": "jax_xla",
                        "inputs": [{"name": "feats", "datatype": "FP32",
                                    "shape": [-1, nm]}],
                        "outputs": [{"name": "embs", "datatype": "FP32",
                                     "shape": [service.embed_dim]}],
                    })
                    return
                self._json(200, {
                    "name": name,
                    "platform": "jax_xla",
                    "inputs": [{"name": "WAV", "datatype": "FP32",
                                "shape": [1, -1]}],
                    "outputs": [{"name": "EMBEDDINGS", "datatype": "FP32",
                                 "shape": [1, service.embed_dim]}],
                })
            else:
                self._json(404, {"error": "unknown path"})

        def do_POST(self):
            n = int(self.headers.get("Content-Length", 0))
            data = self.rfile.read(n)
            try:
                if self.path == "/embed":
                    emb = service.embed_wav_bytes(data)
                    self._json(200, {"embedding": emb.tolist()})
                elif self.path.startswith("/v2/models/") and self.path.endswith(
                    "/infer"
                ):
                    req = json.loads(data)
                    model = self.path.split("/")[3]
                    tensors = {t["name"]: t for t in req.get("inputs", [])}
                    if model in ("run", "diarization"):
                        if "input" not in tensors:
                            raise ValueError("missing input tensor 'input'")
                        wav = np.asarray(
                            tensors["input"]["data"], np.float32
                        ).reshape(-1)
                        segs = service.diarize_samples(wav)
                        rows = [[float(b), float(e), float(s)]
                                for (_u, b, e, s) in segs]
                        self._json(200, {
                            "model_name": model,
                            "outputs": [{
                                "name": "LABELS",
                                "datatype": "FP32",
                                "shape": [len(rows), 3],
                                "data": [x for r in rows for x in r],
                            }],
                        })
                        return
                    if model == "feature_extractor":
                        if "wav" not in tensors:
                            raise ValueError("missing input tensor 'wav'")
                        wav = np.asarray(
                            tensors["wav"]["data"], np.float32
                        ).reshape(-1)
                        feats = service.features_samples(wav)
                        self._json(200, {
                            "model_name": model,
                            "outputs": [{
                                "name": "speech",
                                "datatype": "FP32",
                                "shape": [int(feats.shape[0]),
                                          int(feats.shape[1])],
                                "data": [float(x) for x in feats.ravel()],
                            }],
                        })
                        return
                    if model == "speaker_model":
                        if "feats" not in tensors:
                            raise ValueError(
                                "missing input tensor 'feats'")
                        tf = tensors["feats"]
                        feats = np.asarray(
                            tf["data"], np.float32
                        ).reshape([d for d in tf["shape"] if d != 1]
                                  if len(tf["shape"]) > 2 else tf["shape"])
                        emb = service.embed_feats_samples(feats)
                        self._json(200, {
                            "model_name": model,
                            "outputs": [{
                                "name": "embs",
                                "datatype": "FP32",
                                "shape": [int(emb.shape[-1])],
                                "data": [float(x) for x in emb.ravel()],
                            }],
                        })
                        return
                    if "WAV" not in tensors:
                        raise ValueError("missing input tensor 'WAV'")
                    wav = np.asarray(
                        tensors["WAV"]["data"], np.float32
                    ).reshape(-1)
                    emb = service.embed_samples(wav)
                    # honor the requested output name (reference Triton
                    # clients read back "EMBEDDINGS"; older clients of
                    # this server used "EMB")
                    reqs = req.get("outputs", [])
                    oname = (reqs[0].get("name") if reqs
                             else "EMBEDDINGS") or "EMBEDDINGS"
                    self._json(200, {
                        "model_name": model,
                        "outputs": [{
                            "name": oname,
                            "datatype": "FP32",
                            "shape": [1, int(emb.shape[-1])],
                            "data": [float(x) for x in emb.ravel()],
                        }],
                    })
                elif self.path == "/similarity":
                    a, b = data.split(BOUNDARY, 1)
                    self._json(200, {"similarity": service.similarity(a, b)})
                elif self.path == "/diarize":
                    segs = service.diarize_wav_bytes(data)
                    self._json(200, {"segments": [
                        {"utt": u, "begin": b, "end": e, "speaker": s}
                        for u, b, e, s in segs
                    ]})
                else:
                    self._json(404, {"error": "unknown path"})
            except Exception as e:  # noqa: BLE001 — report to client
                self._json(400, {"error": str(e)})

    return Handler


def serve(model_dir: str, host: str = "0.0.0.0", port: int = 8501,
          grpc_port: Optional[int] = None, **kwargs):
    service = EmbeddingService(model_dir, **kwargs)
    grpc_server = None
    if grpc_port:
        # KServe/Triton gRPC endpoint (tritonclient.grpc-compatible wire
        # protocol — the reference's clients speak this,
        # runtime/server/x86_gpu/client/client.py)
        from ..serving.grpc_service import build_grpc_server

        grpc_server = build_grpc_server(service, host=host, port=grpc_port)
        print(f"gRPC (KServe v2) on {host}:{grpc_port}")
    server = ThreadingHTTPServer((host, port), _make_handler(service))
    print(f"serving {model_dir} on {host}:{port}")
    try:
        server.serve_forever()
    finally:
        if grpc_server is not None:
            grpc_server.stop(grace=1.0)


def main():
    import argparse

    p = argparse.ArgumentParser()
    p.add_argument("--model_dir", required=True)
    p.add_argument("--host", default="0.0.0.0")
    p.add_argument("--port", type=int, default=8501)
    p.add_argument("--grpc_port", type=int, default=None,
                   help="also serve the KServe v2 gRPC protocol here")
    p.add_argument("--max_batch", type=int, default=16)
    p.add_argument("--f32", action="store_true",
                   help="disable bf16 inference (default: bf16 on)")
    args = p.parse_args()
    serve(args.model_dir, args.host, args.port, grpc_port=args.grpc_port,
          max_batch=args.max_batch, bf16=not args.f32)


if __name__ == "__main__":
    main()
