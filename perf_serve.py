"""Serving-path benchmark: HTTP micro-batching embedding server on TPU.

Measures what the reference publishes for its Triton deployment
(runtime/server): end-to-end client-observed latency percentiles and
aggregate throughput of `bin/serve.py`'s /embed endpoint under
concurrent load, wav-bytes in -> embedding out (decode + fbank + CMN +
backbone on the chip, micro-batched across clients).

Run: python perf_serve.py [n_clients] [seconds_per_utt] [duration_s]
Prints JSON lines with latency percentiles and audio-s/s.
"""

import io
import json
import struct
import sys
import threading
import time
import urllib.request
import wave

import numpy as np


def make_model_dir(root):
    import os

    import jax
    import jax.numpy as jnp

    from wespeaker_hubert_tpu.bin.train import build_speaker_net
    from wespeaker_hubert_tpu.utils.checkpoint import save_checkpoint
    from wespeaker_hubert_tpu.utils.config import dump_config

    os.makedirs(root, exist_ok=True)
    config = {
        "model": "ECAPA_TDNN_c512",
        "model_args": {"feat_dim": 80, "embed_dim": 192},
        "dataset_args": {"fbank_args": {"num_mel_bins": 80}},
    }
    net = build_speaker_net(config, num_class=2)
    variables = net.init(
        jax.random.key(0), jnp.zeros((1, 100, 80)),
        jnp.zeros((1,), jnp.int32), 0.0, train=False,
    )
    dump_config(config, root + "/config.yaml")
    save_checkpoint(root + "/avg_model.ckpt", {
        "params": variables["params"],
        "batch_stats": variables.get("batch_stats", {}),
    })
    return root


def wav_bytes(x, sr=16000):
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes(
            np.clip(x * 32768, -32768, 32767).astype("<i2").tobytes()
        )
    return buf.getvalue()


def main():
    n_clients = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    utt_s = float(sys.argv[2]) if len(sys.argv) > 2 else 3.0
    duration = float(sys.argv[3]) if len(sys.argv) > 3 else 20.0

    from http.server import ThreadingHTTPServer

    from wespeaker_hubert_tpu.bin.serve import EmbeddingService, _make_handler

    root = make_model_dir("/tmp/serve_bench_model")
    service = EmbeddingService(root, max_batch=32, batch_window_ms=25.0)
    httpd = ThreadingHTTPServer(("127.0.0.1", 0), _make_handler(service))
    port = httpd.server_address[1]
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    url = f"http://127.0.0.1:{port}/embed"

    rng = np.random.default_rng(0)
    payload = wav_bytes(rng.standard_normal(int(utt_s * 16000)) * 0.1)

    # warm the compiled path
    urllib.request.urlopen(
        urllib.request.Request(url, data=payload), timeout=120
    ).read()

    lat = []
    done = []
    stop = time.time() + duration
    lock = threading.Lock()

    def client():
        n = 0
        while time.time() < stop:
            t0 = time.perf_counter()
            r = urllib.request.urlopen(
                urllib.request.Request(url, data=payload), timeout=120
            )
            r.read()
            dt = time.perf_counter() - t0
            with lock:
                lat.append(dt)
            n += 1
        with lock:
            done.append(n)

    threads = [threading.Thread(target=client) for _ in range(n_clients)]
    t0 = time.perf_counter()
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.perf_counter() - t0

    lat_ms = np.sort(np.asarray(lat)) * 1e3
    total = int(sum(done))
    print(json.dumps({
        "metric": "serve_embed_ecapa_c512",
        "clients": n_clients,
        "utt_seconds": utt_s,
        "requests": total,
        "req_per_s": round(total / wall, 1),
        "audio_s_per_s": round(total * utt_s / wall, 1),
        "p50_ms": round(float(np.percentile(lat_ms, 50)), 1),
        "p95_ms": round(float(np.percentile(lat_ms, 95)), 1),
        "p99_ms": round(float(np.percentile(lat_ms, 99)), 1),
    }))
    httpd.shutdown()
    service.close()


if __name__ == "__main__":
    main()
