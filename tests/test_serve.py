"""Batch server test: train a tiny model, start the HTTP server on a
random port, exercise /embed, /similarity, /stats end to end with
concurrent clients (micro-batching path)."""

import io
import json
import threading
import urllib.error
import urllib.request
from http.server import ThreadingHTTPServer

import numpy as np
import pytest

from wespeaker_hubert_tpu.bin.serve import (
    BOUNDARY,
    EmbeddingService,
    _make_handler,
)


def _wav_bytes(wav, sr=16000):
    import wave

    buf = io.BytesIO()
    pcm = np.clip(wav * 32768, -32768, 32767).astype("<i2")
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes(pcm.tobytes())
    return buf.getvalue()


@pytest.fixture(scope="module")
def server(tmp_path_factory):
    # reuse the CLI fixture recipe: tiny trained model dir
    import json as _json

    from wespeaker_hubert_tpu.bin.average_model import average_model
    from wespeaker_hubert_tpu.bin.train import train
    from wespeaker_hubert_tpu.data import write_wav

    root = tmp_path_factory.mktemp("serve")
    rng = np.random.default_rng(0)
    entries = []
    for spk in range(2):
        for u in range(4):
            key = f"s{spk}u{u}"
            path = str(root / f"{key}.wav")
            write_wav(
                path,
                (rng.standard_normal(20000) * 0.1).clip(-1, 1),
            )
            entries.append({"key": key, "wav": path, "spk": f"s{spk}"})
    with open(root / "train.list", "w") as f:
        for e in entries:
            f.write(_json.dumps(e) + "\n")
    with open(root / "train.label", "w") as f:
        for e in entries:
            f.write(f"{e['key']} {e['spk']}\n")
    exp = str(root / "exp")
    train(
        {
            "exp_dir": exp,
            "model": "ECAPA_TDNN_c512",
            "model_args": {"feat_dim": 40, "embed_dim": 16},
            "projection_args": {"project_type": "arc_margin", "scale": 32.0},
            "dataset_args": {
                "num_frms": 60, "speed_perturb": False, "aug_prob": 0.0,
                "fbank_args": {"num_mel_bins": 40, "dither": 1.0},
                "filter_args": {"min_num_frames": 30},
                "shuffle_args": {"shuffle_size": 8},
            },
            "dataloader_args": {"batch_size": 8},
            "train_data": str(root / "train.list"),
            "train_label": str(root / "train.label"),
            "num_epochs": 1,
            "epoch_iter": 1,
            "save_epoch_interval": 1,
            "scheduler_args": {"initial_lr": 0.05, "final_lr": 0.01,
                               "warm_up_epoch": 1},
            "margin_update": {"initial_margin": 0.0, "final_margin": 0.1,
                              "increase_start_epoch": 1, "fix_start_epoch": 1},
        }
    )
    average_model(exp + "/models", exp + "/avg_model.ckpt", num=1)

    service = EmbeddingService(
        exp, max_batch=4, batch_window_ms=20.0, max_seconds=4.0,
        chunk_frames=60,
    )
    httpd = ThreadingHTTPServer(("127.0.0.1", 0), _make_handler(service))
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    url = f"http://127.0.0.1:{port}"

    class _Server(str):
        pass

    srv = _Server(url)
    srv.service = service
    yield srv
    httpd.shutdown()
    service.close()


def _post(url, data):
    req = urllib.request.Request(url, data=data, method="POST")
    with urllib.request.urlopen(req, timeout=120) as r:
        return json.loads(r.read())


def test_embed_endpoint(server):
    rng = np.random.default_rng(1)
    wav = (rng.standard_normal(16000) * 0.1).astype(np.float32)
    out = _post(server + "/embed", _wav_bytes(wav))
    assert len(out["embedding"]) == 16
    assert all(np.isfinite(out["embedding"]))


def test_similarity_and_concurrent_batching(server):
    rng = np.random.default_rng(2)
    a = _wav_bytes((rng.standard_normal(16000) * 0.1).astype(np.float32))
    b = _wav_bytes((rng.standard_normal(16000) * 0.1).astype(np.float32))

    results = []

    def call():
        out = _post(server + "/similarity", a + BOUNDARY + b)
        results.append(out["similarity"])

    threads = [threading.Thread(target=call) for _ in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert len(results) == 4
    assert all(0.0 <= s <= 1.0 for s in results)
    # identical inputs -> identical scores regardless of batch packing
    assert max(results) - min(results) < 1e-5

    stats = json.loads(
        urllib.request.urlopen(server + "/stats", timeout=30).read()
    )
    assert stats["total_steps"] >= 9  # embeds from both tests


if __name__ == "__main__":
    pytest.main([__file__, "-x", "-q"])


def test_kserve_v2_protocol(server):
    """Triton/KServe-v2 REST endpoints: health, metadata, infer."""
    with urllib.request.urlopen(server + "/v2/health/ready", timeout=30) as r:
        assert r.status == 200
    with urllib.request.urlopen(
        server + "/v2/models/speaker", timeout=30
    ) as r:
        meta = json.loads(r.read())
    assert meta["inputs"][0]["name"] == "WAV"
    assert meta["outputs"][0]["name"] == "EMBEDDINGS"
    assert meta["outputs"][0]["shape"] == [1, 16]

    rng = np.random.default_rng(7)
    wav = (rng.standard_normal(16000) * 0.1).astype(np.float32)
    body = json.dumps({
        "inputs": [{"name": "WAV", "shape": [1, len(wav)],
                    "datatype": "FP32", "data": wav.tolist()}]
    }).encode()
    out = _post(server + "/v2/models/speaker/infer", body)
    emb_t = out["outputs"][0]
    # no requested outputs -> the reference client's name is the default
    assert emb_t["name"] == "EMBEDDINGS"
    assert emb_t["shape"] == [1, 16]
    v2_emb = np.asarray(emb_t["data"], np.float32)

    # must match the plain /embed path on the same audio.  That path
    # round-trips through int16 WAV encoding and the service computes in
    # bf16 by default, so compare as embeddings are consumed: cosine.
    legacy = _post(server + "/embed", _wav_bytes(wav))
    le = np.asarray(legacy["embedding"], np.float32)
    cos = float(
        v2_emb @ le / (np.linalg.norm(v2_emb) * np.linalg.norm(le))
    )
    assert cos > 0.999, cos
    np.testing.assert_allclose(v2_emb, le, rtol=0.05, atol=0.3)

    # malformed: missing WAV tensor -> 400 with an error message
    bad = json.dumps({"inputs": []}).encode()
    req = urllib.request.Request(
        server + "/v2/models/speaker/infer", data=bad, method="POST"
    )
    try:
        urllib.request.urlopen(req, timeout=30)
        raise AssertionError("expected HTTP 400")
    except urllib.error.HTTPError as e:
        assert e.code == 400
        assert "WAV" in json.loads(e.read())["error"]

    # diarization BLS model over REST: model 'run', input 'input' ->
    # LABELS (n, 3) — reference diarization_gpu ensemble protocol
    with urllib.request.urlopen(
        server + "/v2/models/run", timeout=30
    ) as r:
        dmeta = json.loads(r.read())
    assert dmeta["inputs"][0]["name"] == "input"
    assert dmeta["outputs"][0]["name"] == "LABELS"
    t = np.arange(2 * 16000) / 16000
    speech = (np.sin(2 * np.pi * 500 * t) * 0.3).astype(np.float32)
    speech += (rng.standard_normal(len(speech)) * 0.01).astype(np.float32)
    body = json.dumps({
        "inputs": [{"name": "input", "shape": [1, len(speech)],
                    "datatype": "FP32", "data": speech.tolist()}]
    }).encode()
    out = _post(server + "/v2/models/run/infer", body)
    lab = out["outputs"][0]
    assert lab["name"] == "LABELS" and lab["shape"][1] == 3
    exp = server.service.speaker.diarize_pcm(speech, utt="unk")
    want = [x for (_u, b, e, s) in exp for x in (b, e, float(s))]
    assert lab["data"] == pytest.approx(want)

    # feature_extractor model: wav -> kaldi fbank + CMN (reference
    # x86_gpu feature_extractor/1/model.py contract)
    with urllib.request.urlopen(
        server + "/v2/models/feature_extractor", timeout=30
    ) as r:
        fmeta = json.loads(r.read())
    nm = fmeta["outputs"][0]["shape"][1]
    assert fmeta["outputs"][0]["name"] == "speech" and nm == 40
    body = json.dumps({
        "inputs": [{"name": "wav", "shape": [1, len(wav)],
                    "datatype": "FP32", "data": wav.tolist()}]
    }).encode()
    out = _post(server + "/v2/models/feature_extractor/infer", body)
    sp = out["outputs"][0]
    assert sp["name"] == "speech" and sp["shape"][1] == nm
    feats = np.asarray(sp["data"], np.float32).reshape(sp["shape"])
    assert feats.shape[0] > 90  # ~1 s of 10 ms frames
    # per-utterance CMN: time-mean ~ 0 per mel bin
    np.testing.assert_allclose(feats.mean(0), 0.0, atol=1e-4)
    ref_feats = server.service.features_samples(wav)
    np.testing.assert_array_equal(feats, ref_feats.astype(np.float32))

    # speaker_model: feats -> embs (reference x86_gpu TensorRT role);
    # composing the two models reproduces the in-process computation
    body = json.dumps({
        "inputs": [{"name": "feats", "shape": list(feats.shape),
                    "datatype": "FP32",
                    "data": [float(x) for x in feats.ravel()]}]
    }).encode()
    out = _post(server + "/v2/models/speaker_model/infer", body)
    et = out["outputs"][0]
    assert et["name"] == "embs" and et["shape"] == [16]
    emb = np.asarray(et["data"], np.float32)
    want = server.service.embed_feats_samples(feats)
    np.testing.assert_allclose(emb, want, rtol=0, atol=1e-6)
    assert np.isfinite(emb).all()


def test_diarize_endpoint(server):
    """POST /diarize returns merged speaker segments (the reference
    diarization_gpu Triton ensemble role)."""
    rng = np.random.default_rng(3)
    sr = 16000
    # two alternating synthetic "speakers" (distinct sine stacks) with a
    # silence gap so VAD yields at least two segments
    t = np.arange(3 * sr) / sr
    spk_a = np.sin(2 * np.pi * 400 * t) * 0.3
    spk_b = np.sin(2 * np.pi * 950 * t) * 0.3
    silence = np.zeros(sr // 2)
    wav = np.concatenate([spk_a, silence, spk_b]).astype(np.float32)
    wav += rng.standard_normal(len(wav)).astype(np.float32) * 0.01

    out = _post(server + "/diarize", _wav_bytes(wav))
    segs = out["segments"]
    assert segs, "no segments returned"
    for s in segs:
        assert set(s) == {"utt", "begin", "end", "speaker"}
        assert 0.0 <= s["begin"] < s["end"] <= len(wav) / sr + 0.1
    # speech regions are covered (>= half the 6.5s of speech)
    covered = sum(s["end"] - s["begin"] for s in segs)
    assert covered > 3.0, segs

    # diarization audio is metered separately from the embed micro-batches
    stats = json.loads(
        urllib.request.urlopen(server + "/stats", timeout=30).read()
    )
    assert stats["diarization"]["total_steps"] >= 1
    assert stats["diarization"]["total_audio_seconds"] > 3.0

    # the route is an exact match: a prefixed typo is a 404, not a
    # silent (and slow) diarization
    req = urllib.request.Request(
        server + "/diarizeXYZ", data=_wav_bytes(wav), method="POST"
    )
    try:
        urllib.request.urlopen(req, timeout=30)
        raise AssertionError("prefixed path should 404")
    except urllib.error.HTTPError as e:
        assert e.code == 404


def test_diarize_concurrent_micro_batch(server):
    """Concurrent /diarize requests pool into one diarize_pcm_batch call
    and each client still gets exactly the sequential-path segments
    (the pooled schedule is bit-identical per conversation)."""
    from concurrent.futures import ThreadPoolExecutor

    rng = np.random.default_rng(11)
    sr = 16000
    wavs = []
    for i in range(4):
        t = np.arange(2 * sr) / sr
        w = np.sin(2 * np.pi * (300 + 150 * i) * t) * 0.3
        w = (w + rng.standard_normal(len(w)) * 0.01).astype(np.float32)
        wavs.append(w)

    service = server.service
    expected = [service.speaker.diarize_pcm(w, utt="unk") for w in wavs]

    def one(w):
        return _post(server + "/diarize", _wav_bytes(w))["segments"]

    with ThreadPoolExecutor(max_workers=4) as ex:
        results = list(ex.map(one, wavs))
    for got, exp in zip(results, expected):
        want = [
            {"utt": u, "begin": b, "end": e, "speaker": s}
            for (u, b, e, s) in exp
        ]
        assert got == want


def test_grpc_kserve_protocol(server):
    """KServe v2 gRPC endpoint (serving/grpc_service): live/metadata/
    infer over a real insecure channel, raw and typed tensor packings,
    result matching the HTTP /embed path bit-for-bit."""
    pytest.importorskip("grpc")
    from wespeaker_hubert_tpu.serving.grpc_service import (
        GrpcSpeakerClient,
        build_grpc_server,
    )

    service = server.service
    import socket

    with socket.socket() as s:  # probe a free port (grpc has no getter)
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    grpc_server = build_grpc_server(service, host="127.0.0.1", port=port)
    try:
        client = GrpcSpeakerClient(f"127.0.0.1:{port}")
        assert client.server_live()
        meta = client.model_metadata()
        assert meta.outputs[0].name == "EMBEDDINGS"
        rng = np.random.default_rng(3)
        wav = (rng.standard_normal(16000) * 0.1).astype(np.float32)
        emb_raw = client.infer_embedding(wav, raw=True)
        emb_typed = client.infer_embedding(wav, raw=False)
        assert emb_raw.shape == (1, service.embed_dim)
        np.testing.assert_array_equal(emb_raw, emb_typed)
        # parity with the HTTP /embed path (same service, same samples)
        ref = service.embed_samples(wav)
        np.testing.assert_allclose(emb_raw[0], ref, rtol=0, atol=0)

        # diarization BLS role (reference diarization_gpu client
        # protocol: model 'run', input 'input' -> LABELS (n, 3))
        meta = client.model_metadata(name="run")
        assert meta.outputs[0].name == "LABELS"
        assert list(meta.outputs[0].shape) == [-1, 3]
        t = np.arange(2 * 16000) / 16000
        speech = (np.sin(2 * np.pi * 440 * t) * 0.3).astype(np.float32)
        speech += (rng.standard_normal(len(speech)) * 0.01).astype(
            np.float32)
        labels = client.infer_diarization(speech, model_name="run")
        assert labels.ndim == 2 and labels.shape[1] == 3
        exp = service.speaker.diarize_pcm(speech, utt="unk")
        want = np.asarray(
            [(b, e, float(s)) for (_u, b, e, s) in exp], np.float32
        ).reshape(-1, 3)
        np.testing.assert_array_equal(labels, want)

        # feature_extractor model over gRPC (wav -> speech feats)
        pb2 = client._pb2
        req = pb2.ModelInferRequest(model_name="feature_extractor")
        ti = req.inputs.add()
        ti.name = "wav"
        ti.datatype = "FP32"
        ti.shape.extend([1, wav.size])
        req.raw_input_contents.append(wav.tobytes())
        resp = client._call("ModelInfer", req, pb2.ModelInferResponse)
        assert resp.outputs[0].name == "speech"
        feats = np.frombuffer(
            resp.raw_output_contents[0], "<f4"
        ).reshape(tuple(resp.outputs[0].shape))
        np.testing.assert_array_equal(
            feats, service.features_samples(wav).astype(np.float32))
        client.close()
    finally:
        grpc_server.stop(grace=None)


def test_grpc_datatype_contents_mismatch(server):
    """Typed contents must match the declared datatype (ADVICE r3): a
    request declaring FP32 but shipping int_contents is an
    INVALID_ARGUMENT, not silently-accepted data; BOOL/UINT contents
    are selected by datatype instead of falling through to 'no data'."""
    pytest.importorskip("grpc")
    import grpc

    from wespeaker_hubert_tpu.serving.grpc_service import (
        GrpcSpeakerClient,
        build_grpc_server,
    )

    service = server.service
    import socket

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    grpc_server = build_grpc_server(service, host="127.0.0.1", port=port)
    try:
        client = GrpcSpeakerClient(f"127.0.0.1:{port}")
        pb2 = client._pb2

        def infer(datatype, fill):
            req = pb2.ModelInferRequest(model_name="speaker")
            t = req.inputs.add()
            t.name = "WAV"
            t.datatype = datatype
            t.shape.extend([1, 4])
            fill(t)
            return client._call("ModelInfer", req, pb2.ModelInferResponse)

        # FP32 declared, int_contents shipped -> loud mismatch
        with pytest.raises(grpc.RpcError) as exc:
            infer("FP32", lambda t: t.contents.int_contents.extend(
                [1, 2, 3, 4]))
        assert exc.value.code() == grpc.StatusCode.INVALID_ARGUMENT
        assert "int_contents" in exc.value.details()

        # BOOL typed contents: a real unsupported-datatype message (the
        # embed path wants floats), not 'carries no data'
        with pytest.raises(grpc.RpcError) as exc:
            infer("BYTES", lambda t: t.contents.bytes_contents.append(
                b"\x00" * 16))
        assert exc.value.code() == grpc.StatusCode.INVALID_ARGUMENT
        assert "unsupported datatype" in exc.value.details()

        # bool contents with BOOL datatype are decoded (then cast) —
        # datatype-driven selection reaches every advertised field
        resp = infer(
            "BOOL", lambda t: t.contents.bool_contents.extend(
                [True, False, True, False])
        )
        assert resp.outputs[0].name == "EMBEDDINGS"
        client.close()
    finally:
        grpc_server.stop(grace=None)
