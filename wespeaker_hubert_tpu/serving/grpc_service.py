"""KServe v2 / Triton gRPC inference endpoint.

The reference serves its speaker models through Triton, whose clients
speak the GRPC inference protocol (reference
runtime/server/x86_gpu/client/client.py uses tritonclient.grpc).  This
module provides the same wire protocol on top of bin/serve.py's
EmbeddingService: `ServerLive/ServerReady/ModelReady/ModelMetadata/
ModelInfer`, with both `raw_input_contents` (tritonclient's default
packing) and typed `contents` accepted.

No grpc_tools in the image, so message classes are protoc-compiled on
first use (the baked-in `protoc --python_out`, cached next to the
.proto like the data/native loader build) and the service is registered
through grpc's generic handlers instead of generated stubs — same wire
format, no codegen dependency.
"""

from __future__ import annotations

import os
import subprocess
import threading

__all__ = ["load_pb2", "build_grpc_server", "GrpcSpeakerClient"]

_DIR = os.path.dirname(os.path.abspath(__file__))
_PROTO = os.path.join(_DIR, "kserve.proto")
_PB2 = os.path.join(_DIR, "kserve_pb2.py")
_LOCK = threading.Lock()
_MOD = None


def load_pb2():
    """protoc-compile kserve.proto once and import the message module."""
    global _MOD
    with _LOCK:
        if _MOD is not None:
            return _MOD
        if (not os.path.exists(_PB2)
                or os.path.getmtime(_PB2) < os.path.getmtime(_PROTO)):
            subprocess.run(
                ["protoc", f"-I{_DIR}", f"--python_out={_DIR}", _PROTO],
                check=True, capture_output=True,
            )
        import importlib.util

        spec = importlib.util.spec_from_file_location(
            "wespeaker_kserve_pb2", _PB2
        )
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        _MOD = mod
        return mod


_DT_NP = {"FP32": "<f4", "FP64": "<f8", "INT32": "<i4", "INT64": "<i8",
          "INT16": "<i2", "UINT8": "u1"}

# KServe v2 maps every datatype onto one InferTensorContents field
# (narrow ints ride the wider repeated field); selecting the field FROM
# the declared datatype — instead of taking whichever field happens to
# be populated — makes datatype/contents mismatches an error rather
# than silently accepted data
_DT_CONTENTS = {
    "FP32": "fp32_contents", "FP64": "fp64_contents",
    "INT8": "int_contents", "INT16": "int_contents",
    "INT32": "int_contents", "INT64": "int64_contents",
    "UINT8": "uint_contents", "UINT16": "uint_contents",
    "UINT32": "uint_contents", "UINT64": "uint64_contents",
    "BOOL": "bool_contents",
}


def _tensor_to_array(req, idx):
    """One input tensor -> np array, from raw_input_contents or typed
    contents (both are legal packings in the protocol)."""
    import numpy as np

    t = req.inputs[idx]
    shape = tuple(int(d) for d in t.shape)
    if idx < len(req.raw_input_contents) and req.raw_input_contents[idx]:
        dt = _DT_NP.get(t.datatype)
        if dt is None:
            raise ValueError(f"unsupported datatype {t.datatype!r}")
        return np.frombuffer(
            req.raw_input_contents[idx], dtype=dt
        ).reshape(shape)
    field = _DT_CONTENTS.get(t.datatype)
    if field is None:
        raise ValueError(f"unsupported datatype {t.datatype!r}")
    vals = getattr(t.contents, field)
    if not len(vals):
        populated = [
            f for f in _DT_CONTENTS.values()
            if len(getattr(t.contents, f))
        ]
        if populated:
            raise ValueError(
                f"input tensor {t.name!r} declares datatype "
                f"{t.datatype} (expects {field}) but carries "
                f"{sorted(set(populated))}"
            )
        raise ValueError(f"input tensor {t.name!r} carries no data")
    return np.asarray(vals).reshape(shape)


def build_grpc_server(service, host="0.0.0.0", port=8502, model_name=None,
                      max_workers=8):
    """grpc.Server exposing `service` (bin/serve.EmbeddingService).

    Input: WAV (FP32, shape [1, n] or [n]) -> output EMB (FP32,
    [1, embed_dim]) in raw_output_contents — the layout tritonclient
    expects.  Returns the started server (caller owns shutdown)."""
    import grpc
    import numpy as np

    pb2 = load_pb2()

    def server_live(req, ctx):
        return pb2.ServerLiveResponse(live=True)

    def server_ready(req, ctx):
        return pb2.ServerReadyResponse(ready=True)

    def model_ready(req, ctx):
        return pb2.ModelReadyResponse(ready=True)

    # model names understood as the diarization BLS role (the reference
    # Triton repo calls its ensemble "run";
    # runtime/server/diarization_gpu/model_repo/run/config.pbtxt:
    # input "input" FP32 [-1] -> output "LABELS" FP32 [-1, 3] rows of
    # (begin_s, end_s, speaker))
    DIAR_MODELS = ("run", "diarization")

    def model_metadata(req, ctx):
        if req.name == "feature_extractor":
            # reference x86_gpu feature_extractor contract
            nm = int(service.speaker.fbank_cfg.num_mel_bins)
            return pb2.ModelMetadataResponse(
                name=req.name,
                platform="jax_xla",
                inputs=[pb2.ModelMetadataResponse.TensorMetadata(
                    name="wav", datatype="FP32", shape=[1, -1])],
                outputs=[pb2.ModelMetadataResponse.TensorMetadata(
                    name="speech", datatype="FP32", shape=[-1, nm])],
            )
        if req.name == "speaker_model":
            nm = int(service.speaker.fbank_cfg.num_mel_bins)
            return pb2.ModelMetadataResponse(
                name=req.name,
                platform="jax_xla",
                inputs=[pb2.ModelMetadataResponse.TensorMetadata(
                    name="feats", datatype="FP32", shape=[-1, nm])],
                outputs=[pb2.ModelMetadataResponse.TensorMetadata(
                    name="embs", datatype="FP32",
                    shape=[service.embed_dim])],
            )
        if req.name in DIAR_MODELS:
            return pb2.ModelMetadataResponse(
                name=req.name,
                platform="jax_xla",
                inputs=[pb2.ModelMetadataResponse.TensorMetadata(
                    name="input", datatype="FP32", shape=[1, -1])],
                outputs=[pb2.ModelMetadataResponse.TensorMetadata(
                    name="LABELS", datatype="FP32", shape=[-1, 3])],
            )
        return pb2.ModelMetadataResponse(
            name=req.name or (model_name or "speaker"),
            platform="jax_xla",
            inputs=[pb2.ModelMetadataResponse.TensorMetadata(
                name="WAV", datatype="FP32", shape=[1, -1])],
            outputs=[pb2.ModelMetadataResponse.TensorMetadata(
                name="EMBEDDINGS", datatype="FP32",
                shape=[1, service.embed_dim])],
        )

    def model_infer(req, ctx):
        names = [t.name for t in req.inputs]
        if req.model_name == "feature_extractor":
            try:
                idx = names.index("wav") if "wav" in names else 0
                wav = _tensor_to_array(req, idx).astype(
                    np.float32).reshape(-1)
            except (ValueError, IndexError) as e:
                ctx.abort(grpc.StatusCode.INVALID_ARGUMENT, str(e))
            feats = service.features_samples(wav).astype(np.float32)
            resp = pb2.ModelInferResponse(
                model_name=req.model_name, id=req.id,
            )
            out = resp.outputs.add()
            out.name = "speech"
            out.datatype = "FP32"
            out.shape.extend([int(feats.shape[0]), int(feats.shape[1])])
            resp.raw_output_contents.append(feats.tobytes())
            return resp
        if req.model_name == "speaker_model":
            try:
                idx = names.index("feats") if "feats" in names else 0
                feats = _tensor_to_array(req, idx).astype(np.float32)
            except (ValueError, IndexError) as e:
                ctx.abort(grpc.StatusCode.INVALID_ARGUMENT, str(e))
            emb = service.embed_feats_samples(feats).astype(np.float32)
            resp = pb2.ModelInferResponse(
                model_name=req.model_name, id=req.id,
            )
            out = resp.outputs.add()
            out.name = "embs"
            out.datatype = "FP32"
            out.shape.extend([int(emb.shape[-1])])
            resp.raw_output_contents.append(emb.tobytes())
            return resp
        if req.model_name in DIAR_MODELS:
            try:
                idx = names.index("input") if "input" in names else 0
                wav = _tensor_to_array(req, idx).astype(
                    np.float32).reshape(-1)
            except (ValueError, IndexError) as e:
                ctx.abort(grpc.StatusCode.INVALID_ARGUMENT, str(e))
            segs = service.diarize_samples(wav)
            labels = np.asarray(
                [(b, e, float(spk)) for (_u, b, e, spk) in segs],
                np.float32,
            ).reshape(-1, 3)
            resp = pb2.ModelInferResponse(
                model_name=req.model_name, id=req.id,
            )
            out = resp.outputs.add()
            out.name = "LABELS"
            out.datatype = "FP32"
            out.shape.extend([int(labels.shape[0]), 3])
            resp.raw_output_contents.append(labels.tobytes())
            return resp
        try:
            idx = names.index("WAV") if "WAV" in names else 0
            wav = _tensor_to_array(req, idx).astype(np.float32).reshape(-1)
        except (ValueError, IndexError) as e:
            ctx.abort(grpc.StatusCode.INVALID_ARGUMENT, str(e))
        emb = service.embed_samples(wav).astype(np.float32)
        resp = pb2.ModelInferResponse(
            model_name=req.model_name or (model_name or "speaker"),
            id=req.id,
        )
        out = resp.outputs.add()
        # honor the client's requested output name — the reference's
        # Triton client asks for (and reads back) "EMBEDDINGS"
        # (runtime/server/x86_gpu/client/client.py:53,58); older
        # clients of this server requested "EMB"
        out.name = (req.outputs[0].name if req.outputs else "EMBEDDINGS")
        out.datatype = "FP32"
        out.shape.extend([1, int(emb.shape[-1])])
        resp.raw_output_contents.append(emb.tobytes())
        return resp

    def unary(fn, req_cls):
        return grpc.unary_unary_rpc_method_handler(
            fn,
            request_deserializer=req_cls.FromString,
            response_serializer=lambda m: m.SerializeToString(),
        )

    handler = grpc.method_handlers_generic_handler(
        "inference.GRPCInferenceService",
        {
            "ServerLive": unary(server_live, pb2.ServerLiveRequest),
            "ServerReady": unary(server_ready, pb2.ServerReadyRequest),
            "ModelReady": unary(model_ready, pb2.ModelReadyRequest),
            "ModelMetadata": unary(model_metadata, pb2.ModelMetadataRequest),
            "ModelInfer": unary(model_infer, pb2.ModelInferRequest),
        },
    )
    from concurrent import futures

    server = grpc.server(futures.ThreadPoolExecutor(max_workers=max_workers))
    server.add_generic_rpc_handlers((handler,))
    bound = server.add_insecure_port(f"{host}:{port}")
    if bound == 0:
        # grpc signals bind failure by returning port 0, not raising —
        # a "started" server that listens on nothing must be loud
        raise OSError(f"gRPC could not bind {host}:{port} (port in use?)")
    server.start()
    return server


class GrpcSpeakerClient:
    """Minimal tritonclient.grpc-shaped client for tests/examples."""

    def __init__(self, target: str):
        import grpc

        self._pb2 = load_pb2()
        self._channel = grpc.insecure_channel(target)

    def _call(self, method, req, resp_cls):
        fn = self._channel.unary_unary(
            f"/inference.GRPCInferenceService/{method}",
            request_serializer=lambda m: m.SerializeToString(),
            response_deserializer=resp_cls.FromString,
        )
        return fn(req)

    def server_live(self) -> bool:
        pb2 = self._pb2
        return self._call(
            "ServerLive", pb2.ServerLiveRequest(), pb2.ServerLiveResponse
        ).live

    def model_metadata(self, name="speaker"):
        pb2 = self._pb2
        return self._call(
            "ModelMetadata", pb2.ModelMetadataRequest(name=name),
            pb2.ModelMetadataResponse,
        )

    def infer_embedding(self, wav, model_name="speaker", raw=True):
        import numpy as np

        pb2 = self._pb2
        wav = np.asarray(wav, np.float32).reshape(-1)
        req = pb2.ModelInferRequest(model_name=model_name)
        t = req.inputs.add()
        t.name = "WAV"
        t.datatype = "FP32"
        t.shape.extend([1, wav.size])
        if raw:
            req.raw_input_contents.append(wav.tobytes())
        else:
            t.contents.fp32_contents.extend(float(x) for x in wav)
        resp = self._call("ModelInfer", req, pb2.ModelInferResponse)
        if resp.raw_output_contents:
            return np.frombuffer(
                resp.raw_output_contents[0], "<f4"
            ).reshape(tuple(resp.outputs[0].shape))
        return np.asarray(resp.outputs[0].contents.fp32_contents).reshape(
            tuple(resp.outputs[0].shape)
        )

    def infer_diarization(self, wav, model_name="run"):
        """Reference diarization-client protocol
        (runtime/server/diarization_gpu/client/client.py): input tensor
        'input' FP32 (1, n) -> 'LABELS' FP32 (n_segments, 3) rows of
        (begin_s, end_s, speaker)."""
        import numpy as np

        pb2 = self._pb2
        wav = np.asarray(wav, np.float32).reshape(-1)
        req = pb2.ModelInferRequest(model_name=model_name)
        t = req.inputs.add()
        t.name = "input"
        t.datatype = "FP32"
        t.shape.extend([1, wav.size])
        req.raw_input_contents.append(wav.tobytes())
        resp = self._call("ModelInfer", req, pb2.ModelInferResponse)
        return np.frombuffer(
            resp.raw_output_contents[0], "<f4"
        ).reshape(tuple(resp.outputs[0].shape))

    def close(self):
        self._channel.close()
