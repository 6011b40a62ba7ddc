"""Batch embedding extraction (reference bin/extract.py:33 rebuilt).

Differences by design: bucketed whole-utterance BATCHES with pooling
masks instead of batch=1 (reference extract.py:76 forces bs=1 for
whole-utterance), and the fbank+CMVN frontend runs in-graph on device.
Embeddings are written as .npz sets (utils/embeddings.py) instead of
kaldi ark/scp.
"""

from __future__ import annotations

import logging
import os
import time
import jax
import jax.numpy as jnp
import numpy as np

from ..data import EvalPipeline
from ..ops.fbank import FbankConfig
from ..ops.pipeline import FeaturePipelineConfig
from ..train import make_eval_embed
from ..utils.checkpoint import load_partial
from ..utils.config import parse_config_or_kwargs
from ..utils.embeddings import save_embeddings
from .train import build_speaker_net

__all__ = ["extract"]


def extract(
    config: str | dict,
    data_list: str,
    checkpoint: str,
    output: str,
    batch_size: int = 32,
    sharded: bool = False,
    data_type: str = "raw",
    **overrides,
):
    """Extract embeddings for every utterance in `data_list` (raw JSONL,
    tar shards, or precomputed kaldi-ark features — reference
    bin/extract.py --data_type) -> save to `output` (.npz).
    Returns (keys, embeddings).

    sharded=True fans each batch over every device on a ('data',) mesh —
    the TPU equivalent of the reference's nj x GPU extraction fan-out
    (tools/extract_embedding.sh:40-66), with one process driving all
    chips instead of nj processes."""
    if isinstance(config, str):
        config = parse_config_or_kwargs(config, **overrides)
    logger = logging.getLogger("extract")

    dataset_args = config.get("dataset_args", {})
    # accept fbank_args both nested (train-config style) and top-level
    fb = dataset_args.get("fbank_args", config.get("fbank_args", {}))
    feature_cfg = FeaturePipelineConfig(
        fbank=FbankConfig(
            num_mel_bins=fb.get("num_mel_bins", 80),
            frame_shift_ms=fb.get("frame_shift", 10),
            frame_length_ms=fb.get("frame_length", 25),
            dither=0.0,  # eval: no dither (reference extract.py:64-70)
            matmul_precision=fb.get("matmul_precision", "highest"),
        ),
        spec_aug=False,
    )

    # num_class doesn't matter for inference; build with 2 to keep the
    # projection tiny, then partial-load only backbone params.
    net = build_speaker_net(config, num_class=2)
    if data_type == "feat" and net.frontend is not None:
        # same guard as bin/train: precomputed features would silently
        # bypass a wav-domain (SSL/whisper) frontend
        raise ValueError(
            "data_type=feat requires frontend=fbank (precomputed "
            "features cannot feed a wav-domain frontend)"
        )
    if net.frontend is not None:
        # frontend nets (s3prl / whisper): the backbone consumes the
        # frontend's output features, and the frontend params come from
        # tracing the `features` method (train/state.py:97-103)
        feat_dim = getattr(
            net.backbone, "feat_dim",
            getattr(net.backbone, "output_size", None),
        )
    else:
        feat_dim = feature_cfg.fbank.num_mel_bins
    variables = net.init(
        jax.random.key(0),
        jnp.zeros((1, 100, feat_dim)),
        jnp.zeros((1,), jnp.int32),
        0.0,
        train=False,
    )
    params = dict(variables["params"])
    batch_stats = dict(variables.get("batch_stats", {}))
    if net.frontend is not None:
        fvars = net.init(
            jax.random.key(1), jnp.zeros((1, 16000)), train=False,
            method=net.features,
        )
        params.update(fvars["params"])
        batch_stats.update(fvars.get("batch_stats", {}))
    target = {"params": params, "batch_stats": batch_stats}
    restored, missing, unexpected = load_partial(checkpoint, target)
    if missing:
        logger.info("missing keys in checkpoint: %d", len(missing))
    # a checkpoint that matches no backbone weights would silently
    # extract random-init embeddings — refuse
    n_backbone = sum(
        1 for k in missing if k.startswith("params/backbone")
    )
    n_target = len(
        [None for k, _ in _flatten_paths(target["params"].get("backbone", {}))]
    )
    if n_target and n_backbone >= n_target:
        raise RuntimeError(
            f"checkpoint {checkpoint!r} matched no backbone parameters "
            "(wrong model/config or un-nested tree?)"
        )
    variables = {
        "params": restored["params"],
        "batch_stats": restored["batch_stats"],
    }

    # optional bf16 inference (config key compute_dtype: bf16): +37%
    # extraction throughput, embeddings cosine > 0.9999 vs f32
    # (docs/BENCH_LOCAL.md); default stays f32 for bit-stable eval
    compute_dtype = None
    if str(config.get("compute_dtype", "")).lower() in ("bf16", "bfloat16"):
        from ..train import cast_variables_bf16

        compute_dtype = jnp.bfloat16
        variables = cast_variables_bf16(variables)
        logger.info("bf16 inference enabled")

    # pipeline-parallel extraction: the same YAML knob the train driver
    # reads (s3prl_args/whisper_encoder_args.pipeline_parallel) stages
    # the frontend stack over a 'pipe' axis at eval too — useful when a
    # large frontend doesn't fit one chip's HBM
    fe_args = {}
    if dataset_args.get("frontend") == "s3prl":
        fe_args = dataset_args.get("s3prl_args", {})
    elif dataset_args.get("frontend") == "whisper_encoder":
        fe_args = dataset_args.get("whisper_encoder_args", {})
    pp = int(fe_args.get("pipeline_parallel", 1))
    pp_micro = None
    mesh = None
    if pp > 1 and len(jax.devices()) >= pp:
        from ..parallel import make_mesh, shard_tree, stack_frontend_tree

        mesh = make_mesh(model_parallel=1, pipeline_parallel=pp)
        n_shards = mesh.devices.shape[0]  # data axis for row alignment
        params = dict(variables["params"])
        params["frontend"] = stack_frontend_tree(
            params["frontend"], net.frontend.cfg
        )
        variables = {**variables, "params": params}
        variables = shard_tree(variables, mesh)
        pp_micro = int(
            fe_args.get("pipeline_microbatches")
            or max(1, min(batch_size, 4 * pp))
        )
        while batch_size % pp_micro:
            pp_micro -= 1
        logger.info(
            "pipeline-parallel extraction: %d stages, %d microbatches",
            pp, pp_micro,
        )
    elif sharded and len(jax.devices()) > 1:
        from ..parallel.mesh import DATA_AXIS, make_mesh, shard_tree

        mesh = make_mesh(model_parallel=1)
        variables = shard_tree(variables, mesh)  # replicate onto the mesh
        n_shards = mesh.shape[DATA_AXIS]
        logger.info("sharded extraction over %d devices", n_shards)
    embed_fn = make_eval_embed(net, feature_cfg=feature_cfg, mesh=mesh,
                               compute_dtype=compute_dtype,
                               pipeline_microbatches=pp_micro)

    from ..data import load_data_list

    pipe = EvalPipeline(
        load_data_list(data_list), data_type=data_type,
        batch_size=batch_size,
    )
    frame_shift_s = fb.get("frame_shift", 10) / 1000.0

    # host decode overlapped with device compute: a producer thread fills a
    # bounded queue while the main thread drives the TPU (the reference
    # overlaps with torch DataLoader workers; here one prefetch thread
    # suffices since decoding is the only host work)
    import queue as _queue
    import threading as _threading

    q: "_queue.Queue" = _queue.Queue(maxsize=4)

    def _produce():
        for b in pipe:
            q.put(b)
        q.put(None)

    producer = _threading.Thread(target=_produce, daemon=True)
    producer.start()

    keys, embs = [], []
    audio_seconds = 0.0
    t0 = time.time()
    pending = None  # (device result, real row count) in flight
    while True:
        batch = q.get()
        if batch is None:
            break
        is_feat = "feat" in batch
        if is_feat:
            x, length = batch["feat"], batch["feat_length"]
        else:
            x, length = batch["wav"], batch["length"]
        n_real = len(x)
        # pad rows (repeat the last) to the bucket's full batch size —
        # a tail batch with fewer rows would compile one extra XLA
        # program per (bucket, count) pair; padded embeddings are
        # trimmed after fetch.  Sharded mode additionally needs a
        # multiple of the data axis (full batch size always is: bin/train
        # asserts divisibility and _batch_for scales proportionally).
        full = pipe._batch_for(x.shape[1])
        if mesh is not None:  # shard-aligned row count
            full = -(-full // n_shards) * n_shards
        pad = full - n_real
        if pad > 0:
            x = np.concatenate([x, np.repeat(x[-1:], pad, 0)])
            length = np.concatenate(
                [length, np.repeat(length[-1:], pad, 0)]
            )
        dev_batch = (
            {"feat": jnp.asarray(x), "feat_length": jnp.asarray(length)}
            if is_feat
            else {"wav": jnp.asarray(x), "length": jnp.asarray(length)}
        )
        e = embed_fn(variables, dev_batch)
        if pending is not None:
            embs.append(np.asarray(pending[0])[: pending[1]])
        pending = (e, n_real)
        keys += batch["keys"]
        real_lengths = (
            batch["feat_length"] if is_feat else batch["length"]
        )
        audio_seconds += float(real_lengths.sum()) * (
            frame_shift_s if is_feat else 1.0 / 16000.0
        )
    if pending is not None:
        embs.append(np.asarray(pending[0])[: pending[1]])
    producer.join()
    dt = time.time() - t0
    emb = np.concatenate(embs) if embs else np.zeros((0, 0), np.float32)
    logger.info(
        "extracted %d embeddings; %.1f audio-s in %.1fs (%.1f audio-s/s)",
        len(keys), audio_seconds, dt, audio_seconds / max(dt, 1e-9),
    )
    if not keys:
        # every sample was skipped (corrupt wavs / bad list): a silent
        # empty output file would poison downstream scoring — fail loudly
        raise RuntimeError(
            f"extracted 0 embeddings from {data_list!r}; "
            "check the data list format and per-sample warnings above"
        )
    if output:
        os.makedirs(os.path.dirname(output) or ".", exist_ok=True)
        save_embeddings(output, keys, emb)
    return keys, emb


def _flatten_paths(tree, prefix=()):
    if isinstance(tree, dict):
        for k, v in tree.items():
            yield from _flatten_paths(v, prefix + (k,))
    else:
        yield prefix, tree


def main():
    import argparse

    p = argparse.ArgumentParser()
    p.add_argument("--config", required=True)
    p.add_argument("--data_list", required=True)
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--output", required=True)
    p.add_argument("--batch_size", type=int, default=32)
    p.add_argument("--sharded", action="store_true",
                   help="fan batches over all devices (data-parallel)")
    p.add_argument("--data_type", default="raw",
                   choices=("raw", "shard", "feat"),
                   help="list format (reference bin/extract.py "
                        "--data_type)")
    args = p.parse_args()
    logging.basicConfig(level=logging.INFO)
    extract(args.config, args.data_list, args.checkpoint, args.output,
            args.batch_size, sharded=args.sharded,
            data_type=args.data_type)


if __name__ == "__main__":
    main()
