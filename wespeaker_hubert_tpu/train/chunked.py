"""Chunked embedding extraction — the deployment-grade fixed-shape path.

Reference: the C++ SpeakerEngine splits arbitrary-length audio into
198-frame feature chunks, tiles the tail chunk, runs the model per chunk,
and averages chunk embeddings (runtime/core/speaker/speaker_engine.cc:
96-134 chunking + tail tiling, :140-159 averaging, per-chunk CMN at
:63-75).  Here the same policy is ONE jitted program per (batch,
n_chunks) bucket: every utterance compiles to the same 198-frame model
shape regardless of length — the serving-friendly alternative to
whole-utterance bucketing.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp

from ..ops.fbank import FbankConfig, fbank, num_frames
from ..ops.feature_utils import apply_cmvn

__all__ = ["make_chunked_embed", "chunk_features"]


def chunk_features(
    feats: jax.Array, feat_len: jax.Array, chunk_frames: int, max_chunks: int
) -> jax.Array:
    """(T, F) padded features + valid length -> (max_chunks, chunk_frames, F)
    with kaldi-engine semantics: full chunks stride chunk_frames; the tail
    chunk is the LAST chunk_frames of the valid region (tail re-reading,
    equivalent to speaker_engine.cc's last-chunk tiling for utterances
    longer than one chunk); chunks past the utterance repeat the tail
    (they're masked out of the average)."""
    t, f = feats.shape
    starts = jnp.arange(max_chunks) * chunk_frames
    # tail chunk start: feat_len - chunk_frames (clamped at 0)
    tail_start = jnp.maximum(feat_len - chunk_frames, 0)
    starts = jnp.minimum(starts, tail_start)
    idx = starts[:, None] + jnp.arange(chunk_frames)[None, :]
    idx = jnp.minimum(idx, t - 1)
    return feats[idx]  # (max_chunks, chunk_frames, F)


def make_chunked_embed(
    model,
    fbank_cfg: FbankConfig = FbankConfig(),
    chunk_frames: int = 198,
    mesh=None,
    compute_dtype=None,
) -> Callable:
    """Returns fn(variables, wav (B, W), lengths (B,)) -> (B, D) float32.

    Per utterance: fbank -> split into ceil(T/chunk) chunks (tail
    re-read) -> per-chunk CMN -> model -> masked average of chunk
    embeddings.  `compute_dtype=jnp.bfloat16` runs the backbone in bf16
    (embeddings cosine > 0.9999 vs f32, docs/BENCH_LOCAL.md); pass
    variables already cast to the same dtype."""

    shift = fbank_cfg.frame_shift

    def embed_fn(variables, batch):
        wav = batch["wav"]
        lengths = batch.get(
            "length", jnp.full((wav.shape[0],), wav.shape[1], jnp.int32)
        )
        feats, feat_lens = fbank(wav, fbank_cfg, lengths=lengths)
        b, t, f = feats.shape
        max_chunks = max(1, -(-t // chunk_frames))

        chunks = jax.vmap(
            lambda ft, fl: chunk_features(ft, fl, chunk_frames, max_chunks)
        )(feats, feat_lens)  # (B, C, chunk, F)
        flat = chunks.reshape(b * max_chunks, chunk_frames, f)
        flat = apply_cmvn(flat)  # per-chunk CMN (speaker_engine.cc:63-75)
        if compute_dtype is not None:
            flat = flat.astype(compute_dtype)
        if hasattr(model, "embed"):  # SpeakerNet
            emb = model.apply(
                variables, flat, train=False, method=model.embed
            )
        else:  # bare backbone
            from ..models.registry import embedding_from_outputs

            emb = embedding_from_outputs(
                model.apply(variables, flat, train=False)
            )
        emb = emb.reshape(b, max_chunks, -1)

        n_chunks = jnp.maximum(
            -(-feat_lens // chunk_frames), 1
        )  # ceil, >= 1
        mask = (
            jnp.arange(max_chunks)[None, :] < n_chunks[:, None]
        ).astype(emb.dtype)
        out = jnp.sum(emb * mask[:, :, None], axis=1) / jnp.maximum(
            jnp.sum(mask, axis=1, keepdims=True), 1.0
        )
        return out.astype(jnp.float32)

    if mesh is None:
        return jax.jit(embed_fn)
    from jax.sharding import NamedSharding, PartitionSpec as P

    from ..parallel.mesh import DATA_AXIS

    return jax.jit(
        embed_fn,
        in_shardings=(None, NamedSharding(mesh, P(DATA_AXIS))),
    )
