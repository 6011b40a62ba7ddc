"""Batched on-device feature post-processing: CMVN and SpecAug.

Reference semantics: wespeaker/dataset/dataset_utils.py:19-53 runs these on
GPU per batch (CMN over the time axis; SpecAug with ONE shared random mask
for the whole batch — flagged there as a TODO).  Here both are pure jittable
functions of (feats, rng); SpecAug draws independent masks per sample by
default (`per_sample=True`), which strictly generalizes the reference and
removes its shared-mask limitation, while `per_sample=False` reproduces the
reference's batch-shared masks.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

__all__ = ["apply_cmvn", "spec_aug"]


def apply_cmvn(
    feats: jax.Array,
    norm_mean: bool = True,
    norm_var: bool = False,
    lengths: Optional[jax.Array] = None,
) -> jax.Array:
    """Per-utterance cepstral mean (and optional variance) normalization.

    feats: (B, T, F).  With `lengths` (B,), statistics are computed over the
    valid prefix only (the reference never needs this because it pads
    nothing at train time and uses batch=1 at eval; we support padded
    bucketed eval batches).
    """
    # statistics in f32 (a bf16 sum over hundreds of frames drifts), but
    # the normalized output keeps the input dtype so bf16 graphs stay bf16
    dt = feats.dtype
    f32 = feats.astype(jnp.float32)
    if lengths is None:
        if norm_mean:
            feats = (f32 - jnp.mean(f32, axis=1, keepdims=True)).astype(dt)
            f32 = feats.astype(jnp.float32)
        if norm_var:
            feats = (
                f32 / jnp.sqrt(jnp.var(f32, axis=1, keepdims=True) + 1e-7)
            ).astype(dt)
        return feats

    t = feats.shape[1]
    mask = (jnp.arange(t)[None, :] < lengths[:, None]).astype(jnp.float32)
    denom = jnp.maximum(lengths.astype(jnp.float32), 1.0)[:, None, None]
    mask3 = mask[:, :, None]
    mean = jnp.sum(f32 * mask3, axis=1, keepdims=True) / denom
    if norm_mean:
        f32 = (f32 - mean) * mask3
        if norm_var:
            var = jnp.sum(f32**2 * mask3, axis=1, keepdims=True) / denom
            f32 = f32 / jnp.sqrt(var + 1e-7)
        return f32.astype(dt)
    if norm_var:
        var = jnp.sum((f32 - mean) ** 2 * mask3, axis=1, keepdims=True) / denom
        f32 = f32 / jnp.sqrt(var + 1e-7)
    return (f32 * mask3).astype(dt)


def _band_mask(rng: jax.Array, size: int, max_width: int, shape=()) -> jax.Array:
    """Random zero-band mask of length `size`: start ~ U[0, size-1],
    width ~ U[1, max_width] (matching random.randint semantics in the
    reference).  Returns float mask broadcastable over `shape + (size,)`
    with zeros inside the band."""
    k1, k2 = jax.random.split(rng)
    start = jax.random.randint(k1, shape, 0, size)
    width = jax.random.randint(k2, shape, 1, max_width + 1)
    pos = jnp.arange(size)
    for _ in range(len(shape)):
        pos = pos[None]
    start = start[..., None]
    width = width[..., None]
    inside = (pos >= start) & (pos < start + width)
    return 1.0 - inside.astype(jnp.float32)


def spec_aug(
    feats: jax.Array,
    rng: jax.Array,
    num_t_mask: int = 1,
    num_f_mask: int = 1,
    max_t: int = 10,
    max_f: int = 8,
    prob: float = 0.6,
    per_sample: bool = True,
) -> jax.Array:
    """SpecAugment time/frequency masking on a (B, T, F) batch.

    The whole op stays inside jit: the `prob` gate is a per-sample (or
    per-batch) bernoulli blended with `where`, so shapes are static.
    """
    b, t, f = feats.shape
    keys = jax.random.split(rng, 2 * (num_t_mask + num_f_mask) + 1)
    gate_key, mask_keys = keys[0], keys[1:]

    shape = (b,) if per_sample else ()
    mask = jnp.ones((b, t, f) if per_sample else (t, f), dtype=jnp.float32)
    ki = 0
    for _ in range(num_t_mask):
        m = _band_mask(mask_keys[ki], t, max_t, shape)  # (..., T)
        mask = mask * m[..., :, None]
        ki += 1
    for _ in range(num_f_mask):
        m = _band_mask(mask_keys[ki], f, max_f, shape)  # (..., F)
        mask = mask * m[..., None, :]
        ki += 1

    gate = jax.random.uniform(gate_key, shape) < prob
    if per_sample:
        gate = gate[:, None, None]
    masked = feats * mask.astype(feats.dtype)
    return jnp.where(gate, masked, feats)
