"""Per-op device trace of the EXTRACTION path for any registry model.

Round-4 lab: bench_all.bench_extract gives per-family audio-s/s rows,
but slow rows (ReDimNet in particular) need the same trace-backed
adjudication the train step and the SSL frontend got — which HLO
categories hold the time, at what TF/s / GB/s, and whether the family
is MXU-, HBM- or layout-bound.  Reuses perf_trace.report for the
aggregation so numbers are directly comparable across labs.

Usage: python perf_extract_trace.py [model] [batch] [seconds] [dtype]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

import perf_trace

SR = 16000


def build(model_name, batch, seconds, dtype="bf16", feat_dim=None,
          **model_kw):
    from wespeaker_hubert_tpu.models import (
        embedding_from_outputs,
        get_speaker_model,
    )
    from wespeaker_hubert_tpu.ops.fbank import FbankConfig
    from wespeaker_hubert_tpu.ops.pipeline import (
        FeaturePipelineConfig,
        wav_to_features,
    )

    if feat_dim is None:
        feat_dim = 72 if model_name.startswith("ReDimNet") else 80
    model = get_speaker_model(model_name)(feat_dim=feat_dim, embed_dim=192,
                                          **model_kw)
    n = int(seconds * SR)
    frames = 1 + (n - 400) // 160
    variables = model.init(
        jax.random.key(0), jnp.zeros((batch, frames, feat_dim)), train=False
    )
    if dtype == "bf16":
        variables = jax.tree.map(
            lambda x: x.astype(jnp.bfloat16)
            if x.dtype == jnp.float32 else x,
            variables,
        )
    cfg = FeaturePipelineConfig(
        fbank=FbankConfig(dither=0.0, spectrum_impl="pallas",
                          num_mel_bins=feat_dim),
        spec_aug=False,
    )

    @jax.jit
    def run(wav):
        feats, _ = wav_to_features(wav, cfg, train=False)
        if dtype == "bf16":
            feats = feats.astype(jnp.bfloat16)
        out = model.apply(variables, feats, train=False)
        return embedding_from_outputs(out).astype(jnp.float32)

    rng = np.random.default_rng(0)
    wav = jnp.asarray(rng.standard_normal((batch, n)) * 0.1, jnp.float32)
    return run, wav


def main(model="ReDimNetB2", batch=64, seconds=10.0, dtype="bf16",
         trace_dir=None, **model_kw):
    trace_dir = trace_dir or f"/tmp/extract_trace_{model}"
    run, wav = build(model, batch, seconds, dtype, **model_kw)
    _ = np.asarray(run(wav)[:1, :1])  # compile + warm
    t0 = time.perf_counter()
    out = run(wav)
    _ = np.asarray(out[:1, :1])
    wall = time.perf_counter() - t0
    print(f"[{model}] fetch-forced dispatch {wall*1e3:.1f} ms "
          f"({batch*seconds/wall:.0f} audio-s/s wall)")

    jax.profiler.start_trace(trace_dir, create_perfetto_trace=False)
    out = run(wav)
    _ = np.asarray(out[:1, :1])
    jax.profiler.stop_trace()
    # report() computes audio_s as batch*num_frms*0.01*loop_steps; feed
    # num_frms = seconds*100 so the device audio-s/s line is correct.
    perf_trace.report(trace_dir, loop_steps=1, batch=batch,
                      num_frms=int(seconds * 100), top=20)


if __name__ == "__main__":
    a = sys.argv[1:]
    main(
        a[0] if len(a) > 0 else "ReDimNetB2",
        int(a[1]) if len(a) > 1 else 64,
        float(a[2]) if len(a) > 2 else 10.0,
        a[3] if len(a) > 3 else "bf16",
    )
