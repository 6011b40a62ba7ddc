"""Diarization pipeline RTF on TPU: VAD -> bucketed segment fbank ->
sliding-window embeddings -> spectral clustering -> merge.

The reference publishes DER only; this measures wall-clock real-time
factor of the full `Speaker.diarize` CLI path (the role of its
voxconverse runtime).  Two passes over different files: the first pays
XLA compiles for the shape buckets, the second is steady state.

Run: python perf_diar.py [minutes]
"""

import json
import sys
import time

import numpy as np


def make_conversation(rng, seconds, sr=16000):
    """Alternating synthetic speakers with pauses."""
    parts = []
    t = 0.0
    spk = 0
    while t < seconds:
        dur = float(rng.uniform(2.0, 8.0))
        n = int(dur * sr)
        tt = np.arange(n) / sr
        f0 = 120 + 80 * spk
        x = np.sin(2 * np.pi * f0 * tt) * 0.25
        x += np.sin(2 * np.pi * 2.3 * f0 * tt) * 0.1
        x *= 0.6 + 0.4 * np.sin(2 * np.pi * 2.0 * tt)
        parts.append((x + rng.standard_normal(n) * 0.01).astype(np.float32))
        gap = int(rng.uniform(0.3, 1.2) * sr)
        parts.append(np.zeros(gap, np.float32))
        t += dur + gap / sr
        spk = 1 - spk
    return np.concatenate(parts)[: int(seconds * sr)]


def main():
    minutes = float(sys.argv[1]) if len(sys.argv) > 1 else 2.0
    seconds = minutes * 60

    from perf_serve import make_model_dir
    from wespeaker_hubert_tpu.cli.speaker import Speaker
    from wespeaker_hubert_tpu.data import write_wav

    root = make_model_dir("/tmp/diar_bench_model")
    model = Speaker(root)

    rng = np.random.default_rng(0)
    for i, tag in enumerate(("warm (compiles)", "steady")):
        wav = make_conversation(rng, seconds)
        path = f"/tmp/diar_bench_{i}.wav"
        write_wav(path, wav)
        t0 = time.perf_counter()
        segs = model.diarize(path, utt=f"conv{i}", clusterer="spectral")
        dt = time.perf_counter() - t0
        print(json.dumps({
            "pass": tag, "audio_s": seconds, "wall_s": round(dt, 2),
            "rtf": round(dt / seconds, 4),
            "audio_s_per_s": round(seconds / dt, 1),
            "n_segments": len(segs),
        }), flush=True)


def batch(minutes=2.0, n_convs=16):
    """Multi-conversation throughput via Speaker.diarize_pcm_batch —
    the VERDICT round-3 target metric (aggregate audio-s/s ≫ the
    sequential RTF).  Two passes: compile-warm, then steady state."""
    seconds = minutes * 60

    from perf_serve import make_model_dir
    from wespeaker_hubert_tpu.cli.speaker import Speaker

    root = make_model_dir("/tmp/diar_bench_model")
    model = Speaker(root)

    rng = np.random.default_rng(0)
    for tag in ("warm (compiles)", "steady"):
        # quantize to the PCM16 grid — batch inputs in production come
        # from PCM16 files, which makes the int16 upload path engage
        # (bit-identical; tests/test_diar_batch.py)
        wavs = [
            np.rint(make_conversation(rng, seconds) * 32768.0)
            .clip(-32768, 32767).astype(np.float32) / np.float32(32768.0)
            for _ in range(n_convs)
        ]
        t0 = time.perf_counter()
        outs = model.diarize_pcm_batch(
            wavs, utts=[f"c{i}" for i in range(n_convs)],
            clusterer="spectral",
        )
        dt = time.perf_counter() - t0
        total = seconds * n_convs
        print(json.dumps({
            "pass": tag, "n_convs": n_convs, "audio_s": total,
            "wall_s": round(dt, 2), "rtf": round(dt / total, 5),
            "audio_s_per_s": round(total / dt, 1),
            "n_segments": sum(len(o) for o in outs),
            "phases": {k: round(v, 2) for k, v in
                       getattr(model, "last_diar_timings", {}).items()},
        }), flush=True)


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "batch":
        batch(*(float(a) if "." in a else int(a) for a in sys.argv[2:]))
    else:
        main()
