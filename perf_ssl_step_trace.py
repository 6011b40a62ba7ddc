"""Per-op device trace of the SSL train steps (DINO/MoCo/SimCLR).

The supervised step and the extraction paths carry trace-backed
roofline adjudications (perf_trace.py, perf_extract_trace.py); this lab
gives the SSL steps the same treatment — which HLO categories hold the
time at what TF/s / GB/s, so the bf16 SSL numbers (DINO 14.4k, MoCo
18.7k, SimCLR 14.4k audio-s/s) are adjudicated, not just measured.
Reference role: ssl/utils/dino_executor.py run_epoch is the hot loop
being replaced.

Usage: python perf_ssl_step_trace.py [dino|moco|simclr] [batch]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

import bench_all
import perf_trace


def main(method="dino", batch=64, trace_dir=None):
    trace_dir = trace_dir or f"/tmp/ssl_step_trace_{method}"
    # reuse the bench builders but run exactly ONE traced step: wrap the
    # bench fn so its timed loop is 1 iter, then trace a second call.
    bench = {
        "dino": bench_all.bench_dino_step,
        "moco": bench_all.bench_moco_step,
        "simclr": bench_all.bench_simclr_step,
    }[method]

    # Trace one bench call (iters=3): the device lane then holds the
    # warm step + 3 timed steps (XLA:TPU compiles host-side, so no
    # autotune executions pollute the lane; param-init ops are noise-
    # level next to 4 full steps).
    jax.profiler.start_trace(trace_dir, create_perfetto_trace=False)
    tput, utts = bench(batch=batch, iters=3, compute_dtype=jnp.bfloat16)
    jax.profiler.stop_trace()
    print(f"[{method}] traced pass {tput:.0f} audio-s/s ({utts:.0f} utts/s)")

    # report() normalizes by loop_steps*batch*num_frms*0.01 audio-s per
    # dispatch; the traced window holds 4 steps (1 init + 3 timed) of
    # audio_per_step seconds each — feed equivalents so the device
    # audio-s/s line is right.  audio accounting matches the bench:
    # dino 2*2+4*1 s, moco/simclr 2 views x 2 s.
    audio_per_step = {"dino": 8.0, "moco": 4.0, "simclr": 4.0}[method]
    perf_trace.report(trace_dir, loop_steps=4, batch=batch,
                      num_frms=int(audio_per_step * 100), top=18)


if __name__ == "__main__":
    a = sys.argv[1:]
    main(a[0] if a else "dino", int(a[1]) if len(a) > 1 else 64)
