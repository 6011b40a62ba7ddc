"""Per-op device trace of the production train step (round 2, VERDICT #7).

jax.profiler traces DO capture the remote chip's device lane (the
round-1 "no files through the tunnel" failure does not reproduce); this
lab traces one scanned dispatch of the exact bench_all.bench_train_step
graph and aggregates TPU-lane op durations, closing the loop on the
stage-wise attribution (perf_lab.py / perf_model_ab.py) with a real
hardware timeline.

Usage: python perf_trace.py [loop_steps] [batch]
Prints: total device time per dispatch, and the top HLO ops by summed
duration with their share of the step.
"""

import glob
import gzip
import json
import os
import sys
import collections

import jax
import jax.numpy as jnp
import numpy as np

import bench_all


def capture(loop_steps=8, batch=128, trace_dir="/tmp/train_trace",
            model="ECAPA_TDNN_GLOB_c1024"):
    step, state, b, key = _build_step(loop_steps, batch, model)
    state, m = step(state, b, key)  # compile + warm
    float(m["loss"] if loop_steps == 1 else m["loss"][-1])

    jax.profiler.start_trace(trace_dir, create_perfetto_trace=False)
    state, m = step(state, b, key)
    float(m["loss"] if loop_steps == 1 else m["loss"][-1])
    jax.profiler.stop_trace()


def report(trace_dir="/tmp/train_trace", loop_steps=8, batch=128,
           num_frms=200, top=25):
    runs = sorted(glob.glob(os.path.join(
        trace_dir, "plugins/profile/*/*.trace.json.gz")))
    path = runs[-1]
    d = json.load(gzip.open(path))
    pids = {e["pid"]: e["args"].get("name") for e in d["traceEvents"]
            if e.get("ph") == "M" and e.get("name") == "process_name"}
    tids = {(e["pid"], e["tid"]): e["args"].get("name")
            for e in d["traceEvents"]
            if e.get("ph") == "M" and e.get("name") == "thread_name"}
    tpu_pids = {p for p, n in pids.items() if n and "TPU" in n}
    op_lanes = {k for k, n in tids.items()
                if k[0] in tpu_pids and n == "XLA Ops"}
    mod_lanes = {k for k, n in tids.items()
                 if k[0] in tpu_pids and n == "XLA Modules"}

    ops = collections.Counter()
    counts = collections.Counter()
    cat_ms = collections.Counter()
    cat_bytes = collections.Counter()
    cat_flops = collections.Counter()
    op_meta = {}
    module_ms = 0.0
    for e in d["traceEvents"]:
        if e.get("ph") != "X":
            continue
        lane = (e.get("pid"), e.get("tid"))
        if lane in mod_lanes:
            module_ms += e.get("dur", 0) / 1e3
            continue
        if lane not in op_lanes:
            continue
        name, args = e["name"], e.get("args", {})
        cat = args.get("hlo_category", "?")
        if cat == "while":  # container for the scanned steps
            continue
        ms = e.get("dur", 0) / 1e3
        ops[name] += ms
        counts[name] += 1
        cat_ms[cat] += ms
        cat_bytes[cat] += int(args.get("bytes_accessed", 0))
        cat_flops[cat] += int(args.get("model_flops", 0))
        if name not in op_meta:
            op_meta[name] = (cat, int(args.get("bytes_accessed", 0)),
                             int(args.get("model_flops", 0)))
    dev_ms = sum(ops.values())
    audio_s = batch * num_frms * 0.01 * loop_steps
    print(json.dumps({
        "trace": path,
        "module_ms_per_step": round(module_ms / loop_steps, 2),
        "device_op_ms_per_step": round(dev_ms / loop_steps, 2),
        "audio_s_per_s_device": round(audio_s / (dev_ms / 1e3), 0),
    }))
    print("-- by hlo_category (per step) --")
    for cat, ms in cat_ms.most_common():
        row = {"category": cat, "ms": round(ms / loop_steps, 3),
               "pct": round(100 * ms / dev_ms, 1)}
        if cat_flops[cat]:
            row["tflops_s"] = round(cat_flops[cat] / 1e9 / ms, 1)
        if cat_bytes[cat]:
            row["gb_s"] = round(cat_bytes[cat] / 1e6 / ms, 0)
        print(json.dumps(row))
    print(f"-- top {top} ops (per step) --")
    for name, ms in ops.most_common(top):
        cat, by, fl = op_meta[name]
        row = {"op": name[:48], "cat": cat,
               "ms": round(ms / loop_steps, 3),
               "pct": round(100 * ms / dev_ms, 1)}
        if fl:
            row["tflops_s"] = round(fl * counts[name] / 1e9 / ms, 1)
        if by:
            row["gb_s"] = round(by * counts[name] / 1e6 / ms, 0)
        print(json.dumps(row))


def _build_step(loop_steps=8, batch=128, model="ECAPA_TDNN_GLOB_c1024"):
    """Same production step as capture(); returns (step, state, b, key)."""
    from wespeaker_hubert_tpu.data.dataset import chunk_samples_for_frames
    from wespeaker_hubert_tpu.models import get_projection, get_speaker_model
    from wespeaker_hubert_tpu.models.speaker_net import SpeakerNet
    from wespeaker_hubert_tpu.ops.augment import speed_input_len
    from wespeaker_hubert_tpu.ops.fbank import FbankConfig
    from wespeaker_hubert_tpu.ops.pipeline import FeaturePipelineConfig
    from wespeaker_hubert_tpu.train import (
        ExponentialDecrease,
        MarginSchedule,
        create_train_state,
        make_optimizer,
        make_train_step,
    )

    num_frms, num_class = 200, 17982
    backbone = get_speaker_model(model)(feat_dim=80, embed_dim=192)
    projection = get_projection(
        {"project_type": "arc_margin", "embed_dim": 192,
         "num_class": num_class, "scale": 32.0})
    net = SpeakerNet(backbone=backbone, projection=projection)
    lr = ExponentialDecrease(num_epochs=150, epoch_iter=1000,
                             initial_lr=0.1, final_lr=5e-5, warm_up_epoch=6)
    margin = MarginSchedule(epoch_iter=1000, increase_start_epoch=20,
                            fix_start_epoch=40, initial_margin=0.0,
                            final_margin=0.2)
    tx = make_optimizer(lr, "SGD", weight_decay=1e-4)
    chunk = chunk_samples_for_frames(num_frms)
    in_len = speed_input_len(chunk)
    state = create_train_state(
        net, tx, jax.random.key(0),
        jnp.zeros((batch, num_frms, 80)), jnp.zeros((batch,), jnp.int32))
    fcfg = FeaturePipelineConfig(fbank=FbankConfig(dither=1.0), spec_aug=True)
    step = make_train_step(net, tx, lr, margin, feature_cfg=fcfg,
                           chunk_samples=chunk,
                           compute_dtype=jnp.bfloat16, num_steps=loop_steps)
    rng = np.random.default_rng(0)
    n_rev = n_noise = int(batch * 0.6 / 2)
    b = {
        "wav": jnp.asarray(rng.standard_normal((batch, in_len)) * 0.1,
                           jnp.float32),
        "speed_idx": jnp.asarray(rng.integers(0, 3, batch), jnp.int32),
        "label": jnp.asarray(rng.integers(0, num_class, batch)),
        "rir": jnp.asarray(rng.standard_normal((n_rev, 8000)), jnp.float32),
        "noise": jnp.asarray(rng.standard_normal((n_noise, chunk)) * 0.05,
                             jnp.float32),
        "snr": jnp.full((n_noise,), 10.0, jnp.float32),
    }
    if loop_steps > 1:
        b = {k: jnp.broadcast_to(v, (loop_steps,) + v.shape)
             for k, v in b.items()}
    return step, state, b, jax.random.key(1)


def attribute(fusions, loop_steps=8, batch=128,
              hlo_path="/tmp/train_step_opt.hlo"):
    """Dump the optimized HLO of the production step and print the fused
    computations behind the named trace fusions (with their op_name
    source metadata) so each hot op maps back to model code."""
    if not os.path.exists(hlo_path):
        step, state, b, key = _build_step(loop_steps, batch)
        compiled = jax.jit(step).lower(state, b, key).compile()
        with open(hlo_path, "w") as f:
            f.write(compiled.as_text())
    text = open(hlo_path).read()
    import re
    for fu in fusions:
        m = re.search(rf"%{re.escape(fu)} = .*calls=%([\w.\-]+)", text)
        print(f"=== {fu} ===")
        if not m:
            print("  (not found in optimized HLO)")
            continue
        comp = m.group(1)
        cm = re.search(
            rf"%{re.escape(comp)}[^\n]*\{{\n(.*?)\n\}}", text, re.S)
        if not cm:
            print("  (computation body not found)")
            continue
        body = cm.group(1)
        # summarize: op kinds + source metadata
        kinds = collections.Counter(
            re.findall(r"= \S+ ([a-z\-]+)\(", body))
        print("  ops:", dict(kinds.most_common(12)))
        for mo in set(re.findall(r'op_name="([^"]+)"', body)):
            print("  src:", mo[:140])


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "attribute":
        attribute(sys.argv[2:] or ["fusion.1987", "fusion.2074",
                                   "fusion.1988", "multiply_add_fusion.704"])
    else:
        ls = int(sys.argv[1]) if len(sys.argv) > 1 else 8
        bs = int(sys.argv[2]) if len(sys.argv) > 2 else 128
        capture(ls, bs)
        report(loop_steps=ls, batch=bs)
