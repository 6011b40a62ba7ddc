"""WavLM-Large SSL-frontend extraction: device trace + roofline.

The namesake workload (reference run_wavlm recipes, s3prl frontend):
wav -> conv feature extractor -> 24 pre-LN transformer layers with gated
relative-position-bias attention -> layer-weighted featurizer -> ECAPA
backbone -> embedding, bf16.  This lab traces one dispatch of the exact
bench_all.bench_ssl_frontend_extract graph on the TPU and reports
per-category device time + FLOP utilization, the same methodology as
perf_trace.py for the supervised step.

Usage: python perf_ssl.py [batch] [seconds]
"""

import sys

import jax
import jax.numpy as jnp
import numpy as np

import perf_trace


def build_embed(batch=16, seconds=10.0, upstream="wavlm_large"):
    from wespeaker_hubert_tpu.frontend import SSLEncoderConfig, SSLFrontend
    from wespeaker_hubert_tpu.models import get_speaker_model
    from wespeaker_hubert_tpu.models.speaker_net import SpeakerNet
    from wespeaker_hubert_tpu.train import cast_variables_bf16, make_eval_embed

    enc_cfg = getattr(SSLEncoderConfig, upstream)()
    frontend = SSLFrontend(enc_cfg, frozen=True, multilayer_feature=True)
    backbone = get_speaker_model("ECAPA_TDNN_c512")(
        feat_dim=enc_cfg.hidden_size, embed_dim=192)
    net = SpeakerNet(backbone=backbone, projection=None, frontend=frontend)

    n = int(seconds * 16000)
    rng = np.random.default_rng(0)
    wav = jnp.asarray(rng.standard_normal((batch, n)) * 0.1, jnp.float32)

    fvars = net.init(jax.random.key(0), wav[:1], train=False,
                     method=net.features)
    feats, _ = net.apply(fvars, wav[:1], train=False, method=net.features)
    bvars = backbone.init(jax.random.key(1), feats, train=False)
    variables = cast_variables_bf16({
        "params": {**fvars["params"], "backbone": bvars["params"]},
        "batch_stats": {
            **fvars.get("batch_stats", {}),
            "backbone": bvars.get("batch_stats", {}),
        },
    })
    embed_fn = make_eval_embed(net, compute_dtype=jnp.bfloat16)
    return embed_fn, variables, {"wav": wav}


def main(batch=16, seconds=10.0, trace_dir="/tmp/ssl_trace"):
    embed_fn, variables, b = build_embed(batch, seconds)
    out = embed_fn(variables, b)  # compile + warm
    _ = np.asarray(out[:1, :1])

    # FLOP estimate from the compiled module
    lowered = jax.jit(embed_fn).lower(variables, b)
    cost = lowered.compile().cost_analysis()
    if isinstance(cost, list):
        cost = cost[0]
    gflops = cost.get("flops", 0) / 1e9
    print(f"cost_analysis: {gflops:.0f} GFLOP per dispatch "
          f"({gflops / (batch * seconds):.1f} GFLOP per audio-second)")

    import time
    t0 = time.perf_counter()
    iters = 5
    for _ in range(iters):
        out = embed_fn(variables, b)
    _ = np.asarray(out[:1, :1])
    dt = time.perf_counter() - t0
    wall_tput = batch * seconds * iters / dt
    print(f"wall: {dt / iters * 1e3:.1f} ms/dispatch, "
          f"{wall_tput:.0f} audio-s/s, "
          f"{gflops / (dt / iters) / 1e3:.1f} TFLOP/s achieved")

    jax.profiler.start_trace(trace_dir, create_perfetto_trace=False)
    out = embed_fn(variables, b)
    _ = np.asarray(out[:1, :1])
    jax.profiler.stop_trace()
    perf_trace.report(trace_dir, loop_steps=1, batch=batch,
                      num_frms=int(seconds * 100), top=25)



def attribute(fusions=("fusion.4487", "fusion.4406", "fusion.3436",
                       "fusion.423", "multiply_reduce_fusion",
                       "fusion.4515"),
              batch=16, seconds=10.0, hlo_path="/tmp/ssl_embed_opt.hlo"):
    """Dump optimized HLO of the extraction graph and map hot trace
    fusions back to source ops (perf_trace.attribute pattern)."""
    import collections
    import os
    import re

    if not os.path.exists(hlo_path):
        embed_fn, variables, b = build_embed(batch, seconds)
        compiled = jax.jit(embed_fn).lower(variables, b).compile()
        with open(hlo_path, "w") as f:
            f.write(compiled.as_text())
    text = open(hlo_path).read()
    for fu in fusions:
        m = re.search(rf"%{re.escape(fu)} = .*calls=%([\w.\-]+)", text)
        print(f"=== {fu} ===")
        if not m:
            print("  (not found)")
            continue
        comp = m.group(1)
        cm = re.search(rf"%{re.escape(comp)}[^\n]*\{{\n(.*?)\n\}}", text, re.S)
        if not cm:
            print("  (body not found)")
            continue
        body = cm.group(1)
        kinds = collections.Counter(re.findall(r"= \S+ ([a-z\-]+)\(", body))
        print("  ops:", dict(kinds.most_common(12)))
        for mo in sorted(set(re.findall(r'op_name="([^"]+)"', body)))[:8]:
            print("  src:", mo[:160])


def flash_ab(batch=16, seconds=10.0, upstream="wavlm_large"):
    """A/B: einsum attention vs Pallas flash attention on the full
    extraction graph — throughput + embedding agreement (same weights)."""
    import dataclasses
    import time

    from wespeaker_hubert_tpu.frontend import SSLEncoderConfig, SSLFrontend
    from wespeaker_hubert_tpu.models import get_speaker_model
    from wespeaker_hubert_tpu.models.speaker_net import SpeakerNet
    from wespeaker_hubert_tpu.train import cast_variables_bf16, make_eval_embed

    n = int(seconds * 16000)
    rng = np.random.default_rng(0)
    wav = jnp.asarray(rng.standard_normal((batch, n)) * 0.1, jnp.float32)
    b = {"wav": wav}

    outs, tputs = {}, {}
    variables = None
    for impl in ("einsum", "flash"):
        enc_cfg = dataclasses.replace(
            getattr(SSLEncoderConfig, upstream)(), attn_impl=impl)
        frontend = SSLFrontend(enc_cfg, frozen=True, multilayer_feature=True)
        backbone = get_speaker_model("ECAPA_TDNN_c512")(
            feat_dim=enc_cfg.hidden_size, embed_dim=192)
        net = SpeakerNet(backbone=backbone, projection=None,
                         frontend=frontend)
        if variables is None:  # same param structure for both impls
            fvars = net.init(jax.random.key(0), wav[:1], train=False,
                             method=net.features)
            feats, _ = net.apply(fvars, wav[:1], train=False,
                                 method=net.features)
            bvars = backbone.init(jax.random.key(1), feats, train=False)
            variables = cast_variables_bf16({
                "params": {**fvars["params"], "backbone": bvars["params"]},
                "batch_stats": {
                    **fvars.get("batch_stats", {}),
                    "backbone": bvars.get("batch_stats", {}),
                },
            })
        embed_fn = make_eval_embed(net, compute_dtype=jnp.bfloat16)
        out = embed_fn(variables, b)
        outs[impl] = np.asarray(out)
        t0 = time.perf_counter()
        iters = 5
        for _ in range(iters):
            out = embed_fn(variables, b)
        _ = np.asarray(out[:1, :1])
        dt = time.perf_counter() - t0
        tputs[impl] = batch * seconds * iters / dt
        print(f"{impl}: {dt / iters * 1e3:.1f} ms/dispatch, "
              f"{tputs[impl]:.0f} audio-s/s")
    e, f = outs["einsum"], outs["flash"]
    cos = np.sum(e * f, -1) / (
        np.linalg.norm(e, axis=-1) * np.linalg.norm(f, axis=-1))
    print(f"embedding cosine flash-vs-einsum: min {cos.min():.6f}")
    print(f"speedup: {tputs['flash'] / tputs['einsum']:.3f}x")


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "flash_ab":
        bs = int(sys.argv[2]) if len(sys.argv) > 2 else 16
        sec = float(sys.argv[3]) if len(sys.argv) > 3 else 10.0
        flash_ab(bs, sec, *sys.argv[4:5])
    elif len(sys.argv) > 1 and sys.argv[1] == "attribute":
        attribute(*([tuple(sys.argv[2:])] if len(sys.argv) > 2 else []))
    else:
        bs = int(sys.argv[1]) if len(sys.argv) > 1 else 16
        sec = float(sys.argv[2]) if len(sys.argv) > 2 else 10.0
        main(bs, sec)
