"""Perf lab (round 2): in-situ train-step stage attribution + transfer cost.

Measures the SAME compiled train step with progressively ablated batch
contents, so stage costs include real fusion effects:

  full   : wav + speed_idx + aug(rir/noise/snr)  (production batch)
  noaug  : wav + speed_idx                        -> delta = reverb/noise
  nospeed: wav only                               -> delta = speed perturb
  feats  : precomputed fbank features             -> delta = fbank(+specaug)
  (feats time itself = model fwd+bwd+optimizer)

All timings fetch-forced + scanned (docs/PERF_NOTES.md methodology).
Run: python perf_lab.py stages | transfer
"""

import argparse
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

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

B = 128
NUM_FRMS = 200
NUM_CLASS = 17982
K = 8  # scanned steps per dispatch
ITERS = 8


def build(mode, dither=1.0, spec_aug=True, loop_steps=K, model_name="ECAPA_TDNN_GLOB_c1024"):
    backbone = get_speaker_model(model_name)(feat_dim=80, embed_dim=192)
    projection = get_projection(
        {"project_type": "arc_margin", "embed_dim": 192,
         "num_class": NUM_CLASS, "scale": 32.0}
    )
    net = SpeakerNet(backbone=backbone, projection=projection)
    lr = ExponentialDecrease(
        num_epochs=150, epoch_iter=1000, initial_lr=0.1, final_lr=5e-5,
        warm_up_epoch=6,
    )
    margin = MarginSchedule(
        epoch_iter=1000, increase_start_epoch=20, fix_start_epoch=40,
        initial_margin=0.0, final_margin=0.2,
    )
    tx = make_optimizer(lr, "SGD", weight_decay=1e-4)
    chunk = chunk_samples_for_frames(NUM_FRMS)
    in_len = speed_input_len(chunk)
    state = create_train_state(
        net, tx, jax.random.key(0),
        jnp.zeros((B, NUM_FRMS, 80)), jnp.zeros((B,), jnp.int32),
    )
    fcfg = FeaturePipelineConfig(
        fbank=FbankConfig(dither=dither), spec_aug=spec_aug
    )
    if mode == "feats":
        # 'feats' isolates model fwd+bwd+optimizer time: keep the
        # in-graph CMVN/SpecAug the feat path now applies (data_type=
        # feat parity) OUT of this measurement
        fcfg = FeaturePipelineConfig(
            fbank=FbankConfig(dither=dither),
            cmvn_norm_mean=False, spec_aug=False,
        )
    step = make_train_step(net, tx, lr, margin, feature_cfg=fcfg,
                           chunk_samples=chunk, compute_dtype=jnp.bfloat16,
                           num_steps=loop_steps)

    rng = np.random.default_rng(0)
    b = {"label": jnp.asarray(rng.integers(0, NUM_CLASS, B))}
    if mode == "feats":
        b["feat"] = jnp.asarray(
            rng.standard_normal((B, NUM_FRMS, 80)), jnp.float32)
    else:
        b["wav"] = jnp.asarray(
            rng.standard_normal((B, in_len)) * 0.1, jnp.float32)
    if mode in ("full", "noaug"):
        b["speed_idx"] = jnp.asarray(rng.integers(0, 3, B), jnp.int32)
    if mode == "packed":
        b["speed_idx"] = jnp.asarray(rng.integers(0, 3, B), jnp.int32)
        n_rev = n_noise = int(B * 0.6 / 2)  # aug_prob 0.6 split 50/50
        b["rir"] = jnp.asarray(
            rng.standard_normal((n_rev, 8000)), jnp.float32)
        b["noise"] = jnp.asarray(
            rng.standard_normal((n_noise, chunk)) * 0.05, jnp.float32)
        b["snr"] = jnp.full((n_noise,), 10.0, jnp.float32)
    if mode == "full":
        b["aug_type"] = jnp.asarray(rng.integers(0, 3, B), jnp.int32)
        b["rir"] = jnp.asarray(rng.standard_normal((B, 8000)), jnp.float32)
        b["noise"] = jnp.asarray(
            rng.standard_normal((B, chunk)) * 0.05, jnp.float32)
        b["snr"] = jnp.full((B,), 10.0, jnp.float32)
    if mode == "nospeed":
        # wav must already be chunk length (no resample margin)
        b["wav"] = b["wav"][:, :chunk]
    if loop_steps > 1:
        b = {k: jnp.broadcast_to(v, (loop_steps,) + v.shape)
             for k, v in b.items()}
    return step, state, b


def time_step(step, state, b, loop_steps=K, iters=ITERS):
    key = jax.random.key(1)
    state, m = step(state, b, key)
    loss = m["loss"][-1] if loop_steps > 1 else m["loss"]
    float(loss)  # compile + fetch-forced warmup
    t0 = time.perf_counter()
    for _ in range(iters):
        state, m = step(state, b, key)
    loss = m["loss"][-1] if loop_steps > 1 else m["loss"]
    float(loss)
    dt = time.perf_counter() - t0
    return dt / (iters * loop_steps) * 1e3  # ms/step


def cmd_stages(args):
    out = {}
    for mode in ("full", "packed", "noaug", "nospeed", "feats"):
        step, state, b = build(mode)
        ms = time_step(step, state, b)
        out[mode] = round(ms, 2)
        print(json.dumps({"mode": mode, "ms_per_step": out[mode]}), flush=True)
    # variants on the fbank path
    step, state, b = build("nospeed", dither=0.0, spec_aug=False)
    out["nospeed_nodither"] = round(time_step(step, state, b), 2)
    print(json.dumps({"mode": "nospeed_nodither",
                      "ms_per_step": out["nospeed_nodither"]}), flush=True)
    d = out
    print(json.dumps({
        "reverb_noise_ms": round(d["full"] - d["noaug"], 2),
        "speed_ms": round(d["noaug"] - d["nospeed"], 2),
        "fbank_specaug_ms": round(d["nospeed"] - d["feats"], 2),
        "dither_specaug_ms": round(d["nospeed"] - d["nospeed_nodither"], 2),
        "model_opt_ms": d["feats"],
    }), flush=True)


def cmd_transfer(args):
    """Host->device transfer cost through the tunnel: f32 vs int16 batch."""
    chunk = chunk_samples_for_frames(NUM_FRMS)
    in_len = speed_input_len(chunk)
    rng = np.random.default_rng(0)
    wav32 = (rng.standard_normal((K, B, in_len)) * 0.1).astype(np.float32)
    noise32 = (rng.standard_normal((K, B, chunk)) * 0.05).astype(np.float32)
    rir32 = rng.standard_normal((K, B, 8000)).astype(np.float32)
    wav16 = (wav32 * 32768).astype(np.int16)
    noise16 = (noise32 * 32768).astype(np.int16)

    @jax.jit
    def consume(*arrs):
        return sum(jnp.sum(a[..., ::997].astype(jnp.float32)) for a in arrs)

    def timed(arrs, iters=6):
        float(consume(*[jnp.asarray(a) for a in arrs]))  # warm compile
        t0 = time.perf_counter()
        for _ in range(iters):
            dev = [jnp.asarray(a) for a in arrs]
            float(consume(*dev))
        return (time.perf_counter() - t0) / iters * 1e3

    mb32 = sum(a.nbytes for a in (wav32, noise32, rir32)) / 1e6
    mb16 = sum(a.nbytes for a in (wav16, noise16, rir32)) / 1e6
    ms32 = timed((wav32, noise32, rir32))
    ms16 = timed((wav16, noise16, rir32))
    print(json.dumps({
        "f32_ms_per_dispatch": round(ms32, 1), "f32_MB": round(mb32, 1),
        "int16_ms_per_dispatch": round(ms16, 1), "int16_MB": round(mb16, 1),
        "f32_ms_per_step": round(ms32 / K, 2),
        "int16_ms_per_step": round(ms16 / K, 2),
    }), flush=True)




def cmd_model(args):
    """Decompose the feats-only step: fwd, fwd+bwd, head type, batch scale."""
    from wespeaker_hubert_tpu.train import cross_entropy

    rng = np.random.default_rng(0)

    def setup(num_class=NUM_CLASS, proj="arc_margin", b=B):
        backbone = get_speaker_model("ECAPA_TDNN_GLOB_c1024")(
            feat_dim=80, embed_dim=192)
        projection = get_projection(
            {"project_type": proj, "embed_dim": 192,
             "num_class": num_class, "scale": 32.0})
        net = SpeakerNet(backbone=backbone, projection=projection)
        lr = ExponentialDecrease(num_epochs=150, epoch_iter=1000,
                                 initial_lr=0.1, final_lr=5e-5, warm_up_epoch=6)
        tx = make_optimizer(lr, "SGD", weight_decay=1e-4)
        state = create_train_state(net, tx, jax.random.key(0),
                                   jnp.zeros((b, NUM_FRMS, 80)),
                                   jnp.zeros((b,), jnp.int32))
        feats = jnp.asarray(rng.standard_normal((b, NUM_FRMS, 80)), jnp.float32)
        labels = jnp.asarray(rng.integers(0, num_class, b))
        return net, tx, state, feats, labels

    def timed(fn, *a, iters=ITERS):
        r = fn(*a); jax.tree.map(lambda x: None, r)
        float(jnp.asarray(jax.tree.leaves(r)[0]).ravel()[0])
        t0 = time.perf_counter()
        for _ in range(iters):
            r = fn(*a)
        float(jnp.asarray(jax.tree.leaves(r)[0]).ravel()[0])
        return (time.perf_counter() - t0) / (iters * K) * 1e3

    out = {}
    for tag, proj, b in [("arc_b128", "arc_margin", B),
                         ("linear_b128", "linear", B),
                         ("arc_b256", "arc_margin", 256),
                         ("arc_b512", "arc_margin", 512)]:
        net, tx, state, feats, labels = setup(proj=proj, b=b)
        cast = lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x

        def loss_fn(params, feats, labels):
            variables = {"params": jax.tree.map(cast, params)}
            if state.batch_stats:
                variables["batch_stats"] = state.batch_stats
            (emb, logits, aux), upd = net.apply(
                variables, feats.astype(jnp.bfloat16), labels, 0.1,
                train=True, mutable=["batch_stats"])
            return cross_entropy(logits.astype(jnp.float32), labels)

        @jax.jit
        def fwd(params, feats, labels):
            def body(c, _):
                l = loss_fn(params, feats * (1 + c * 1e-30), labels)
                return l, None
            return jax.lax.scan(body, jnp.float32(0), None, length=K)[0]

        @jax.jit
        def fwdbwd(params, feats, labels):
            def body(c, _):
                l, g = jax.value_and_grad(loss_fn)(
                    params, feats * (1 + c * 1e-30), labels)
                return l + jax.tree.leaves(g)[0].ravel()[0].astype(jnp.float32), None
            return jax.lax.scan(body, jnp.float32(0), None, length=K)[0]

        ms_f = timed(fwd, state.params, feats, labels)
        ms_fb = timed(fwdbwd, state.params, feats, labels)
        scale = b / B
        out[tag] = (ms_f, ms_fb)
        print(json.dumps({"cfg": tag, "fwd_ms": round(ms_f, 2),
                          "fwdbwd_ms": round(ms_fb, 2),
                          "fwd_ms_per128": round(ms_f / scale, 2),
                          "fwdbwd_ms_per128": round(ms_fb / scale, 2)}),
              flush=True)
        if tag == "arc_b128":
            lowered = jax.jit(lambda p, f, l: jax.value_and_grad(loss_fn)(p, f, l)
                              ).lower(state.params, feats, labels)
            ca = lowered.compile().cost_analysis()
            if isinstance(ca, (list, tuple)):
                ca = ca[0]
            print(json.dumps({"cost_flops_G": round(ca.get("flops", 0) / 1e9, 1),
                              "bytes_GB": round(ca.get("bytes accessed", 0) / 1e9, 2)}),
                  flush=True)


def cmd_remat(args):
    """Full train step (feats mode) with/without remat of the model apply."""
    from wespeaker_hubert_tpu.train import cross_entropy
    import optax

    rng = np.random.default_rng(0)
    backbone = get_speaker_model("ECAPA_TDNN_GLOB_c1024")(
        feat_dim=80, embed_dim=192)
    projection = get_projection(
        {"project_type": "arc_margin", "embed_dim": 192,
         "num_class": NUM_CLASS, "scale": 32.0})
    net = SpeakerNet(backbone=backbone, projection=projection)
    lr = ExponentialDecrease(num_epochs=150, epoch_iter=1000,
                             initial_lr=0.1, final_lr=5e-5, warm_up_epoch=6)
    tx = make_optimizer(lr, "SGD", weight_decay=1e-4)
    state = create_train_state(net, tx, jax.random.key(0),
                               jnp.zeros((B, NUM_FRMS, 80)),
                               jnp.zeros((B,), jnp.int32))
    feats = jnp.asarray(rng.standard_normal((B, NUM_FRMS, 80)), jnp.float32)
    labels = jnp.asarray(rng.integers(0, NUM_CLASS, B))
    cast = lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x

    def make_step(remat_policy):
        def apply_model(params, feats, labels):
            variables = {"params": jax.tree.map(cast, params)}
            if state.batch_stats:
                variables["batch_stats"] = state.batch_stats
            (emb, logits, aux), upd = net.apply(
                variables, feats.astype(jnp.bfloat16), labels, 0.1,
                train=True, mutable=["batch_stats"])
            return logits.astype(jnp.float32), upd

        if remat_policy == "full":
            apply_model = jax.checkpoint(apply_model)
        elif remat_policy == "dots":
            apply_model = jax.checkpoint(
                apply_model,
                policy=jax.checkpoint_policies.dots_saveable)

        def loss_fn(params, feats, labels):
            logits, upd = apply_model(params, feats, labels)
            return cross_entropy(logits, labels), upd

        def one_step(st, feats, labels):
            (loss, upd), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                st.params, feats, labels)
            updates, nos = tx.update(grads, st.opt_state, st.params)
            new_params = optax.apply_updates(st.params, updates)
            return st.replace(step=st.step + 1, params=new_params,
                              opt_state=nos,
                              batch_stats=upd.get("batch_stats", {})), loss

        @jax.jit
        def scanned(st, feats, labels):
            def body(c, _):
                return one_step(c, feats, labels)
            return jax.lax.scan(body, st, None, length=K)
        return scanned

    for policy in ("none", "dots", "full"):
        stepf = make_step(policy)
        st2, losses = stepf(state, feats, labels)
        float(losses[-1])
        t0 = time.perf_counter()
        for _ in range(ITERS):
            st2, losses = stepf(state, feats, labels)
        float(losses[-1])
        ms = (time.perf_counter() - t0) / (ITERS * K) * 1e3
        print(json.dumps({"remat": policy, "ms_per_step": round(ms, 2)}),
              flush=True)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("cmd", choices=["stages", "transfer", "model", "remat"])
    args = p.parse_args()
    {"stages": cmd_stages, "transfer": cmd_transfer, "model": cmd_model, "remat": cmd_remat}[args.cmd](args)


if __name__ == "__main__":
    main()
