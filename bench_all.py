"""Extended benchmark suite: extraction throughput across models + dtypes
+ a training-step throughput measurement.  Each result prints as a JSON
line; bench.py remains the driver's single-line entry point.

Run: python bench_all.py [--models ECAPA_TDNN_c512,ResNet34] [--train]
"""

import argparse
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

# reference CPU RTFs (runtime/onnxruntime/README.md:70-90, Xeon 8160 1 thread)
CPU_RTF = {
    "ECAPA_TDNN_c512": 0.018351,
    "ECAPA_TDNN_c1024": 0.041724,
    "ResNet34": 0.060735,
    "ResNet50": 0.073231,
    "ResNet101": 0.124613,
    "ResNet152": 0.179379,
    "REPVGG_TINY_A0": 0.055117,
    "ResNet221": 0.267511,
    "ResNet293": 0.364011,
    "CAMPPlus": 0.022978,
}

SR = 16000


def bench_extract(model_name, batch, seconds, dtype, iters=10,
                  feat_dim=None):
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
        # ReDimNet's stage geometry requires its published mel count
        feat_dim = 72 if model_name.startswith("ReDimNet") else 80
    model_kw = {}
    if model_name.startswith("ReDimNet"):
        # production knob (same adjudication as the SSL encoder): tanh
        # GELU avoids f32 erf-polynomial copies of every stage tensor;
        # embedding cosine vs erf 0.99998 in bf16 (PERF_NOTES round 4)
        model_kw["gelu_impl"] = "tanh"
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
            if x.dtype == jnp.float32
            else x,
            variables,
        )
    # pallas spectrum: +7% end-to-end vs matmul-DFT (falls back off-TPU)
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
    _ = np.asarray(run(wav)[:1, :1])  # compile + fetch-forced warmup
    t0 = time.perf_counter()
    for _ in range(iters):
        out = run(wav)
    _ = np.asarray(out[:1, :1])  # fetch forces completion (see bench.py)
    dt = time.perf_counter() - t0
    return batch * seconds * iters / dt


def bench_train_step(model_name, batch, num_frms=200, num_class=17982,
                     iters=10, compute_dtype=None, loop_steps=1,
                     packed=True):
    """Supervised train-step throughput (audio-seconds/s) with the full
    in-graph pipeline: speed perturb + reverb/noise + fbank + backbone +
    class-sharded-capable ArcMargin head + SGD."""
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

    backbone = get_speaker_model(model_name)(feat_dim=80, embed_dim=192)
    projection = get_projection(
        {"project_type": "arc_margin", "embed_dim": 192,
         "num_class": num_class, "scale": 32.0}
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
    chunk = chunk_samples_for_frames(num_frms)
    in_len = speed_input_len(chunk)
    state = create_train_state(
        net, tx, jax.random.key(0),
        jnp.zeros((batch, num_frms, 80)), jnp.zeros((batch,), jnp.int32),
    )
    fcfg = FeaturePipelineConfig(
        fbank=FbankConfig(dither=1.0), spec_aug=True
    )
    step = make_train_step(net, tx, lr, margin, feature_cfg=fcfg,
                           chunk_samples=chunk, compute_dtype=compute_dtype,
                           num_steps=loop_steps)

    rng = np.random.default_rng(0)
    b = {
        "wav": jnp.asarray(
            rng.standard_normal((batch, in_len)) * 0.1, jnp.float32
        ),
        "speed_idx": jnp.asarray(rng.integers(0, 3, batch), jnp.int32),
        "label": jnp.asarray(rng.integers(0, num_class, batch)),
    }
    if packed:
        # production layout (dataset packed_aug=True, aug_prob 0.6 split
        # 50/50 reverb/noise): fixed-count slots, FFT reverb on reverb
        # rows only (ops/augment.add_reverb_noise_packed)
        n_rev = n_noise = int(batch * 0.6 / 2)
        b["rir"] = jnp.asarray(
            rng.standard_normal((n_rev, 8000)), jnp.float32)
        b["noise"] = jnp.asarray(
            rng.standard_normal((n_noise, chunk)) * 0.05, jnp.float32)
        b["snr"] = jnp.full((n_noise,), 10.0, jnp.float32)
    else:
        b["aug_type"] = jnp.asarray(rng.integers(0, 3, batch), jnp.int32)
        b["rir"] = jnp.asarray(
            rng.standard_normal((batch, 8000)), jnp.float32)
        b["noise"] = jnp.asarray(
            rng.standard_normal((batch, chunk)) * 0.05, jnp.float32)
        b["snr"] = jnp.full((batch,), 10.0, jnp.float32)
    key = jax.random.key(1)
    if loop_steps > 1:
        b = {k: jnp.broadcast_to(v, (loop_steps,) + v.shape) for k, v in b.items()}
    state, m0 = step(state, b, key)  # compile
    loss0 = m0["loss"] if loop_steps == 1 else m0["loss"][-1]
    float(loss0)  # fetch-forced warmup
    t0 = time.perf_counter()
    for _ in range(iters):
        state, metrics = step(state, b, key)
    loss = metrics["loss"] if loop_steps == 1 else metrics["loss"][-1]
    float(loss)  # fetch forces completion (see bench.py)
    dt = time.perf_counter() - t0
    audio_s = batch * (num_frms * 0.01) * iters * loop_steps
    return audio_s / dt, batch * iters * loop_steps / dt


def bench_ssl_frontend_extract(batch=16, seconds=10.0, iters=5,
                               upstream="wavlm_large",
                               attn_impl="einsum"):
    """WavLM-Large frontend + ECAPA c512 extraction throughput, bf16
    (the reference's run_wavlm.sh deployment path; weights random — the
    graph/throughput is identical to converted checkpoints)."""
    import jax

    from wespeaker_hubert_tpu.frontend import SSLEncoderConfig, SSLFrontend
    from wespeaker_hubert_tpu.models import get_speaker_model
    from wespeaker_hubert_tpu.models.speaker_net import SpeakerNet
    from wespeaker_hubert_tpu.train import make_eval_embed

    import dataclasses as _dc

    enc_cfg = _dc.replace(
        getattr(SSLEncoderConfig, upstream)(), attn_impl=attn_impl)
    frontend = SSLFrontend(enc_cfg, frozen=True, multilayer_feature=True)
    backbone = get_speaker_model("ECAPA_TDNN_c512")(
        feat_dim=enc_cfg.hidden_size, embed_dim=192)
    net = SpeakerNet(backbone=backbone, projection=None, frontend=frontend)

    n = int(seconds * SR)
    rng = np.random.default_rng(0)
    wav = jnp.asarray(rng.standard_normal((batch, n)) * 0.1, jnp.float32)

    fvars = net.init(jax.random.key(0), wav[:1], train=False,
                     method=net.features)
    feats, _ = net.apply(fvars, wav[:1], train=False, method=net.features)
    bvars = backbone.init(jax.random.key(1), feats, train=False)
    variables = {
        "params": {**fvars["params"], "backbone": bvars["params"]},
        "batch_stats": {
            **fvars.get("batch_stats", {}),
            "backbone": bvars.get("batch_stats", {}),
        },
    }
    from wespeaker_hubert_tpu.train import cast_variables_bf16

    variables = cast_variables_bf16(variables)
    embed_fn = make_eval_embed(net, compute_dtype=jnp.bfloat16)
    out = embed_fn(variables, {"wav": wav})
    _ = np.asarray(out[:1, :1])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = embed_fn(variables, {"wav": wav})
    _ = np.asarray(out[:1, :1])
    dt = time.perf_counter() - t0
    return batch * seconds * iters / dt


def bench_whisper_pmfa_extract(batch=8, seconds=30.0, iters=4,
                               variant="large_v2", gelu_impl="erf",
                               attn_impl="einsum"):
    """whisper_PMFA_large_v2 extraction throughput, bf16: raw wav ->
    in-graph log-mel -> Whisper-large-v2 encoder (layers 16..23 concat)
    -> PMFA head (reference models/whisper_PMFA.py:136 +
    frontend/whisper_encoder.py; 30 s = the encoder's n_ctx window)."""
    import dataclasses as _dc

    from wespeaker_hubert_tpu.frontend import (
        WhisperEncoder,
        WhisperEncoderConfig,
    )
    from wespeaker_hubert_tpu.models import get_speaker_model
    from wespeaker_hubert_tpu.models.speaker_net import SpeakerNet
    from wespeaker_hubert_tpu.train import cast_variables_bf16, make_eval_embed

    wcfg = _dc.replace(getattr(WhisperEncoderConfig, variant)(),
                       gelu_impl=gelu_impl, attn_impl=attn_impl)
    frontend = WhisperEncoder(wcfg, frozen=True)
    backbone = get_speaker_model("whisper_PMFA_large_v2")(
        feat_dim=wcfg.output_size, embed_dim=192)
    net = SpeakerNet(backbone=backbone, projection=None, frontend=frontend)

    n = int(seconds * SR)
    rng = np.random.default_rng(0)
    wav = jnp.asarray(rng.standard_normal((batch, n)) * 0.1, jnp.float32)
    fvars = net.init(jax.random.key(0), wav[:1], train=False,
                     method=net.features)
    feats, _ = net.apply(fvars, wav[:1], train=False, method=net.features)
    bvars = backbone.init(jax.random.key(1), feats, train=False)
    variables = {
        "params": {**fvars["params"], "backbone": bvars["params"]},
        "batch_stats": {
            **fvars.get("batch_stats", {}),
            "backbone": bvars.get("batch_stats", {}),
        },
    }
    variables = cast_variables_bf16(variables)
    embed_fn = make_eval_embed(net, compute_dtype=jnp.bfloat16)
    out = embed_fn(variables, {"wav": wav})
    _ = np.asarray(out[:1, :1])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = embed_fn(variables, {"wav": wav})
    _ = np.asarray(out[:1, :1])
    dt = time.perf_counter() - t0
    return batch * seconds * iters / dt


def bench_wavlm_train_step(frozen=True, batch=32, iters=5, loop_steps=1,
                           upstream="wavlm_large", seconds=3.0,
                           gelu_impl="erf"):
    """WavLM-Large + ECAPA c512 joint/frozen fine-tune train step, bf16.

    Mirrors the reference 8-GPU workload (conf/ecapa_tdnn_WavLM_frozen.yaml:
    global batch 256 = 32/device, num_frms 150 at 20 ms shift = 3 s chunks,
    aug_prob 0.6, ArcMargin) on one chip: wav aug in-graph -> frontend ->
    CMVN -> ECAPA -> margin head -> SGD (frontend updates zeroed when
    frozen, like s3prl.py:70 requires_grad_(False))."""
    import dataclasses as _dc

    from wespeaker_hubert_tpu.frontend import SSLEncoderConfig, SSLFrontend
    from wespeaker_hubert_tpu.models import get_projection, get_speaker_model
    from wespeaker_hubert_tpu.models.speaker_net import SpeakerNet
    from wespeaker_hubert_tpu.ops.augment import speed_input_len
    from wespeaker_hubert_tpu.train import (
        ExponentialDecrease,
        MarginSchedule,
        create_train_state,
        make_optimizer,
        make_train_step,
    )

    enc_cfg = _dc.replace(
        getattr(SSLEncoderConfig, upstream)(), gelu_impl=gelu_impl)
    frontend = SSLFrontend(enc_cfg, frozen=frozen, multilayer_feature=True)
    backbone = get_speaker_model("ECAPA_TDNN_GLOB_c512")(
        feat_dim=enc_cfg.hidden_size, embed_dim=192)
    projection = get_projection(
        {"project_type": "arc_margin", "embed_dim": 192,
         "num_class": 17982, "scale": 32.0}
    )
    net = SpeakerNet(backbone=backbone, projection=projection,
                     frontend=frontend)
    lr = ExponentialDecrease(
        num_epochs=150, epoch_iter=1000, initial_lr=0.01, final_lr=5e-5,
        warm_up_epoch=6,
    )
    margin = MarginSchedule(
        epoch_iter=1000, increase_start_epoch=20, fix_start_epoch=40,
        initial_margin=0.0, final_margin=0.2,
    )
    freeze = (("frontend",),) if frozen else ()
    tx = make_optimizer(lr, "SGD", weight_decay=1e-4, freeze_paths=freeze)

    chunk = int(seconds * SR)
    in_len = speed_input_len(chunk)
    rng = np.random.default_rng(0)
    wav_ex = jnp.zeros((batch, chunk))
    from wespeaker_hubert_tpu.frontend.ssl_encoder import (
        feat_extract_output_lengths,
    )

    t_ex = int(feat_extract_output_lengths(enc_cfg, chunk))
    state = create_train_state(
        net, tx, jax.random.key(0),
        jnp.zeros((batch, t_ex, enc_cfg.hidden_size)),
        jnp.zeros((batch,), jnp.int32),
        example_wav=wav_ex,
    )
    step = make_train_step(net, tx, lr, margin, chunk_samples=chunk,
                           compute_dtype=jnp.bfloat16,
                           num_steps=loop_steps)
    n_rev = n_noise = int(batch * 0.6 / 2)
    b = {
        "wav": jnp.asarray(
            rng.standard_normal((batch, in_len)) * 0.1, jnp.float32),
        "speed_idx": jnp.asarray(rng.integers(0, 3, batch), jnp.int32),
        "label": jnp.asarray(rng.integers(0, 17982, batch)),
        "rir": jnp.asarray(rng.standard_normal((n_rev, 8000)), jnp.float32),
        "noise": jnp.asarray(
            rng.standard_normal((n_noise, chunk)) * 0.05, jnp.float32),
        "snr": jnp.full((n_noise,), 10.0, jnp.float32),
    }
    key = jax.random.key(1)
    if loop_steps > 1:
        b = {k: jnp.broadcast_to(v, (loop_steps,) + v.shape)
             for k, v in b.items()}
    state, m0 = step(state, b, key)
    loss0 = m0["loss"] if loop_steps == 1 else m0["loss"][-1]
    float(loss0)
    t0 = time.perf_counter()
    for _ in range(iters):
        state, metrics = step(state, b, key)
    loss = metrics["loss"] if loop_steps == 1 else metrics["loss"][-1]
    float(loss)
    dt = time.perf_counter() - t0
    audio_s = batch * seconds * iters * loop_steps
    return audio_s / dt, batch * iters * loop_steps / dt


def bench_moco_step(model_name="ECAPA_TDNN_c512", batch=64, iters=10,
                    K=65536, compute_dtype=None):
    """MoCo v2 SSL train-step throughput: two aug views + fbank + query/
    key encoders + queue update (ssl/contrastive.py)."""
    import optax

    from wespeaker_hubert_tpu.data.dataset import chunk_samples_for_frames
    from wespeaker_hubert_tpu.models import get_speaker_model
    from wespeaker_hubert_tpu.ops.augment import add_reverb_noise
    from wespeaker_hubert_tpu.ops.fbank import FbankConfig
    from wespeaker_hubert_tpu.ops.pipeline import (
        FeaturePipelineConfig,
        wav_to_features,
    )
    import flax.linen as nn

    from wespeaker_hubert_tpu.models.registry import embedding_from_outputs
    from wespeaker_hubert_tpu.ssl import create_moco_state, make_moco_train_step

    class Encoder(nn.Module):
        backbone: nn.Module

        def __call__(self, feats, train=False):
            return embedding_from_outputs(self.backbone(feats, train=train))

    backbone = get_speaker_model(model_name)(feat_dim=80, embed_dim=192)
    net = Encoder(backbone=backbone)
    tx = optax.sgd(0.05, momentum=0.9)
    fcfg = FeaturePipelineConfig(fbank=FbankConfig(dither=1.0),
                                 spec_aug=False)

    l = chunk_samples_for_frames(200)
    feats_ex = jnp.zeros((batch, 200, 80))
    state = create_moco_state(net, tx, jax.random.key(0), feats_ex, 192,
                              K=K)
    step = make_moco_train_step(net, tx, compute_dtype=compute_dtype)

    rng_np = np.random.default_rng(0)
    b = {
        "global_wav": jnp.asarray(
            rng_np.standard_normal((batch, 2, l)) * 0.1, jnp.float32),
        "global_rir": jnp.asarray(
            rng_np.standard_normal((batch, 2, 8000)), jnp.float32),
        "global_noise": jnp.asarray(
            rng_np.standard_normal((batch, 2, l)) * 0.05, jnp.float32),
        "global_aug_type": jnp.asarray(
            rng_np.integers(0, 3, (batch, 2)), jnp.int32),
        "global_snr": jnp.full((batch, 2), 10.0, jnp.float32),
    }

    @jax.jit
    def views_to_feats(batch, rng):
        wav = batch["global_wav"]
        bb, n, ll = wav.shape
        flat = add_reverb_noise(
            wav.reshape(bb * n, ll),
            batch["global_rir"].reshape(bb * n, -1),
            batch["global_noise"].reshape(bb * n, ll),
            batch["global_aug_type"].reshape(-1),
            batch["global_snr"].reshape(-1),
        )
        feats, _ = wav_to_features(flat, fcfg, rng=rng, train=True)
        feats = feats.reshape(bb, n, feats.shape[1], feats.shape[2])
        return {"query_feat": feats[:, 0], "key_feat": feats[:, 1]}

    key = jax.random.key(1)
    state, m = step(state, views_to_feats(b, key), key)
    float(m["loss"])
    t0 = time.perf_counter()
    for _ in range(iters):
        state, m = step(state, views_to_feats(b, key), key)
    float(m["loss"])
    dt = time.perf_counter() - t0
    audio_s = batch * 2 * 2.0 * iters  # two 2s views per utterance
    return audio_s / dt, batch * iters / dt


def bench_simclr_step(model_name="ECAPA_TDNN_c512", batch=64, iters=10,
                      compute_dtype=None):
    """SimCLR SSL train-step throughput: two aug views + fbank + InfoNCE
    (ssl/contrastive.make_simclr_train_step; reference
    ssl/models/simclr_wrapper.py:20).  Same in-graph view pipeline as
    the MoCo bench so the two rows are directly comparable."""
    import flax.linen as nn
    import optax

    from wespeaker_hubert_tpu.bin.train_contrastive import _SimCLRState
    from wespeaker_hubert_tpu.data.dataset import chunk_samples_for_frames
    from wespeaker_hubert_tpu.models import get_speaker_model
    from wespeaker_hubert_tpu.models.registry import embedding_from_outputs
    from wespeaker_hubert_tpu.ops.augment import add_reverb_noise
    from wespeaker_hubert_tpu.ops.fbank import FbankConfig
    from wespeaker_hubert_tpu.ops.pipeline import (
        FeaturePipelineConfig,
        wav_to_features,
    )
    from wespeaker_hubert_tpu.ssl import make_simclr_train_step

    class Encoder(nn.Module):
        backbone: nn.Module

        def __call__(self, feats, train=False):
            return embedding_from_outputs(self.backbone(feats, train=train))

    backbone = get_speaker_model(model_name)(feat_dim=80, embed_dim=192)
    net = Encoder(backbone=backbone)
    tx = optax.sgd(0.05, momentum=0.9)
    fcfg = FeaturePipelineConfig(fbank=FbankConfig(dither=1.0),
                                 spec_aug=False)

    l = chunk_samples_for_frames(200)
    feats_ex = jnp.zeros((batch, 200, 80))
    variables = net.init(jax.random.key(0), feats_ex, train=True)
    state = _SimCLRState(
        step=jnp.zeros((), jnp.int32),
        params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        opt_state=tx.init(variables["params"]),
    )
    step = make_simclr_train_step(net, tx, compute_dtype=compute_dtype)

    rng_np = np.random.default_rng(0)
    b = {
        "global_wav": jnp.asarray(
            rng_np.standard_normal((batch, 2, l)) * 0.1, jnp.float32),
        "global_rir": jnp.asarray(
            rng_np.standard_normal((batch, 2, 8000)), jnp.float32),
        "global_noise": jnp.asarray(
            rng_np.standard_normal((batch, 2, l)) * 0.05, jnp.float32),
        "global_aug_type": jnp.asarray(
            rng_np.integers(0, 3, (batch, 2)), jnp.int32),
        "global_snr": jnp.full((batch, 2), 10.0, jnp.float32),
    }

    @jax.jit
    def views_to_feats(batch, rng):
        wav = batch["global_wav"]
        bb, n, ll = wav.shape
        flat = add_reverb_noise(
            wav.reshape(bb * n, ll),
            batch["global_rir"].reshape(bb * n, -1),
            batch["global_noise"].reshape(bb * n, ll),
            batch["global_aug_type"].reshape(-1),
            batch["global_snr"].reshape(-1),
        )
        feats, _ = wav_to_features(flat, fcfg, rng=rng, train=True)
        feats = feats.reshape(bb, n, feats.shape[1], feats.shape[2])
        return {"query_feat": feats[:, 0], "key_feat": feats[:, 1]}

    key = jax.random.key(1)
    state, m = step(state, views_to_feats(b, key), key)
    float(m["loss"])
    t0 = time.perf_counter()
    for _ in range(iters):
        state, m = step(state, views_to_feats(b, key), key)
    float(m["loss"])
    dt = time.perf_counter() - t0
    audio_s = batch * 2 * 2.0 * iters  # two 2 s views per utterance
    return audio_s / dt, batch * iters / dt


def bench_dino_step(model_name="ECAPA_TDNN_c512", batch=64, iters=10,
                    n_global=2, n_local=4, out_dim=65536,
                    compute_dtype=None):
    """DINO SSL train-step throughput: multi-crop aug + fbank + student/
    teacher forward + EMA + centering, one jitted step (ssl/dino.py)."""
    import optax

    from wespeaker_hubert_tpu.data.dataset import chunk_samples_for_frames
    from wespeaker_hubert_tpu.models import get_speaker_model
    from wespeaker_hubert_tpu.ops.augment import add_reverb_noise
    from wespeaker_hubert_tpu.ops.fbank import FbankConfig
    from wespeaker_hubert_tpu.ops.pipeline import (
        FeaturePipelineConfig,
        wav_to_features,
    )
    from wespeaker_hubert_tpu.ssl.dino import (
        DINOHead,
        DINONet,
        cosine_schedule,
        create_dino_state,
        make_dino_train_step,
    )

    backbone = get_speaker_model(model_name)(feat_dim=80, embed_dim=192)
    head = DINOHead(in_dim=192, out_dim=out_dim, hidden_dim=2048,
                    bottleneck_dim=256)
    net = DINONet(backbone=backbone, head=head)
    fcfg = FeaturePipelineConfig(fbank=FbankConfig(dither=1.0),
                                 spec_aug=False)

    def preprocess(batch, rng):
        def group(prefix, key):
            wav = batch[f"{prefix}_wav"]
            b, n, l = wav.shape
            flat = add_reverb_noise(
                wav.reshape(b * n, l),
                batch[f"{prefix}_rir"].reshape(b * n, -1),
                batch[f"{prefix}_noise"].reshape(b * n, l),
                batch[f"{prefix}_aug_type"].reshape(-1),
                batch[f"{prefix}_snr"].reshape(-1),
            )
            feats, _ = wav_to_features(flat, fcfg, rng=key, train=True)
            return feats.reshape(b, n, feats.shape[1], feats.shape[2])

        k1, k2 = jax.random.split(rng)
        return group("global", k1), group("local", k2)

    total = 150 * 1000
    step = make_dino_train_step(
        net, optax.trace(decay=0.9),
        lr_schedule=cosine_schedule(0.2 * batch / 256.0, 1e-5, total),
        wd_schedule=cosine_schedule(1e-4, 1e-4, total),
        momentum_schedule=cosine_schedule(0.996, 1.0, total),
        teacher_temp_schedule=cosine_schedule(0.04, 0.07, total // 5),
        n_global=n_global, n_local=n_local,
        preprocess_fn=preprocess,
        compute_dtype=compute_dtype,
        trace_decay=0.9,
    )

    rng_np = np.random.default_rng(0)
    lg = chunk_samples_for_frames(200)
    ll = chunk_samples_for_frames(100)
    b = {}
    for prefix, n, l in (("global", n_global, lg), ("local", n_local, ll)):
        b[f"{prefix}_wav"] = jnp.asarray(
            rng_np.standard_normal((batch, n, l)) * 0.1, jnp.float32)
        b[f"{prefix}_rir"] = jnp.asarray(
            rng_np.standard_normal((batch, n, 8000)), jnp.float32)
        b[f"{prefix}_noise"] = jnp.asarray(
            rng_np.standard_normal((batch, n, l)) * 0.05, jnp.float32)
        b[f"{prefix}_aug_type"] = jnp.asarray(
            rng_np.integers(0, 3, (batch, n)), jnp.int32)
        b[f"{prefix}_snr"] = jnp.full((batch, n), 10.0, jnp.float32)

    g, _ = preprocess(b, jax.random.key(0))
    crops_ex = jnp.asarray(g.reshape((-1,) + g.shape[2:]))
    state = create_dino_state(net, optax.trace(decay=0.9),
                              jax.random.key(0), crops_ex, out_dim)
    key = jax.random.key(1)
    state, m = step(state, b, key)
    float(m["loss"])
    t0 = time.perf_counter()
    for _ in range(iters):
        state, m = step(state, b, key)
    float(m["loss"])
    dt = time.perf_counter() - t0
    # audio seconds actually consumed per step (crops overlap-sample the
    # utterance; count crop audio like the reference's epoch accounting)
    audio_s = batch * (n_global * 2.0 + n_local * 1.0) * iters
    return audio_s / dt, batch * iters / dt


def bench_native_shard(compress="zstd", n_shards=8, utts_per_shard=250,
                       num_threads=4, epochs=12, seconds=1.5,
                       cache_root="/tmp/bench_native_shards"):
    """Native C++ shard-loader throughput (utts/s) on compressed tars —
    the host-feed role of the reference FeaturePipeline/DataLoader
    (wespeaker/dataset/processor.py tar_file_and_group + 16 workers).

    Shards are synthesized once per (compress, size) and cached across
    runs; the timed region is pure loader epochs (filter/chunk/speed/
    shuffle policy, full batch assembly)."""
    import os
    import tarfile

    from wespeaker_hubert_tpu.data import write_wav
    from wespeaker_hubert_tpu.data.native_loader import (
        DeterministicNativeShardLoader,
        native_available,
        native_zstd_available,
    )

    if not native_available():
        raise RuntimeError("native loader unavailable (no g++)")
    if compress == "zstd" and not native_zstd_available():
        raise RuntimeError("libzstd unavailable")

    ext = {"zstd": ".tar.zst", "gz": ".tar.gz", None: ".tar"}[compress]
    root = f"{cache_root}_{compress}_{n_shards}x{utts_per_shard}"
    shards = [os.path.join(root, f"shard{s}{ext}")
              for s in range(n_shards)]
    if not all(os.path.exists(s) for s in shards):
        os.makedirs(root, exist_ok=True)
        rng = np.random.default_rng(0)
        n = int(seconds * SR)
        for s, shard in enumerate(shards):
            plain = os.path.join(root, f"shard{s}.tar")
            with tarfile.open(plain, "w") as tf:
                import io

                for u in range(utts_per_shard):
                    wav = (rng.standard_normal(n) * 0.1).astype(np.float32)
                    wp = os.path.join(root, "tmp.wav")
                    write_wav(wp, wav)
                    # shard sample = {utt}.wav + {utt}.spk (the format
                    # bin/tools.py _write_shard produces)
                    tf.add(wp, arcname=f"s{s}u{u}.wav")
                    spk = f"spk{u % 40}".encode()
                    info = tarfile.TarInfo(f"s{s}u{u}.spk")
                    info.size = len(spk)
                    tf.addfile(info, io.BytesIO(spk))
            if compress == "zstd":
                from wespeaker_hubert_tpu.data.zstd_io import compress_file

                compress_file(plain, shard)
                os.remove(plain)
            elif compress == "gz":
                import gzip
                import shutil

                with open(plain, "rb") as f, gzip.open(shard, "wb") as out:
                    shutil.copyfileobj(f, out)
                os.remove(plain)
        tmp = os.path.join(root, "tmp.wav")
        if os.path.exists(tmp):
            os.remove(tmp)

    spk2id = {f"spk{i}": i for i in range(40)}
    loader = DeterministicNativeShardLoader(
        shards, spk2id, chunk_samples=int(2.0 * SR), batch_size=64,
        num_spks=40, min_samples=8000, shuffle_size=1000,
        num_threads=num_threads,
    )
    try:
        n_utts = sum(1 for _ in loader.epoch(0)) * 64  # warm page cache
        assert n_utts > 0, (
            "loader yielded no batches — shard format mismatch? "
            f"(decode_failures={loader.decode_failures()})"
        )
        t0 = time.perf_counter()
        total = 0
        for e in range(1, epochs + 1):
            for wav, label, speed in loader.epoch(e):
                total += wav.shape[0]
        dt = time.perf_counter() - t0
    finally:
        loader.close()
    assert total >= n_utts * epochs * 0.9, "loader starved mid-bench"
    return total / dt


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--models", default="ECAPA_TDNN_c512,ResNet34")
    p.add_argument("--batch", type=int, default=64)
    p.add_argument("--seconds", type=float, default=10.0)
    p.add_argument("--train", action="store_true")
    p.add_argument("--train_model", default="ECAPA_TDNN_GLOB_c1024")
    p.add_argument("--train_batch", type=int, default=128)
    p.add_argument("--train_bf16", action="store_true")
    p.add_argument("--loop_steps", type=int, default=1,
                   help="scan this many optimizer steps per dispatch")
    p.add_argument("--unpacked", action="store_true",
                   help="legacy per-row aug_type layout (production uses packed)")
    p.add_argument("--dino", action="store_true",
                   help="benchmark the DINO SSL train step")
    p.add_argument("--moco", action="store_true",
                   help="benchmark the MoCo SSL train step")
    p.add_argument("--simclr", action="store_true",
                   help="benchmark the SimCLR SSL train step")
    p.add_argument("--ssl_frontend", action="store_true",
                   help="benchmark WavLM-Large frontend extraction")
    p.add_argument("--attn_impl", default="einsum",
                   choices=("einsum", "flash"),
                   help="SSL-frontend attention implementation "
                        "(flash = Pallas kernel, TPU only)")
    p.add_argument("--wavlm_train", action="store_true",
                   help="benchmark WavLM-Large frozen + joint train steps")
    p.add_argument("--native_shard", default=None,
                   choices=("plain", "gz", "zstd"),
                   help="benchmark the native C++ shard loader (utts/s, "
                        "CPU-side host-feed role)")
    p.add_argument("--gelu_impl", default="erf", choices=("erf", "tanh"),
                   help="SSL-frontend GELU (tanh = fast approximation, "
                        "embedding cosine 0.99998 vs erf)")
    args = p.parse_args()

    results = []
    for name in filter(None, (n.strip() for n in args.models.split(","))):
        for dtype in ("f32", "bf16"):
            tp = bench_extract(name, args.batch, args.seconds, dtype)
            baseline = 1.0 / CPU_RTF[name] if name in CPU_RTF else None
            row = {
                "metric": f"{name}_extract_{dtype}",
                "value": round(tp, 1),
                "unit": "audio_s/s/chip",
                "vs_baseline": round(tp * CPU_RTF[name], 2)
                if name in CPU_RTF
                else None,
            }
            results.append(row)
            print(json.dumps(row), flush=True)

    if args.train:
        import jax.numpy as jnp

        cd = jnp.bfloat16 if args.train_bf16 else None
        tp, utts = bench_train_step(
            args.train_model, args.train_batch, compute_dtype=cd,
            loop_steps=args.loop_steps, packed=not args.unpacked,
        )
        tag = "_bf16" if args.train_bf16 else ""
        row = {
            "metric": f"{args.train_model}_train_step{tag}",
            "value": round(tp, 1),
            "unit": "audio_s/s/chip",
            "utts_per_s": round(utts, 1),
        }
        results.append(row)
        print(json.dumps(row), flush=True)

    if args.dino:
        tp, utts = bench_dino_step()
        row = {
            "metric": "DINO_ECAPA_c512_ssl_train_step",
            "value": round(tp, 1),
            "unit": "audio_s/s/chip",
            "utts_per_s": round(utts, 1),
        }
        results.append(row)
        print(json.dumps(row), flush=True)

    if args.moco:
        tp, utts = bench_moco_step()
        row = {
            "metric": "MoCo_ECAPA_c512_ssl_train_step",
            "value": round(tp, 1),
            "unit": "audio_s/s/chip",
            "utts_per_s": round(utts, 1),
        }
        results.append(row)
        print(json.dumps(row), flush=True)

    if args.simclr:
        import jax.numpy as jnp

        tp, utts = bench_simclr_step(compute_dtype=jnp.bfloat16)
        row = {
            "metric": "SimCLR_ECAPA_c512_ssl_train_step_bf16",
            "value": round(tp, 1),
            "unit": "audio_s/s/chip",
            "utts_per_s": round(utts, 1),
        }
        results.append(row)
        print(json.dumps(row), flush=True)

    if args.ssl_frontend:
        tp = bench_ssl_frontend_extract(attn_impl=args.attn_impl)
        suffix = "" if args.attn_impl == "einsum" else f"_{args.attn_impl}"
        row = {
            "metric": f"WavLM_Large_ECAPA_c512_extract_bf16{suffix}",
            "value": round(tp, 1),
            "unit": "audio_s/s/chip",
        }
        results.append(row)
        print(json.dumps(row), flush=True)

    if args.wavlm_train:
        for frozen in (True, False):
            tp, utts = bench_wavlm_train_step(
                frozen=frozen, loop_steps=args.loop_steps,
                gelu_impl=args.gelu_impl,
            )
            tag = "frozen" if frozen else "joint"
            row = {
                "metric": f"WavLM_Large_ECAPA_c512_train_step_{tag}_bf16",
                "value": round(tp, 1),
                "unit": "audio_s/s/chip",
                "utts_per_s": round(utts, 1),
            }
            results.append(row)
            print(json.dumps(row), flush=True)

    if args.native_shard:
        comp = None if args.native_shard == "plain" else args.native_shard
        tp = bench_native_shard(compress=comp)
        row = {
            "metric": f"native_shard_{args.native_shard}_utts_per_s",
            "value": round(tp, 1),
            "unit": "utts/s",
        }
        results.append(row)
        print(json.dumps(row), flush=True)
    return results


if __name__ == "__main__":
    main()
