"""Sequence parallelism: the Megatron-SP activation constraint must be a
pure performance annotation — identical numerics, and actually present in
the lowered program (a GSPMD Sharding custom-call per layer boundary)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from wespeaker_hubert_tpu.frontend.ssl_encoder import (
    SSLEncoder,
    SSLEncoderConfig,
)
from wespeaker_hubert_tpu.parallel import (
    make_mesh,
    sequence_parallel_constraint,
)


def _cfgs(model_type="wavlm"):
    mesh = make_mesh(model_parallel=4)
    base = SSLEncoderConfig.tiny(model_type=model_type)
    sp = dataclasses.replace(
        base, act_constraint=sequence_parallel_constraint(mesh)
    )
    return mesh, base, sp


def test_sp_constraint_is_identity_without_tp():
    mesh1 = make_mesh(model_parallel=1)
    f = sequence_parallel_constraint(mesh1)
    x = jnp.ones((2, 3, 4))
    assert f(x) is x


def test_sp_forward_parity():
    """Same params, same outputs — the constraint only moves data."""
    mesh, base, sp = _cfgs()
    wav = jax.random.normal(jax.random.key(1), (8, 3220)) * 0.1
    variables = SSLEncoder(base).init(jax.random.key(0), wav)

    ref_hidden, _ = jax.jit(
        lambda v, w: SSLEncoder(base).apply(v, w)
    )(variables, wav)
    sp_hidden, _ = jax.jit(
        lambda v, w: SSLEncoder(sp).apply(v, w)
    )(variables, wav)
    for i, (a, b) in enumerate(zip(sp_hidden, ref_hidden)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-5, atol=2e-6,
            err_msg=f"hidden state {i}",
        )


def test_sp_annotations_present_in_lowered_program():
    """The SP config must emit GSPMD Sharding custom-calls (2 residual-
    boundary constraints per layer); the baseline emits none."""
    mesh, base, sp = _cfgs()
    wav = jnp.zeros((8, 3220))
    variables = SSLEncoder(base).init(jax.random.key(0), wav)

    def lowered_text(cfg):
        return jax.jit(
            lambda v, w: SSLEncoder(cfg).apply(v, w)[0][-1]
        ).lower(variables, wav).as_text()

    def count_constraints(txt):
        # Shardy (jax >= 0.5 default) vs legacy GSPMD spelling
        return txt.count("sdy.sharding_constraint") + txt.count("@Sharding")

    assert count_constraints(lowered_text(base)) == 0
    n_sharding = count_constraints(lowered_text(sp))
    assert n_sharding >= 2 * sp.num_hidden_layers, n_sharding


def test_sp_whisper_forward_parity_and_annotations():
    """The Whisper frontend honors the same SP hook: identical outputs,
    Shardy constraints present (2 per block)."""
    from wespeaker_hubert_tpu.frontend.whisper import (
        WhisperEncoder,
        WhisperEncoderConfig,
    )

    mesh = make_mesh(model_parallel=4)
    base = WhisperEncoderConfig.tiny_test()
    sp = dataclasses.replace(
        base, act_constraint=sequence_parallel_constraint(mesh)
    )
    wav = jax.random.normal(jax.random.key(1), (8, 25600)) * 0.1  # T=80: divisible by tp=4
    variables = WhisperEncoder(base).init(jax.random.key(0), wav)

    ref, _ = jax.jit(lambda v, w: WhisperEncoder(base).apply(v, w))(
        variables, wav
    )
    out, _ = jax.jit(lambda v, w: WhisperEncoder(sp).apply(v, w))(
        variables, wav
    )
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-6
    )

    txt = jax.jit(
        lambda v, w: WhisperEncoder(sp).apply(v, w)[0]
    ).lower(variables, wav).as_text()
    n = txt.count("sdy.sharding_constraint") + txt.count("@Sharding")
    assert n >= 2 * base.n_layer, n


def test_sp_train_step_loss_parity():
    """One sharded train step (fsdp x tp mesh) with and without SP gives
    the same loss — the dryrun/bin-train integration surface."""
    from wespeaker_hubert_tpu.frontend import SSLFrontend
    from wespeaker_hubert_tpu.models import get_projection, get_speaker_model
    from wespeaker_hubert_tpu.models.speaker_net import SpeakerNet
    from wespeaker_hubert_tpu.parallel import shard_batch
    from wespeaker_hubert_tpu.train import (
        ExponentialDecrease,
        MarginSchedule,
        create_train_state,
        make_optimizer,
        make_train_step,
        shard_train_state,
    )

    mesh, base, sp = _cfgs()
    num_class = 16
    rng = np.random.default_rng(0)

    def build(enc_cfg):
        return SpeakerNet(
            backbone=get_speaker_model("ECAPA_TDNN_c512")(
                feat_dim=enc_cfg.hidden_size, embed_dim=32
            ),
            projection=get_projection({
                "project_type": "arc_margin", "embed_dim": 32,
                "num_class": num_class, "scale": 32.0,
            }),
            frontend=SSLFrontend(enc_cfg, frozen=False),
        )

    lr = ExponentialDecrease(
        num_epochs=1, epoch_iter=2, initial_lr=0.1, final_lr=0.01,
        warm_up_epoch=1, scale_ratio=1.0,
    )
    margin = MarginSchedule(
        epoch_iter=2, increase_start_epoch=1, fix_start_epoch=1,
        initial_margin=0.0, final_margin=0.2,
    )
    tx = make_optimizer(lr, "SGD", weight_decay=1e-4)
    batch = {
        "wav": jnp.asarray(rng.standard_normal((8, 3220)) * 0.1, jnp.float32),
        "label": jnp.asarray(rng.integers(0, num_class, 8)),
    }

    losses = {}
    for name, enc_cfg in (("base", base), ("sp", sp)):
        net = build(enc_cfg)
        state = shard_train_state(
            create_train_state(
                net, tx, jax.random.key(0),
                jnp.zeros((8, 10, enc_cfg.hidden_size)), batch["label"],
                example_wav=batch["wav"],
            ),
            mesh, fsdp=True,
        )
        step = make_train_step(net, tx, lr, margin, mesh=mesh)
        _, metrics = step(state, shard_batch(batch, mesh), jax.random.key(2))
        losses[name] = float(metrics["loss"])
    assert np.isfinite(losses["sp"])
    np.testing.assert_allclose(losses["sp"], losses["base"], rtol=1e-4)


def test_skipped_constraint_warns_once(caplog):
    """ADVICE r4: a silently-skipped SP constraint would look like
    working sequence parallelism while running replicated — the
    constraint callable must say so (once)."""
    import logging

    import jax.numpy as jnp

    from wespeaker_hubert_tpu.parallel import (
        make_mesh,
        sequence_parallel_constraint,
    )

    mesh = make_mesh(model_parallel=2)
    constrain = sequence_parallel_constraint(mesh)
    x = jnp.zeros((2, 7, 8))  # T=7 not divisible by tp=2 -> skipped
    with caplog.at_level(logging.WARNING, logger="parallel.mesh"):
        y = constrain(x)
        z = constrain(x)
    assert y.shape == x.shape and z.shape == x.shape
    msgs = [r for r in caplog.records if "SKIPPED" in r.getMessage()]
    assert len(msgs) == 1  # once, not per call
