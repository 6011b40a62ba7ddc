"""SSL-frontend training integration: SpeakerNet(frontend=HuBERT-tiny,
backbone=ECAPA) trains end to end from raw wav, frozen and unfrozen, and
eval extraction works (the TPU analogue of the reference's WavLM recipe,
examples/voxceleb/v2/run_wavlm.sh)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from wespeaker_hubert_tpu.frontend import SSLEncoderConfig, SSLFrontend
from wespeaker_hubert_tpu.models import get_projection
from wespeaker_hubert_tpu.models.ecapa_tdnn import EcapaTdnn
from wespeaker_hubert_tpu.models.speaker_net import SpeakerNet
from wespeaker_hubert_tpu.ops.pipeline import FeaturePipelineConfig
from wespeaker_hubert_tpu.train import (
    ExponentialDecrease,
    MarginSchedule,
    create_train_state,
    make_eval_embed,
    make_optimizer,
    make_train_step,
)

NUM_CLASS = 8
W = 6400  # 0.4 s


def _net(frozen=True):
    cfg = SSLEncoderConfig.tiny("hubert")
    frontend = SSLFrontend(cfg, frozen=frozen)
    backbone = EcapaTdnn(channels=32, feat_dim=cfg.hidden_size, embed_dim=24)
    projection = get_projection(
        {
            "project_type": "arc_margin",
            "embed_dim": 24,
            "num_class": NUM_CLASS,
            "scale": 32.0,
        }
    )
    return SpeakerNet(backbone=backbone, projection=projection, frontend=frontend), cfg


def _schedules():
    lr = ExponentialDecrease(
        num_epochs=4, epoch_iter=4, initial_lr=0.05, final_lr=0.01,
        warm_up_epoch=1,
    )
    margin = MarginSchedule(
        epoch_iter=4, increase_start_epoch=1, fix_start_epoch=2,
        initial_margin=0.0, final_margin=0.1,
    )
    return lr, margin


def _state_and_step(net, cfg, frozen):
    lr, margin = _schedules()
    freeze = (("frontend", "upstream"),) if frozen else ()
    tx = make_optimizer(lr, "SGD", weight_decay=1e-4, freeze_paths=freeze)
    from wespeaker_hubert_tpu.frontend import feat_extract_output_lengths

    t = int(feat_extract_output_lengths(cfg, W))
    state = create_train_state(
        net, tx, jax.random.key(0),
        jnp.zeros((4, t, cfg.hidden_size)),
        jnp.zeros((4,), jnp.int32),
        example_wav=jnp.zeros((4, W)),
    )
    fcfg = FeaturePipelineConfig(spec_aug=True)
    step = make_train_step(net, tx, lr, margin, feature_cfg=fcfg)
    return state, step, tx


class TestSSLTrain:
    def test_frozen_frontend_trains(self):
        net, cfg = _net(frozen=True)
        state, step, _ = _state_and_step(net, cfg, True)
        assert "frontend" in state.params

        rng = np.random.default_rng(0)
        batch = {
            "wav": jnp.asarray(
                rng.standard_normal((4, W)) * 0.1, jnp.float32
            ),
            "label": jnp.asarray(rng.integers(0, NUM_CLASS, 4)),
        }
        front_before = jax.tree.map(
            lambda x: np.asarray(x).copy(), state.params["frontend"]["upstream"]
        )
        losses = []
        for _ in range(5):
            state, metrics = step(state, batch, jax.random.key(1))
            losses.append(float(metrics["loss"]))
        assert losses[-1] < losses[0]
        # frozen upstream params unchanged (weight decay must not move them
        # either — grads are exactly zero but add_decayed_weights still adds
        # decay; verify what actually happens)
        front_after = state.params["frontend"]["upstream"]
        diffs = jax.tree.map(
            lambda a, b: float(np.abs(np.asarray(a) - np.asarray(b)).max()),
            front_before,
            front_after,
        )
        max_diff = max(jax.tree.leaves(diffs))
        # frozen upstream params must be EXACTLY unchanged (optimizer mask)
        assert max_diff == 0.0

    def test_unfrozen_frontend_updates(self):
        net, cfg = _net(frozen=False)
        state, step, _ = _state_and_step(net, cfg, False)
        rng = np.random.default_rng(1)
        batch = {
            "wav": jnp.asarray(rng.standard_normal((4, W)) * 0.1, jnp.float32),
            "label": jnp.asarray(rng.integers(0, NUM_CLASS, 4)),
        }
        before = np.asarray(
            state.params["frontend"]["upstream"]["layer_0"]["attention"][
                "q_proj"
            ]["kernel"]
        ).copy()
        state, _ = step(state, batch, jax.random.key(2))
        after = np.asarray(
            state.params["frontend"]["upstream"]["layer_0"]["attention"][
                "q_proj"
            ]["kernel"]
        )
        assert not np.allclose(before, after)

    def test_eval_embed_with_frontend(self):
        net, cfg = _net(frozen=True)
        state, step, _ = _state_and_step(net, cfg, True)
        variables = {"params": state.params, "batch_stats": state.batch_stats}
        embed_fn = make_eval_embed(net)
        rng = np.random.default_rng(2)
        emb = embed_fn(
            variables,
            {
                "wav": jnp.asarray(
                    rng.standard_normal((3, W)) * 0.1, jnp.float32
                ),
                "length": jnp.asarray([W, W // 2, W]),
            },
        )
        assert emb.shape == (3, 24)
        assert np.isfinite(np.asarray(emb)).all()


if __name__ == "__main__":
    pytest.main([__file__, "-x", "-q"])
