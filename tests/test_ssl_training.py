"""SSL training-step tests: DINO loss decreases + teacher EMA + center
updates; MoCo queue mechanics + loss; SimCLR InfoNCE correctness; the
multi-crop host pipeline shapes; DINO loss formula vs an independent numpy
computation."""

import numpy as np
import optax
import pytest

import jax
import jax.numpy as jnp

from wespeaker_hubert_tpu.models.ecapa_tdnn import EcapaTdnn
from wespeaker_hubert_tpu.ssl import (
    DINOHead,
    DINONet,
    SSLPipeline,
    cosine_schedule,
    create_dino_state,
    create_moco_state,
    info_nce_logits,
    make_dino_train_step,
    make_moco_train_step,
)
from wespeaker_hubert_tpu.ssl.dino import _dino_loss

F = 24
OUT_DIM = 64


def _dino_net():
    backbone = EcapaTdnn(channels=32, feat_dim=F, embed_dim=16)
    head = DINOHead(
        in_dim=16, out_dim=OUT_DIM, hidden_dim=32, bottleneck_dim=8,
        norm_last_layer=True,
    )
    return DINONet(backbone=backbone, head=head)


class TestCosineSchedule:
    def test_warmup_and_decay(self):
        s = cosine_schedule(1.0, 0.1, total_steps=100, warmup_steps=10)
        assert float(s(0)) == pytest.approx(0.0)
        assert float(s(10)) == pytest.approx(1.0, abs=1e-5)
        assert float(s(100)) == pytest.approx(0.1, abs=1e-5)
        assert float(s(55)) < 1.0


class TestDINO:
    def _setup(self):
        net = _dino_net()
        tx = optax.trace(decay=0.9)
        crops = jnp.zeros((8, 50, F))
        state = create_dino_state(net, tx, jax.random.key(0), crops, OUT_DIM)
        steps = 20
        step = make_dino_train_step(
            net,
            tx,
            lr_schedule=cosine_schedule(0.05, 0.001, steps, 2),
            wd_schedule=cosine_schedule(1e-4, 1e-4, steps),
            momentum_schedule=cosine_schedule(0.99, 1.0, steps),
            teacher_temp_schedule=cosine_schedule(0.04, 0.07, steps),
            n_global=2,
            n_local=4,
            freeze_last_layer_steps=1,
        )
        return net, state, step

    def test_loss_decreases_teacher_follows(self):
        net, state, step = self._setup()
        rng = np.random.default_rng(0)
        batch = {
            "global_feat": jnp.asarray(
                rng.standard_normal((4, 2, 50, F)), jnp.float32
            ),
            "local_feat": jnp.asarray(
                rng.standard_normal((4, 4, 30, F)), jnp.float32
            ),
        }
        t0 = jax.tree.map(np.asarray, state.teacher_params)
        losses = []
        for i in range(6):
            state, metrics = step(state, batch, jax.random.key(1))
            losses.append(float(metrics["loss"]))
        assert np.isfinite(losses).all()
        assert losses[-1] < losses[0]
        # teacher moved toward student
        diff = jax.tree.map(
            lambda a, b: float(np.abs(np.asarray(a) - b).max()),
            state.teacher_params,
            t0,
        )
        assert max(jax.tree.leaves(diff)) > 0
        # center updated
        assert float(jnp.abs(state.center).max()) > 0

    def test_loss_formula_matches_numpy(self):
        rng = np.random.default_rng(1)
        n_s, n_t, b, k = 3, 2, 4, 8
        s_out = rng.standard_normal((n_s * b, k)).astype(np.float32)
        t_out = rng.standard_normal((n_t * b, k)).astype(np.float32)
        center = rng.standard_normal((1, k)).astype(np.float32)
        s_temp, t_temp = 0.1, 0.05

        got = float(
            _dino_loss(
                jnp.asarray(s_out), jnp.asarray(t_out), jnp.asarray(center),
                n_s, n_t, s_temp, t_temp,
            )
        )

        def softmax(x):
            e = np.exp(x - x.max(-1, keepdims=True))
            return e / e.sum(-1, keepdims=True)

        s_chunks = np.split(s_out / s_temp, n_s)
        t_probs = np.split(softmax((t_out - center) / t_temp), n_t)
        total, n_terms = 0.0, 0
        for iq in range(n_t):
            for v in range(n_s):
                if v == iq:
                    continue
                logp = s_chunks[v] - np.log(
                    np.exp(
                        s_chunks[v] - s_chunks[v].max(-1, keepdims=True)
                    ).sum(-1, keepdims=True)
                ) - s_chunks[v].max(-1, keepdims=True)
                total += np.mean(-np.sum(t_probs[iq] * logp, -1))
                n_terms += 1
        want = total / n_terms
        assert got == pytest.approx(want, rel=1e-4)

    def test_last_layer_frozen_early(self):
        net, state, step = self._setup()
        rng = np.random.default_rng(2)
        batch = {
            "global_feat": jnp.asarray(
                rng.standard_normal((4, 2, 50, F)), jnp.float32
            ),
        }
        v0 = np.asarray(state.student_params["head"]["last_layer_v"]).copy()
        state, _ = step(state, batch, jax.random.key(0))  # step 0: frozen
        v1 = np.asarray(state.student_params["head"]["last_layer_v"])
        np.testing.assert_allclose(v0, v1)
        state, _ = step(state, batch, jax.random.key(0))  # step 1: training
        v2 = np.asarray(state.student_params["head"]["last_layer_v"])
        assert not np.allclose(v1, v2)


class TestMoCo:
    def test_queue_and_loss(self):
        backbone = EcapaTdnn(channels=32, feat_dim=F, embed_dim=16)

        class Enc(DINONet):  # reuse embed-only wrapper
            pass

        import flax.linen as nn

        class Encoder(nn.Module):
            backbone: nn.Module

            def __call__(self, feats, train=False):
                from wespeaker_hubert_tpu.models.registry import (
                    embedding_from_outputs,
                )

                return embedding_from_outputs(
                    self.backbone(feats, train=train)
                )

        net = Encoder(backbone=backbone)
        tx = optax.sgd(0.05, momentum=0.9)
        feats = jnp.zeros((4, 50, F))
        state = create_moco_state(
            net, tx, jax.random.key(0), feats, embed_dim=16, K=32
        )
        step = make_moco_train_step(net, tx, m=0.99, T=0.07)
        rng = np.random.default_rng(0)
        batch = {
            "query_feat": jnp.asarray(
                rng.standard_normal((4, 50, F)), jnp.float32
            ),
            "key_feat": jnp.asarray(
                rng.standard_normal((4, 50, F)), jnp.float32
            ),
        }
        q0 = np.asarray(state.queue).copy()
        state, metrics = step(state, batch, jax.random.key(1))
        assert np.isfinite(float(metrics["loss"]))
        assert int(state.queue_ptr) == 4
        q1 = np.asarray(state.queue)
        assert not np.allclose(q0[:4], q1[:4])  # enqueued
        np.testing.assert_allclose(q0[4:], q1[4:])  # rest untouched
        # key encoder rows are normalized
        np.testing.assert_allclose(
            np.linalg.norm(q1[:4], axis=1), 1.0, atol=1e-5
        )


class TestSimCLR:
    def test_info_nce_perfect_alignment(self):
        # identical views -> positive sim 1.0 in column 0
        rng = np.random.default_rng(0)
        f = rng.standard_normal((6, 8)).astype(np.float32)
        feats = jnp.asarray(np.concatenate([f, f]))
        logits, labels = info_nce_logits(feats, 2, T=1.0)
        assert logits.shape == (12, 11)
        np.testing.assert_allclose(np.asarray(logits)[:, 0], 1.0, atol=1e-5)
        assert (np.asarray(labels) == 0).all()


class TestSSLPipeline:
    def test_multicrop_batches(self, tmp_path):
        import json

        from wespeaker_hubert_tpu.data import load_data_list, write_wav

        rng = np.random.default_rng(0)
        entries = []
        for i in range(12):
            n = int(rng.integers(33000, 49000))
            path = str(tmp_path / f"u{i}.wav")
            write_wav(path, (rng.standard_normal(n) * 0.1).clip(-1, 1))
            entries.append({"key": f"u{i}", "wav": path, "spk": f"s{i % 3}"})
        lst = tmp_path / "ssl.list"
        with open(lst, "w") as f:
            for e in entries:
                f.write(json.dumps(e) + "\n")

        pipe = SSLPipeline(
            load_data_list(str(lst)),
            global_frames=100,
            local_frames=50,
            batch_size=4,
            aug_prob=0.0,
            shuffle_size=8,
        )
        batches = list(pipe)
        assert len(batches) == 3
        b = batches[0]
        assert b["global_wav"].shape[:2] == (4, 2)
        assert b["local_wav"].shape[:2] == (4, 4)
        assert b["global_wav"].shape[2] > b["local_wav"].shape[2]


if __name__ == "__main__":
    pytest.main([__file__, "-x", "-q"])
