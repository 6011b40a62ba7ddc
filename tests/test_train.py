"""Train-step tests: loss decreases, schedules evolve in-graph, and the
sharded (data x model) step produces the same numbers as single-device."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from wespeaker_hubert_tpu.models import get_projection, get_speaker_model
from wespeaker_hubert_tpu.models.speaker_net import SpeakerNet
from wespeaker_hubert_tpu.ops.pipeline import FeaturePipelineConfig
from wespeaker_hubert_tpu.ops.fbank import FbankConfig
from wespeaker_hubert_tpu.parallel import make_mesh, shard_batch
from wespeaker_hubert_tpu.train import (
    ExponentialDecrease,
    MarginSchedule,
    create_train_state,
    make_eval_embed,
    make_optimizer,
    make_train_step,
    shard_train_state,
)

NUM_CLASS = 32
B, T, F = 16, 100, 40


def _build(project_type="arc_margin", feat_dim=F, num_class=NUM_CLASS):
    backbone = get_speaker_model("ECAPA_TDNN_c512")(
        feat_dim=feat_dim, embed_dim=64
    )
    projection = get_projection(
        {
            "project_type": project_type,
            "embed_dim": 64,
            "num_class": num_class,
            "scale": 32.0,
            "easy_margin": False,
        }
    )
    return SpeakerNet(backbone=backbone, projection=projection)


def _schedules(epoch_iter=10):
    lr = ExponentialDecrease(
        num_epochs=10,
        epoch_iter=epoch_iter,
        initial_lr=0.1,
        final_lr=0.01,
        warm_up_epoch=2,
        scale_ratio=1.0,
    )
    margin = MarginSchedule(
        epoch_iter=epoch_iter,
        increase_start_epoch=2,
        fix_start_epoch=4,
        initial_margin=0.0,
        final_margin=0.2,
    )
    return lr, margin


def _batch(rng, b=B, t=T, f=F, num_class=NUM_CLASS):
    return {
        "feat": jnp.asarray(
            rng.standard_normal((b, t, f)), dtype=jnp.float32
        ),
        "label": jnp.asarray(rng.integers(0, num_class, b)),
    }


class TestTrainStep:
    def test_loss_decreases_on_fixed_batch(self):
        model = _build()
        lr, margin = _schedules()
        tx = make_optimizer(lr, "SGD", weight_decay=1e-4)
        rng = np.random.default_rng(0)
        batch = _batch(rng)
        state = create_train_state(
            model, tx, jax.random.key(0), batch["feat"], batch["label"]
        )
        step = make_train_step(model, tx, lr, margin)
        losses = []
        for i in range(8):
            state, metrics = step(state, batch, jax.random.key(1))
            losses.append(float(metrics["loss"]))
        assert losses[-1] < losses[0], losses
        assert int(state.step) == 8

    def test_schedules_advance(self):
        model = _build()
        lr, margin = _schedules(epoch_iter=2)
        tx = make_optimizer(lr)
        rng = np.random.default_rng(1)
        batch = _batch(rng)
        state = create_train_state(
            model, tx, jax.random.key(0), batch["feat"], batch["label"]
        )
        step = make_train_step(model, tx, lr, margin)
        margins, lrs = [], []
        for i in range(10):
            state, metrics = step(state, batch, jax.random.key(1))
            margins.append(float(metrics["margin"]))
            lrs.append(float(metrics["lr"]))
        assert margins[0] == 0.0
        assert margins[-1] == pytest.approx(0.2, abs=1e-6)
        assert lrs[-1] < lrs[3]  # decaying after warmup

    def test_wav_input_path(self):
        model = _build(feat_dim=80)
        lr, margin = _schedules()
        tx = make_optimizer(lr)
        rng = np.random.default_rng(2)
        wav = jnp.asarray(
            rng.standard_normal((4, 16000)) * 0.1, dtype=jnp.float32
        )
        label = jnp.asarray(rng.integers(0, NUM_CLASS, 4))
        fcfg = FeaturePipelineConfig(fbank=FbankConfig(dither=1.0))
        feats_example = jnp.zeros((4, 98, 80))
        state = create_train_state(
            model, tx, jax.random.key(0), feats_example, label
        )
        step = make_train_step(model, tx, lr, margin, feature_cfg=fcfg)
        state, metrics = step(state, {"wav": wav, "label": label}, jax.random.key(3))
        assert np.isfinite(float(metrics["loss"]))

    def test_sphereface2_uses_aux_loss(self):
        model = _build(project_type="sphereface2")
        lr, margin = _schedules()
        tx = make_optimizer(lr)
        rng = np.random.default_rng(3)
        batch = _batch(rng)
        state = create_train_state(
            model, tx, jax.random.key(0), batch["feat"], batch["label"]
        )
        step = make_train_step(model, tx, lr, margin)
        l0 = None
        for i in range(5):
            state, metrics = step(state, batch, jax.random.key(1))
            if l0 is None:
                l0 = float(metrics["loss"])
        assert float(metrics["loss"]) < l0


class TestShardedTrain:
    def test_sharded_matches_single_device(self):
        assert len(jax.devices()) >= 8
        mesh = make_mesh(model_parallel=2)
        model = _build()
        lr, margin = _schedules()
        tx = make_optimizer(lr, weight_decay=0.0)
        rng = np.random.default_rng(4)
        batch = _batch(rng)
        state0 = create_train_state(
            model, tx, jax.random.key(0), batch["feat"], batch["label"]
        )

        # single-device run
        step_single = make_train_step(model, tx, lr, margin)
        s1, m1 = step_single(state0, batch, jax.random.key(9))
        s1, m1b = step_single(s1, batch, jax.random.key(9))

        # sharded run from the same init
        state_sh = create_train_state(
            model, tx, jax.random.key(0), batch["feat"], batch["label"]
        )
        state_sh = shard_train_state(state_sh, mesh)
        step_sharded = make_train_step(model, tx, lr, margin, mesh=mesh)
        sbatch = shard_batch(batch, mesh)
        s2, m2 = step_sharded(state_sh, sbatch, jax.random.key(9))
        s2, m2b = step_sharded(s2, shard_batch(batch, mesh), jax.random.key(9))

        assert float(m1["loss"]) == pytest.approx(float(m2["loss"]), rel=1e-4)
        # after one optimizer update, cross-shard reduction order introduces
        # small f32 drift
        assert float(m1b["loss"]) == pytest.approx(float(m2b["loss"]), rel=2e-3)

        # head weight is actually sharded over 'model'
        w = s2.params["projection"]["weight"]
        assert len(w.sharding.device_set) == 8

    def test_frontend_tensor_parallel(self):
        """SSL-frontend transformer kernels are TP-sharded over 'model'
        (parallel.mesh._TP_COL/_TP_ROW rules): the sharded step matches
        single-device and the qkv/ffn kernels (and their optimizer
        moments) actually live on shards."""
        from wespeaker_hubert_tpu.frontend import (
            SSLEncoderConfig,
            SSLFrontend,
        )

        cfg = SSLEncoderConfig.tiny(model_type="wavlm")
        frontend = SSLFrontend(cfg, frozen=False)
        backbone = get_speaker_model("ECAPA_TDNN_c512")(
            feat_dim=cfg.hidden_size, embed_dim=32
        )
        projection = get_projection({
            "project_type": "arc_margin", "embed_dim": 32,
            "num_class": 8, "scale": 32.0,
        })
        net = SpeakerNet(
            backbone=backbone, projection=projection, frontend=frontend
        )
        lr, margin = _schedules()
        tx = make_optimizer(lr, weight_decay=0.0)
        rng = np.random.default_rng(7)
        b = 8
        batch = {
            "wav": jnp.asarray(
                rng.standard_normal((b, 3200)) * 0.1, jnp.float32
            ),
            "label": jnp.asarray(rng.integers(0, 8, b)),
        }
        feats_ex = jnp.zeros((b, 10, cfg.hidden_size))
        state0 = create_train_state(
            net, tx, jax.random.key(0), feats_ex,
            batch["label"], example_wav=batch["wav"],
        )
        step_single = make_train_step(net, tx, lr, margin)
        s1, m1 = step_single(state0, batch, jax.random.key(3))

        mesh = make_mesh(model_parallel=2)
        state_sh = create_train_state(
            net, tx, jax.random.key(0), feats_ex,
            batch["label"], example_wav=batch["wav"],
        )
        state_sh = shard_train_state(state_sh, mesh)
        # qkv kernel and its optimizer moment are column-sharded
        qk = state_sh.params["frontend"]["upstream"]["layer_0"][
            "attention"]["q_proj"]["kernel"]
        assert len(qk.sharding.device_set) == 8
        assert not qk.sharding.is_fully_replicated
        ffn_out = state_sh.params["frontend"]["upstream"]["layer_0"][
            "feed_forward"]["output_dense"]["kernel"]
        assert not ffn_out.sharding.is_fully_replicated
        step_sharded = make_train_step(net, tx, lr, margin, mesh=mesh)
        s2, m2 = step_sharded(
            state_sh, shard_batch(batch, mesh), jax.random.key(3)
        )
        assert float(m1["loss"]) == pytest.approx(
            float(m2["loss"]), rel=1e-4
        )
        # Second step exercises the sharded optimizer update end-to-end.
        # Tolerance is loose by necessity: at random init the conv
        # extractor's normalizers sit near their eps floor, so layout-
        # dependent f32 reduction order (the per-layer TP psums) amplifies
        # into ~1e-2 gradient drift — measured mp=2 vs mp=4 param drift is
        # the same 1e-2 order as either vs single-device, and x64 shrinks
        # it 40x (pure rounding, not a semantic difference).
        s2, m2b = step_sharded(
            s2, shard_batch(batch, mesh), jax.random.key(3)
        )
        s1, m1b = step_single(s1, batch, jax.random.key(3))
        assert float(m1b["loss"]) == pytest.approx(
            float(m2b["loss"]), rel=3e-2
        )


    def test_frontend_fsdp(self):
        """fsdp=True shards frontend kernels + optimizer moments over
        'data' on top of TP (the fsdp x tp 2-D layout); first-step loss
        must match single-device."""
        from wespeaker_hubert_tpu.frontend import (
            SSLEncoderConfig,
            SSLFrontend,
        )

        cfg = SSLEncoderConfig.tiny(model_type="wavlm")
        frontend = SSLFrontend(cfg, frozen=False)
        backbone = get_speaker_model("ECAPA_TDNN_c512")(
            feat_dim=cfg.hidden_size, embed_dim=32
        )
        projection = get_projection({
            "project_type": "arc_margin", "embed_dim": 32,
            "num_class": 8, "scale": 32.0,
        })
        net = SpeakerNet(
            backbone=backbone, projection=projection, frontend=frontend
        )
        lr, margin = _schedules()
        tx = make_optimizer(lr, weight_decay=0.0)
        rng = np.random.default_rng(8)
        b = 8
        batch = {
            "wav": jnp.asarray(
                rng.standard_normal((b, 3200)) * 0.1, jnp.float32
            ),
            "label": jnp.asarray(rng.integers(0, 8, b)),
        }
        feats_ex = jnp.zeros((b, 10, cfg.hidden_size))

        def init_state():
            return create_train_state(
                net, tx, jax.random.key(0), feats_ex,
                batch["label"], example_wav=batch["wav"],
            )

        s1, m1 = make_train_step(net, tx, lr, margin)(
            init_state(), batch, jax.random.key(3)
        )

        mesh = make_mesh(model_parallel=2)  # (data=4, model=2)
        state_sh = shard_train_state(init_state(), mesh, fsdp=True)
        from jax.sharding import PartitionSpec as P

        qk = state_sh.params["frontend"]["upstream"]["layer_0"][
            "attention"]["q_proj"]["kernel"]
        assert qk.sharding.spec == P("data", "model"), qk.sharding.spec
        ffn_out = state_sh.params["frontend"]["upstream"]["layer_0"][
            "feed_forward"]["output_dense"]["kernel"]
        assert ffn_out.sharding.spec == P("model", "data")
        conv = state_sh.params["frontend"]["upstream"][
            "feature_extractor"]["conv_1"]["kernel"]
        assert conv.sharding.spec == P(None, None, "data")
        # optimizer moments follow the same layout (ZeRO-3 role)
        moments = [
            leaf for leaf in jax.tree.leaves(
                state_sh.opt_state,
                is_leaf=lambda x: hasattr(x, "sharding"),
            )
            if hasattr(leaf, "sharding")
            and leaf.sharding.spec == P("data", "model")
        ]
        assert moments, "no FSDP-sharded optimizer moments found"
        # non-frontend params stay replicated
        bb = state_sh.params["backbone"]["layer1"]["conv"]["kernel"]
        assert bb.sharding.is_fully_replicated

        step = make_train_step(net, tx, lr, margin, mesh=mesh)
        s2, m2 = step(state_sh, shard_batch(batch, mesh), jax.random.key(3))
        assert float(m1["loss"]) == pytest.approx(
            float(m2["loss"]), rel=1e-4
        )
        # updated params keep their FSDP layout across the step
        qk2 = s2.params["frontend"]["upstream"]["layer_0"][
            "attention"]["q_proj"]["kernel"]
        assert qk2.sharding.spec == P("data", "model")


    def test_eval_embed_sharded(self):
        mesh = make_mesh(model_parallel=1)
        model = _build()
        rng = np.random.default_rng(5)
        batch = _batch(rng)
        variables_model = _build()
        state_vars = model.init(
            jax.random.key(0), batch["feat"], batch["label"], 0.0, train=False
        )
        embed_fn = make_eval_embed(model, mesh=mesh)
        # strip projection for inference parity with extract
        emb = embed_fn(
            {
                "params": state_vars["params"],
                "batch_stats": state_vars.get("batch_stats", {}),
            },
            shard_batch({"feat": batch["feat"]}, mesh),
        )
        assert emb.shape == (B, 64)
        single = make_eval_embed(model)(
            {
                "params": state_vars["params"],
                "batch_stats": state_vars.get("batch_stats", {}),
            },
            {"feat": batch["feat"]},
        )
        np.testing.assert_allclose(
            np.asarray(emb), np.asarray(single), rtol=2e-4, atol=2e-4
        )


if __name__ == "__main__":
    pytest.main([__file__, "-x", "-q"])


class TestScannedStep:
    def test_scanned_equals_sequential(self):
        """num_steps=K scan == K sequential single steps (same data/rng:
        step_fn folds the per-call rng with state.step, and the scan
        passes split(rng)[k] at step k — replicate that exactly)."""
        import jax
        import jax.numpy as jnp
        import numpy as np

        from wespeaker_hubert_tpu.models import get_projection, get_speaker_model
        from wespeaker_hubert_tpu.models.speaker_net import SpeakerNet
        from wespeaker_hubert_tpu.ops.fbank import FbankConfig
        from wespeaker_hubert_tpu.ops.pipeline import FeaturePipelineConfig
        from wespeaker_hubert_tpu.train import (
            ExponentialDecrease,
            MarginSchedule,
            create_train_state,
            make_optimizer,
            make_train_step,
        )

        K, B, T, F, C = 3, 4, 50, 24, 11
        backbone = get_speaker_model("XVEC")(feat_dim=F, embed_dim=16)
        projection = get_projection(
            {"project_type": "arc_margin", "embed_dim": 16,
             "num_class": C, "scale": 32.0}
        )
        net = SpeakerNet(backbone=backbone, projection=projection)
        lr = ExponentialDecrease(num_epochs=2, epoch_iter=10,
                                 initial_lr=0.1, final_lr=0.01,
                                 warm_up_epoch=1)
        margin = MarginSchedule(epoch_iter=10, increase_start_epoch=1,
                                fix_start_epoch=2, initial_margin=0.0,
                                final_margin=0.2)
        tx = make_optimizer(lr, "SGD", weight_decay=1e-4)
        fcfg = FeaturePipelineConfig(
            fbank=FbankConfig(num_mel_bins=F, dither=0.0), spec_aug=False
        )

        rng = np.random.default_rng(0)
        feats = rng.standard_normal((K, B, T, F)).astype(np.float32)
        labels = rng.integers(0, C, (K, B)).astype(np.int32)

        def fresh_state():
            return create_train_state(
                net, tx, jax.random.key(0),
                jnp.zeros((B, T, F)), jnp.zeros((B,), jnp.int32),
            )

        key = jax.random.key(7)

        step1 = make_train_step(net, tx, lr, margin, feature_cfg=fcfg)
        s_seq = fresh_state()
        keys = jax.random.split(key, K)
        losses_seq = []
        for k in range(K):
            s_seq, m = step1(
                s_seq,
                {"feat": jnp.asarray(feats[k]), "label": jnp.asarray(labels[k])},
                keys[k],
            )
            losses_seq.append(float(m["loss"]))

        stepK = make_train_step(net, tx, lr, margin, feature_cfg=fcfg,
                                num_steps=K)
        s_scan, metrics = stepK(
            fresh_state(),
            {"feat": jnp.asarray(feats), "label": jnp.asarray(labels)},
            key,
        )
        np.testing.assert_allclose(
            np.asarray(metrics["loss"]), np.asarray(losses_seq), rtol=2e-5
        )
        a = jax.tree.leaves(s_seq.params)
        bss = jax.tree.leaves(s_scan.params)
        for x, y in zip(a, bss):
            # scan vs per-call executables fuse/reorder float ops
            # differently, and ArcMargin's easy-margin branch can flip
            # for boundary samples, nudging a handful of head rows by
            # O(lr * eps); per-step losses already match to 2e-5, so
            # require bulk closeness with a loose absolute cap
            np.testing.assert_allclose(
                np.asarray(x), np.asarray(y), rtol=2e-3, atol=5e-3
            )
        assert int(s_scan.step) == K


class TestFusedOptimizer:
    def test_fused_sgd_matches_optax_chain(self):
        """train/state.py update_apply: closed-form SGD must equal the
        optax chain step-for-step (params, momentum, count) — it is the
        production path the executor takes when present."""
        import optax

        from wespeaker_hubert_tpu.train.state import make_optimizer

        lr = ExponentialDecrease(
            num_epochs=2, epoch_iter=5, initial_lr=0.1, final_lr=0.01,
            warm_up_epoch=1,
        )
        for nesterov in (True, False):
            tx = make_optimizer(
                lr, "SGD", momentum=0.9, nesterov=nesterov,
                weight_decay=1e-4,
            )
            assert hasattr(tx, "update_apply")
            rng = np.random.default_rng(0)
            params = {
                "w": jnp.asarray(rng.standard_normal((16, 8)), jnp.float32),
                "b": {"x": jnp.asarray(rng.standard_normal(8), jnp.float32)},
            }
            grads = jax.tree.map(lambda p: p * 0.1 + 0.02, params)
            p1, s1 = params, tx.init(params)
            p2, s2 = params, tx.init(params)
            for _ in range(4):
                u, s1 = tx.update(grads, s1, p1)
                p1 = optax.apply_updates(p1, u)
                p2, s2 = tx.update_apply(grads, s2, p2)
            for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(p2)):
                np.testing.assert_allclose(
                    np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-7
                )
            np.testing.assert_allclose(
                np.asarray(s1[1].trace["w"]), np.asarray(s2[1].trace["w"]),
                rtol=1e-6,
            )
            assert int(s1[2].count) == int(s2[2].count) == 4

    def test_frozen_frontend_keeps_plain_path(self):
        """freeze_paths wraps in multi_transform — the fused closed form
        must NOT engage there (different opt_state structure)."""
        from wespeaker_hubert_tpu.train.state import make_optimizer

        lr = ExponentialDecrease(
            num_epochs=2, epoch_iter=5, initial_lr=0.1, final_lr=0.01,
            warm_up_epoch=1,
        )
        tx = make_optimizer(
            lr, "SGD", weight_decay=1e-4,
            freeze_paths=(("frontend", "upstream"),),
        )
        assert not hasattr(tx, "update_apply")
