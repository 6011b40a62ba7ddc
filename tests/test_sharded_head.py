"""Explicit TP margin-softmax vs the reference-path unsharded head:
loss, accuracy, AND gradients must match."""

import numpy as np
import optax
import pytest

import jax
import jax.numpy as jnp

from wespeaker_hubert_tpu.models.projections import ArcMarginProduct
from wespeaker_hubert_tpu.parallel import make_mesh
from wespeaker_hubert_tpu.parallel.sharded_head import (
    init_sharded_head_weight,
    make_sharded_arcmargin_loss,
)

B, D, C = 16, 32, 64


@pytest.fixture(scope="module")
def setup():
    mesh = make_mesh(model_parallel=4)
    rng = np.random.default_rng(0)
    embed = jnp.asarray(rng.standard_normal((B, D)), jnp.float32)
    label = jnp.asarray(rng.integers(0, C, B))
    weight = init_sharded_head_weight(jax.random.key(0), D, C, mesh)
    return mesh, embed, label, weight


def _reference_loss(embed, weight, label, margin):
    head = ArcMarginProduct(D, C, scale=32.0)
    logits, _ = head.apply({"params": {"weight": weight}}, embed, label, margin)
    loss = jnp.mean(
        optax.softmax_cross_entropy_with_integer_labels(logits, label)
    )
    acc = jnp.mean(jnp.argmax(logits, axis=1) == label)
    return loss, acc


@pytest.mark.parametrize("margin", [0.0, 0.2])
def test_loss_and_acc_match_unsharded(setup, margin):
    mesh, embed, label, weight = setup
    fn = make_sharded_arcmargin_loss(mesh, C, scale=32.0)
    loss_s, acc_s = fn(embed, weight, label, jnp.float32(margin))
    loss_r, acc_r = _reference_loss(embed, np.asarray(weight), label, margin)
    assert float(loss_s) == pytest.approx(float(loss_r), rel=1e-5)
    assert float(acc_s) == pytest.approx(float(acc_r))


def test_gradients_match_unsharded(setup):
    mesh, embed, label, weight = setup
    fn = make_sharded_arcmargin_loss(mesh, C, scale=32.0)

    g_s = jax.grad(
        lambda e, w: fn(e, w, label, jnp.float32(0.2))[0], argnums=(0, 1)
    )(embed, weight)
    g_r = jax.grad(
        lambda e, w: _reference_loss(e, w, label, 0.2)[0], argnums=(0, 1)
    )(embed, jnp.asarray(np.asarray(weight)))

    np.testing.assert_allclose(
        np.asarray(g_s[0]), np.asarray(g_r[0]), rtol=1e-4, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(g_s[1]), np.asarray(g_r[1]), rtol=1e-4, atol=1e-6
    )


def test_weight_stays_sharded(setup):
    mesh, embed, label, weight = setup
    # the weight array is laid out over 4 'model' shards x 2 'data'
    assert len(weight.sharding.device_set) == 8
    shard_shapes = {s.data.shape for s in weight.addressable_shards}
    assert shard_shapes == {(D, C // 4)}


if __name__ == "__main__":
    pytest.main([__file__, "-x", "-q"])


def test_scanned_step_on_mesh():
    """loop_steps scan composes with the (data, model) mesh: stacked
    batches shard on dim 1 and the step compiles + runs."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from wespeaker_hubert_tpu.models import get_projection, get_speaker_model
    from wespeaker_hubert_tpu.models.speaker_net import SpeakerNet
    from wespeaker_hubert_tpu.ops.fbank import FbankConfig
    from wespeaker_hubert_tpu.ops.pipeline import FeaturePipelineConfig
    from wespeaker_hubert_tpu.parallel import make_mesh, shard_batch
    from wespeaker_hubert_tpu.train import (
        ExponentialDecrease,
        MarginSchedule,
        create_train_state,
        make_optimizer,
        make_train_step,
        shard_train_state,
    )

    mesh = make_mesh(model_parallel=2)
    K, B, T, F, C = 2, 8, 40, 24, 16
    backbone = get_speaker_model("XVEC")(feat_dim=F, embed_dim=16)
    projection = get_projection(
        {"project_type": "arc_margin", "embed_dim": 16,
         "num_class": C, "scale": 32.0}
    )
    net = SpeakerNet(backbone=backbone, projection=projection)
    lr = ExponentialDecrease(num_epochs=2, epoch_iter=10, initial_lr=0.1,
                             final_lr=0.01, warm_up_epoch=1)
    margin = MarginSchedule(epoch_iter=10, increase_start_epoch=1,
                            fix_start_epoch=2, initial_margin=0.0,
                            final_margin=0.2)
    tx = make_optimizer(lr, "SGD", weight_decay=1e-4)
    fcfg = FeaturePipelineConfig(
        fbank=FbankConfig(num_mel_bins=F, dither=0.0), spec_aug=False
    )
    state = create_train_state(
        net, tx, jax.random.key(0),
        jnp.zeros((B, T, F)), jnp.zeros((B,), jnp.int32),
    )
    state = shard_train_state(state, mesh)
    step = make_train_step(net, tx, lr, margin, feature_cfg=fcfg,
                           mesh=mesh, num_steps=K)
    rng = np.random.default_rng(0)
    batch = {
        "feat": rng.standard_normal((K, B, T, F)).astype(np.float32),
        "label": rng.integers(0, C, (K, B)).astype(np.int32),
    }
    batch = shard_batch(batch, mesh, stacked=True)
    state, metrics = step(state, batch, jax.random.key(1))
    assert metrics["loss"].shape == (K,)
    assert np.isfinite(np.asarray(metrics["loss"])).all()
    assert int(state.step) == K
