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
