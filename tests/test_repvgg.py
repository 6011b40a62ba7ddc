"""RepVGG tests: param-count parity vs torch reference and the
reparameterization equivalence (train branches == fused deploy conv)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from wespeaker_hubert_tpu.models import get_speaker_model
from wespeaker_hubert_tpu.models.repvgg import (
    RepVGG,
    convert_repvgg_params,
)


def _param_count(tree):
    return sum(int(np.prod(x.shape)) for x in jax.tree.leaves(tree))


@pytest.mark.parametrize(
    "name,expected",
    [
        ("REPVGG_TINY_A0", 6_833_792),
        ("REPVGG_RSBB_A0", 20_623_648),
    ],
)
def test_param_count(name, expected):
    model = get_speaker_model(name)(feat_dim=80, embed_dim=256)
    x = jnp.zeros((1, 100, 80))
    variables = model.init(jax.random.key(0), x, train=False)
    emb = model.apply(variables, x, train=False)
    assert emb.shape == (1, 256)
    assert _param_count(variables["params"]) == expected


@pytest.mark.parametrize("block", ["RepVGG", "RepSPK"])
def test_reparam_equivalence(block):
    """After some BN-stat updates, fused deploy conv must reproduce the
    train-architecture eval output."""
    kwargs = dict(
        num_blocks=(1, 1, 1, 1),
        strides=(1, 1, 2, 2, 2),
        width_multiplier=(0.25, 0.25, 0.25, 0.25),
        block=block,
        feat_dim=40,
        embed_dim=32,
    )
    model = RepVGG(**kwargs)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 64, 40)), dtype=jnp.float32)
    variables = model.init(jax.random.key(0), x, train=True)
    # run a few train steps so BN stats are non-trivial
    stats = variables.get("batch_stats", {})
    for i in range(3):
        xi = jnp.asarray(
            rng.standard_normal((2, 64, 40)), dtype=jnp.float32
        )
        _, upd = model.apply(
            {"params": variables["params"], "batch_stats": stats},
            xi, train=True, mutable=["batch_stats"],
        )
        stats = upd["batch_stats"]

    want = model.apply(
        {"params": variables["params"], "batch_stats": stats},
        x, train=False,
    )

    deploy_model = RepVGG(**{**kwargs, "deploy": True})
    deploy_params = convert_repvgg_params(
        jax.tree.map(np.asarray, variables["params"]),
        jax.tree.map(np.asarray, stats),
        block=block,
    )
    got = deploy_model.apply({"params": deploy_params}, x, train=False)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-3, atol=1e-4
    )


def test_se_block_variant():
    model = get_speaker_model("REPVGG_D2SE")(
        feat_dim=40, embed_dim=32, use_se=True
    )
    x = jnp.zeros((1, 64, 40))
    variables = model.init(jax.random.key(0), x, train=False)
    emb = model.apply(variables, x, train=False)
    assert emb.shape == (1, 32)
    assert any("se" in k for s in variables["params"] for k in
               (variables["params"][s] if s.startswith("stage") else {}))


if __name__ == "__main__":
    pytest.main([__file__, "-x", "-q"])
