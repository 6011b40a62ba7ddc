"""Model-zoo shape + parameter-count parity tests.

Golden param counts computed from the torch reference models
(wespeaker/models/{ecapa_tdnn,resnet,tdnn}.py, counting
`sum(p.numel() for p in m.parameters())` — BN running stats excluded on
both sides)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from wespeaker_hubert_tpu.models import (
    embedding_from_outputs,
    get_speaker_model,
)

# (model, kwargs, embed_dim, expected_params)
CASES = [
    ("ECAPA_TDNN_c512", {}, 192, 5_797_504),
    ("ECAPA_TDNN_GLOB_c512", {}, 192, 6_190_720),
    ("ECAPA_TDNN_GLOB_c1024", {}, 192, 14_657_088),
    ("ResNet18", {}, 256, 4_105_440),
    ("ResNet34", {}, 256, 6_634_336),
    ("ResNet50", {}, 256, 11_131_360),
    ("XVEC", {}, 512, 4_610_524),
    ("Res2Net34_Base", {}, 256, 4_689_024),
    ("ERes2Net34_Base", {}, 192, 6_610_688),
    ("Res2Net34_Large", {}, 256, 13_481_472),
    ("CAMPPlus", {}, 512, 7_176_224),
    ("Gemini_DF_ResNet60", {}, 256, 4_047_840),
    ("Gemini_DF_ResNet114", {}, 256, 6_531_552),
    ("SimAM_ResNet34_ASP", {}, 256, 25_213_760),
    ("XI_VEC_ECAPA_TDNN_c512", {}, 192, 5_896_448),
    ("XI_VEC_XVEC", {}, 512, 4_615_792),
    # ReDimNet: torch reference counts minus 1 (the reference keeps a
    # frozen scalar stage-0 input weight as a Parameter; we skip it)
    ("ReDimNetB0", {"feat": 60}, 192, 1_001_850),
    ("ReDimNetB2", {"feat": 72}, 192, 4_888_240),
    ("whisper_PMFA_large_v2", {"feat": 96, "frames": 50}, 192, None),
]

# deeper/bigger variants: parameter parity only, short 40-frame forward
BIG_CASES = [
    ("ResNet101", {}, 256, 15_892_448),
    ("ResNet152", {}, 256, 19_814_880),
    ("ResNet221", {}, 256, 23_792_224),
    ("ResNet293", {}, 256, 28_626_016),
    ("Gemini_DF_ResNet183", {}, 256, 9_196_384),
    ("Gemini_DF_ResNet237", {}, 256, 11_680_096),
    ("ERes2Net34_Large", {}, 192, 22_462_784),
    ("ERes2Net34_aug", {}, 192, 55_165_024),
    ("ReDimNetB1", {"feat": 72}, 192, 2_123_481 - 1),
    ("ReDimNetB3", {"feat": 72}, 192, 3_220_413 - 1),
    ("SimAM_ResNet100_ASP", {}, 256, 50_232_896),
    ("REPVGG_A0", {}, 256, 14_380_960),
    ("REPVGG_B1", {}, 256, 65_850_752),
    ("XI_VEC_ECAPA_TDNN_c1024", {}, 192, 14_362_816),
]


@pytest.mark.parametrize("name,kwargs,embed_dim,expected", BIG_CASES)
def test_param_count_big_models(name, kwargs, embed_dim, expected):
    feat = kwargs.pop("feat", 80)
    model = get_speaker_model(name)(
        feat_dim=feat, embed_dim=embed_dim, **kwargs
    )
    x = jnp.zeros((1, 48, feat))
    variables = model.init(jax.random.key(0), x, train=False)
    got = _param_count(variables["params"])
    assert got == expected, f"{name}: {got} params, reference has {expected}"


def _param_count(tree):
    return sum(np.prod(x.shape) for x in jax.tree.leaves(tree))


def _init_and_run(name, embed_dim, batch=2, frames=200, feat=80, **kwargs):
    model = get_speaker_model(name)(feat_dim=feat, embed_dim=embed_dim, **kwargs)
    x = jnp.zeros((batch, frames, feat))
    variables = model.init(jax.random.key(0), x, train=False)
    out = model.apply(variables, x, train=False)
    return model, variables, embedding_from_outputs(out)


@pytest.mark.parametrize("name,kwargs,embed_dim,expected", CASES)
def test_param_count_and_shape(name, kwargs, embed_dim, expected):
    _, variables, emb = _init_and_run(name, embed_dim, **kwargs)
    assert emb.shape == (2, embed_dim)
    if expected is not None:
        got = _param_count(variables["params"])
        assert got == expected, f"{name}: {got} params, reference has {expected}"


def test_mask_consistency_ecapa():
    """Masked padded batch ~= unpadded forward (ECAPA: conv edge effects
    only near the pad boundary; pooled embedding should be close)."""
    model = get_speaker_model("ECAPA_TDNN_c512")(feat_dim=80, embed_dim=192)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((1, 150, 80)), dtype=jnp.float32)
    variables = model.init(jax.random.key(0), x, train=False)
    e_full = model.apply(variables, x, train=False)

    xp = jnp.pad(x, ((0, 0), (0, 50), (0, 0)))
    mask = jnp.arange(200)[None, :] < 150
    e_pad = model.apply(variables, xp, mask=mask, train=False)

    cos = jnp.sum(e_full * e_pad) / (
        jnp.linalg.norm(e_full) * jnp.linalg.norm(e_pad)
    )
    assert cos > 0.99, f"cosine {cos}"


def test_mask_consistency_resnet():
    model = get_speaker_model("ResNet34")(feat_dim=80, embed_dim=256)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((1, 160, 80)), dtype=jnp.float32)
    variables = model.init(jax.random.key(0), x, train=False)
    out = model.apply(variables, x, train=False)
    e_full = embedding_from_outputs(out)

    xp = jnp.pad(x, ((0, 0), (0, 40, ), (0, 0)))
    mask = jnp.arange(200)[None, :] < 160
    e_pad = embedding_from_outputs(
        model.apply(variables, xp, mask=mask, train=False)
    )
    cos = jnp.sum(e_full * e_pad) / (
        jnp.linalg.norm(e_full) * jnp.linalg.norm(e_pad)
    )
    assert cos > 0.98, f"cosine {cos}"


def test_train_mode_updates_batch_stats():
    model = get_speaker_model("ECAPA_TDNN_c512")(feat_dim=80, embed_dim=192)
    x = jnp.ones((2, 100, 80))
    variables = model.init(jax.random.key(0), x, train=True)
    _, updates = model.apply(
        variables, x, train=True, mutable=["batch_stats"]
    )
    assert "batch_stats" in updates


def test_unknown_model_raises():
    with pytest.raises(ValueError):
        get_speaker_model("NopeNet")


def test_redimnet_gru_time_context_block():
    """block_1d_type='gru' (reference redimnet.py:566-578): bi-GRU over
    time + 1x1 projection, residual; unused by the factories but part of
    the reference API surface."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from wespeaker_hubert_tpu.models.redimnet import TimeContextBlock1d

    blk = TimeContextBlock1d(24, 8, block_type="gru")
    x = jnp.asarray(
        np.random.default_rng(0).standard_normal((2, 50, 24)), jnp.float32
    )
    variables = blk.init(jax.random.key(0), x)
    y = blk.apply(variables, x)
    assert y.shape == (2, 50, 24)
    assert bool(jnp.isfinite(y).all())
    # recurrence must mix across time: per-frame output depends on other
    # frames' inputs (distinguishes it from the 'fc' pointwise branch)
    x2 = x.at[:, 0, :].set(0.0)
    y2 = blk.apply(variables, x2)
    assert float(jnp.abs(y2[:, -1] - y[:, -1]).max()) > 0
