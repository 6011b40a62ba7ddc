"""StableHLO serialization: the portable deployment artifact standing in
for the reference's ONNX/TorchScript exports (reference
bin/export_onnx.py:46).  Round-trips the serialized graph through
jax.export.deserialize and checks symbolic batch/time dims."""

import numpy as np

import jax
import jax.numpy as jnp
from jax import export as jax_export

from wespeaker_hubert_tpu.bin.export_model import export_stablehlo
from wespeaker_hubert_tpu.bin.train import build_speaker_net
from wespeaker_hubert_tpu.utils.checkpoint import save_checkpoint


def test_stablehlo_roundtrip(tmp_path):
    config = {
        "model": "ECAPA_TDNN_c512",
        "model_args": {"feat_dim": 40, "embed_dim": 32},
    }
    net = build_speaker_net(config, num_class=2)
    variables = net.init(
        jax.random.key(0),
        jnp.zeros((1, 100, 40)),
        jnp.zeros((1,), jnp.int32),
        0.0,
        train=False,
    )
    ckpt = str(tmp_path / "m.ckpt")
    save_checkpoint(
        ckpt,
        {
            "params": variables["params"],
            "batch_stats": variables.get("batch_stats", {}),
        },
    )
    path = export_stablehlo(config, ckpt, str(tmp_path / "m.stablehlo"))

    revived = jax_export.deserialize(open(path, "rb").read())
    feats = np.random.default_rng(0).standard_normal((3, 150, 40)).astype(
        np.float32
    )
    out = np.asarray(revived.call(jnp.asarray(feats)))
    assert out.shape == (3, 32)
    assert np.isfinite(out).all()

    # the exported artifact must match a direct apply bit-for-bit
    direct = np.asarray(
        net.apply(
            {
                "params": variables["params"],
                "batch_stats": variables.get("batch_stats", {}),
            },
            jnp.asarray(feats),
            method=net.embed,
        )
    )
    np.testing.assert_allclose(out, direct, rtol=1e-5, atol=1e-6)

    # symbolic dims: different batch and time must work
    out2 = np.asarray(revived.call(jnp.asarray(feats[:1, :97])))
    assert out2.shape == (1, 32)


def test_export_bf16_bundle(tmp_path):
    """dtype='bf16' export: params cast to bfloat16, compute_dtype set
    in the bundled config (the reference export_jit dynamic-quantization
    role), and embeddings from the bundle stay cosine-close to f32."""
    import os

    from wespeaker_hubert_tpu.bin.export_model import export_model
    from wespeaker_hubert_tpu.utils.checkpoint import (
        _flatten,
        load_checkpoint,
    )
    from wespeaker_hubert_tpu.utils.config import dump_config, load_config

    config = {
        "model": "ECAPA_TDNN_c512",
        "model_args": {"feat_dim": 40, "embed_dim": 32},
    }
    net = build_speaker_net(config, num_class=2)
    variables = net.init(
        jax.random.key(0), jnp.zeros((1, 100, 40)),
        jnp.zeros((1,), jnp.int32), 0.0, train=False,
    )
    exp = tmp_path / "exp"
    exp.mkdir()
    dump_config(config, str(exp / "config.yaml"))
    tree = {
        "params": variables["params"],
        "batch_stats": variables.get("batch_stats", {}),
    }
    save_checkpoint(str(exp / "avg_model.ckpt"), tree)

    out = export_model(str(exp), str(tmp_path / "bundle"), dtype="bf16")
    assert load_config(os.path.join(out, "config.yaml"))[
        "compute_dtype"] == "bf16"
    exported = load_checkpoint(os.path.join(out, "avg_model.ckpt"))
    flat = {
        k: v for k, v in _flatten(exported).items()
        if not isinstance(v, dict)
    }
    assert flat, "empty exported tree"
    assert all(v.dtype == jnp.bfloat16 for v in flat.values()
               if np.issubdtype(v.dtype, np.floating))
    # artifact is ~half the f32 bundle
    f32 = os.path.getsize(str(exp / "avg_model.ckpt"))
    bf16 = os.path.getsize(os.path.join(out, "avg_model.ckpt"))
    assert bf16 < 0.65 * f32

    feats = np.random.default_rng(1).standard_normal((2, 120, 40)).astype(
        np.float32
    )
    e32 = np.asarray(net.apply(tree, jnp.asarray(feats), method=net.embed))
    cast = jax.tree.map(
        lambda x: jnp.asarray(x, jnp.float32)
        if hasattr(x, "dtype") and x.dtype == jnp.bfloat16 else x,
        exported,
    )
    e16 = np.asarray(net.apply(cast, jnp.asarray(feats), method=net.embed))
    cos = np.sum(e32 * e16, 1) / (
        np.linalg.norm(e32, axis=1) * np.linalg.norm(e16, axis=1)
    )
    assert cos.min() > 0.999


def test_infer_export_wav(tmp_path):
    """bin/infer_export (the reference infer_onnx.py role): wav -> fbank
    + CMN -> deserialized StableHLO graph -> embedding, and the result
    matches the in-framework feats->embed apply."""
    from wespeaker_hubert_tpu.bin.infer_export import compute_fbank, infer
    from wespeaker_hubert_tpu.data import write_wav

    config = {
        "model": "ECAPA_TDNN_c512",
        "model_args": {"feat_dim": 40, "embed_dim": 32},
    }
    net = build_speaker_net(config, num_class=2)
    variables = net.init(
        jax.random.key(1),
        jnp.zeros((1, 100, 40)),
        jnp.zeros((1,), jnp.int32),
        0.0,
        train=False,
    )
    ckpt = str(tmp_path / "m.ckpt")
    save_checkpoint(
        ckpt,
        {
            "params": variables["params"],
            "batch_stats": variables.get("batch_stats", {}),
        },
    )
    path = export_stablehlo(config, ckpt, str(tmp_path / "m.stablehlo"))

    rng = np.random.default_rng(7)
    wav_path = str(tmp_path / "a.wav")
    write_wav(wav_path, (rng.standard_normal(24000) * 0.1).astype(np.float32))

    feats = compute_fbank(wav_path, num_mel_bins=40)
    emb = infer(path, feats)
    assert emb.shape == (1, 32)
    assert np.isfinite(emb).all()

    direct = np.asarray(
        net.apply(
            {
                "params": variables["params"],
                "batch_stats": variables.get("batch_stats", {}),
            },
            jnp.asarray(feats),
            method=net.embed,
        )
    )
    np.testing.assert_allclose(emb, direct, rtol=1e-5, atol=1e-6)
