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
