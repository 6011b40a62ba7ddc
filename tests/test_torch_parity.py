"""Weight-for-weight parity vs the torch reference models: randomly
initialize the REFERENCE implementation, convert its state_dict with
models/convert_torch.py, and require cosine ~1.0 between torch and flax
embeddings on the same inputs.  This is the 'embeddings cosine-allclose
to the PyTorch reference' quality gate from BASELINE.md.

Skipped when /root/reference or torch is unavailable."""

import os
import sys
import types

import numpy as np
import pytest

import jax
import jax.numpy as jnp

REF = "/root/reference"

torch = pytest.importorskip("torch")
pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REF, "wespeaker")),
    reason="reference checkout unavailable",
)


@pytest.fixture(scope="module")
def ref_models():
    """Import reference model modules with a stub package __init__ (the
    real one pulls CLI deps like silero that aren't installed)."""
    if "wespeaker" not in sys.modules or not hasattr(
        sys.modules.get("wespeaker"), "__path__"
    ):
        pkg = types.ModuleType("wespeaker")
        pkg.__path__ = [os.path.join(REF, "wespeaker")]
        sys.modules["wespeaker"] = pkg
    sys.path.insert(0, REF)
    import wespeaker.models.ecapa_tdnn as ref_ecapa
    import wespeaker.models.resnet as ref_resnet

    return ref_ecapa, ref_resnet


def _cos_rows(a, b):
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    return np.sum(a * b, 1) / (
        np.linalg.norm(a, axis=1) * np.linalg.norm(b, axis=1)
    )


def test_ecapa_c512_embedding_parity(ref_models):
    ref_ecapa, _ = ref_models
    from wespeaker_hubert_tpu.models.convert_torch import ecapa_from_torch
    from wespeaker_hubert_tpu.models.ecapa_tdnn import EcapaTdnn

    torch.manual_seed(0)
    ref = ref_ecapa.ECAPA_TDNN_c512(feat_dim=80, embed_dim=192)
    ref.eval()
    feats = np.random.default_rng(0).standard_normal((3, 200, 80)).astype(
        np.float32
    )
    with torch.no_grad():
        ref_out = ref(torch.from_numpy(feats))
    ref_emb = ref_out[-1].numpy()

    params, stats = ecapa_from_torch(ref.state_dict())
    ours = EcapaTdnn(channels=512, feat_dim=80, embed_dim=192)
    emb = ours.apply(
        {"params": params, "batch_stats": stats},
        jnp.asarray(feats),
        train=False,
    )
    cos = _cos_rows(emb, ref_emb)
    assert cos.min() > 0.9999, cos
    np.testing.assert_allclose(np.asarray(emb), ref_emb, rtol=1e-2, atol=1e-3)


def test_ecapa_glob_c1024_embedding_parity(ref_models):
    ref_ecapa, _ = ref_models
    from wespeaker_hubert_tpu.models.convert_torch import ecapa_from_torch
    from wespeaker_hubert_tpu.models.ecapa_tdnn import EcapaTdnn

    torch.manual_seed(1)
    ref = ref_ecapa.ECAPA_TDNN_GLOB_c1024(feat_dim=80, embed_dim=192)
    ref.eval()
    feats = np.random.default_rng(1).standard_normal((2, 150, 80)).astype(
        np.float32
    )
    with torch.no_grad():
        ref_emb = ref(torch.from_numpy(feats))[-1].numpy()

    params, stats = ecapa_from_torch(ref.state_dict(), channels=1024)
    ours = EcapaTdnn(
        channels=1024, feat_dim=80, embed_dim=192, global_context_att=True
    )
    emb = ours.apply(
        {"params": params, "batch_stats": stats},
        jnp.asarray(feats),
        train=False,
    )
    cos = _cos_rows(emb, ref_emb)
    assert cos.min() > 0.9999, cos


def test_resnet34_embedding_parity(ref_models):
    _, ref_resnet = ref_models
    from wespeaker_hubert_tpu.models.convert_torch import resnet_from_torch
    from wespeaker_hubert_tpu.models.resnet import ResNet34

    torch.manual_seed(2)
    ref = ref_resnet.ResNet34(feat_dim=80, embed_dim=256)
    ref.eval()
    feats = np.random.default_rng(2).standard_normal((3, 200, 80)).astype(
        np.float32
    )
    with torch.no_grad():
        ref_emb = ref(torch.from_numpy(feats))[-1].numpy()

    params, stats = resnet_from_torch(ref.state_dict())
    ours = ResNet34(feat_dim=80, embed_dim=256)
    out = ours.apply(
        {"params": params, "batch_stats": stats},
        jnp.asarray(feats),
        train=False,
    )
    emb = out[-1]
    cos = _cos_rows(emb, ref_emb)
    assert cos.min() > 0.9999, cos


if __name__ == "__main__":
    pytest.main([__file__, "-x", "-q"])


def test_campplus_embedding_parity(ref_models):
    sys.path.insert(0, REF)
    import wespeaker.models.campplus as ref_campplus

    from wespeaker_hubert_tpu.models.campplus import CAMPPlus
    from wespeaker_hubert_tpu.models.convert_torch import campplus_from_torch

    torch.manual_seed(3)
    ref = ref_campplus.CAMPPlus(feat_dim=80, embed_dim=512)
    ref.eval()
    feats = np.random.default_rng(3).standard_normal((2, 200, 80)).astype(
        np.float32
    )
    with torch.no_grad():
        out = ref(torch.from_numpy(feats))
        ref_emb = (out[-1] if isinstance(out, (tuple, list)) else out).numpy()

    params, stats = campplus_from_torch(ref.state_dict())
    ours = CAMPPlus(feat_dim=80, embed_dim=512)
    emb = ours.apply(
        {"params": params, "batch_stats": stats},
        jnp.asarray(feats),
        train=False,
    )
    cos = _cos_rows(emb, ref_emb)
    assert cos.min() > 0.9999, cos


def test_eres2net_embedding_parity(ref_models):
    sys.path.insert(0, REF)
    import wespeaker.models.eres2net as ref_eres2net

    from wespeaker_hubert_tpu.models.convert_torch import eres2net_from_torch
    from wespeaker_hubert_tpu.models.eres2net import ERes2Net34_Base

    torch.manual_seed(4)
    ref = ref_eres2net.ERes2Net34_Base(feat_dim=80, embed_dim=192)
    ref.eval()
    feats = np.random.default_rng(4).standard_normal((2, 200, 80)).astype(
        np.float32
    )
    with torch.no_grad():
        out = ref(torch.from_numpy(feats))
        ref_emb = (out[-1] if isinstance(out, (tuple, list)) else out).numpy()

    params, stats = eres2net_from_torch(ref.state_dict())
    ours = ERes2Net34_Base(feat_dim=80, embed_dim=192)
    emb = ours.apply(
        {"params": params, "batch_stats": stats},
        jnp.asarray(feats),
        train=False,
    )
    cos = _cos_rows(emb, ref_emb)
    assert cos.min() > 0.9999, cos


def test_repvgg_tiny_a0_embedding_parity(ref_models):
    sys.path.insert(0, REF)
    import wespeaker.models.repvgg as ref_repvgg

    from wespeaker_hubert_tpu.models.convert_torch import repvgg_from_torch
    from wespeaker_hubert_tpu.models.repvgg import REPVGG_FACTORIES

    torch.manual_seed(5)
    ref = ref_repvgg.REPVGG_TINY_A0(feat_dim=40, embed_dim=64)
    ref.eval()
    feats = np.random.default_rng(5).standard_normal((2, 96, 40)).astype(
        np.float32
    )
    with torch.no_grad():
        out = ref(torch.from_numpy(feats))
        ref_emb = (out[-1] if isinstance(out, (tuple, list)) else out).numpy()

    params, stats = repvgg_from_torch(
        ref.state_dict(),
        num_blocks=(3, 4, 23, 3),
        width_multiplier=(0.5, 0.5, 0.5, 0.5),
        feat_dim=40,
    )
    ours = REPVGG_FACTORIES["REPVGG_TINY_A0"](feat_dim=40, embed_dim=64)
    emb = ours.apply(
        {"params": params, "batch_stats": stats},
        jnp.asarray(feats),
        train=False,
    )
    cos = _cos_rows(emb, ref_emb)
    assert cos.min() > 0.9999, cos


def test_repvgg_rsbb_deploy_parity(ref_models):
    """RSBB (dilated-branch) variant, converted twice: training-form
    checkpoint AND torch-side deploy-form (repvgg_model_convert)."""
    sys.path.insert(0, REF)
    import wespeaker.models.repvgg as ref_repvgg

    from wespeaker_hubert_tpu.models.convert_torch import repvgg_from_torch
    from wespeaker_hubert_tpu.models.repvgg import REPVGG_FACTORIES

    torch.manual_seed(6)
    ref = ref_repvgg.REPVGG_TINY_RSBB_A0(feat_dim=40, embed_dim=64)
    ref.eval()
    feats = np.random.default_rng(6).standard_normal((2, 96, 40)).astype(
        np.float32
    )
    with torch.no_grad():
        out = ref(torch.from_numpy(feats))
        ref_emb = (out[-1] if isinstance(out, (tuple, list)) else out).numpy()

    params, stats = repvgg_from_torch(
        ref.state_dict(),
        num_blocks=(3, 4, 23, 3),
        width_multiplier=(0.5, 0.5, 0.5, 0.5),
        block="RepSPK",
        feat_dim=40,
    )
    ours = REPVGG_FACTORIES["REPVGG_TINY_RSBB_A0"](feat_dim=40, embed_dim=64)
    emb = ours.apply(
        {"params": params, "batch_stats": stats},
        jnp.asarray(feats),
        train=False,
    )
    cos = _cos_rows(emb, ref_emb)
    # 33 stacked dilated-conv blocks accumulate ~1e-4 f32 reduction-order
    # noise (single-block parity is 1e-6; see convert_torch.py docstring)
    assert cos.min() > 0.9995, cos

    # deploy-form: torch-side fuse, then convert the reparam checkpoint
    deploy_ref = ref_repvgg.repvgg_model_convert(ref)
    deploy_ref.eval()
    with torch.no_grad():
        out = deploy_ref(torch.from_numpy(feats))
        dep_emb = (out[-1] if isinstance(out, (tuple, list)) else out).numpy()
    np.testing.assert_allclose(dep_emb, ref_emb, rtol=1e-3, atol=1e-4)

    dparams, _ = repvgg_from_torch(
        deploy_ref.state_dict(),
        num_blocks=(3, 4, 23, 3),
        width_multiplier=(0.5, 0.5, 0.5, 0.5),
        block="RepSPK",
        feat_dim=40,
    )
    ours_dep = REPVGG_FACTORIES["REPVGG_TINY_RSBB_A0"](
        feat_dim=40, embed_dim=64, deploy=True
    )
    emb_dep = ours_dep.apply(
        {"params": dparams}, jnp.asarray(feats), train=False
    )
    cos = _cos_rows(emb_dep, ref_emb)
    assert cos.min() > 0.9995, cos


def test_xvec_embedding_parity(ref_models):
    sys.path.insert(0, REF)
    import wespeaker.models.tdnn as ref_tdnn

    from wespeaker_hubert_tpu.models.convert_torch import xvec_from_torch
    from wespeaker_hubert_tpu.models.tdnn import XVEC

    torch.manual_seed(7)
    ref = ref_tdnn.XVEC(feat_dim=40, embed_dim=64)
    ref.eval()
    feats = np.random.default_rng(7).standard_normal((2, 120, 40)).astype(
        np.float32
    )
    with torch.no_grad():
        out = ref(torch.from_numpy(feats))
        ref_emb = (out[-1] if isinstance(out, (tuple, list)) else out).numpy()

    params, stats = xvec_from_torch(ref.state_dict())
    ours = XVEC(feat_dim=40, embed_dim=64)
    out = ours.apply(
        {"params": params, "batch_stats": stats},
        jnp.asarray(feats),
        train=False,
    )
    emb = out[-1] if isinstance(out, (tuple, list)) else out
    cos = _cos_rows(emb, ref_emb)
    assert cos.min() > 0.9999, cos


def test_gemini_dfresnet_embedding_parity(ref_models):
    sys.path.insert(0, REF)
    import wespeaker.models.gemini_dfresnet as ref_gem

    from wespeaker_hubert_tpu.models.convert_torch import gemini_from_torch
    from wespeaker_hubert_tpu.models.gemini_dfresnet import Gemini_DF_ResNet60

    torch.manual_seed(8)
    ref = ref_gem.Gemini_DF_ResNet60(
        feat_dim=80, embed_dim=64, two_emb_layer=True
    )
    ref.eval()
    feats = np.random.default_rng(8).standard_normal((2, 96, 80)).astype(
        np.float32
    )
    with torch.no_grad():
        out = ref(torch.from_numpy(feats))
        ref_emb = (out[-1] if isinstance(out, (tuple, list)) else out).numpy()

    params, stats = gemini_from_torch(
        ref.state_dict(), feat_dim=80, two_emb_layer=True
    )
    ours = Gemini_DF_ResNet60(feat_dim=80, embed_dim=64, two_emb_layer=True)
    out = ours.apply(
        {"params": params, "batch_stats": stats},
        jnp.asarray(feats),
        train=False,
    )
    emb = out[-1]
    cos = _cos_rows(emb, ref_emb)
    assert cos.min() > 0.9999, cos


def test_samresnet_embedding_parity(ref_models):
    sys.path.insert(0, REF)
    import wespeaker.models.samresnet as ref_sam

    from wespeaker_hubert_tpu.models.convert_torch import samresnet_from_torch

    torch.manual_seed(9)
    ref = ref_sam.SimAM_ResNet34_ASP(
        in_planes=32, embed_dim=64, acoustic_dim=40
    )
    ref.eval()
    feats = np.random.default_rng(9).standard_normal((2, 96, 40)).astype(
        np.float32
    )
    with torch.no_grad():
        out = ref(torch.from_numpy(feats))
        ref_emb = (out[-1] if isinstance(out, (tuple, list)) else out).numpy()

    params, stats = samresnet_from_torch(
        ref.state_dict(), in_planes=32, feat_dim=40
    )
    from wespeaker_hubert_tpu.models.samresnet import SimAMResNet

    ours = SimAMResNet(32, (3, 4, 6, 3), 64, 40)
    emb = ours.apply(
        {"params": params, "batch_stats": stats},
        jnp.asarray(feats),
        train=False,
    )
    cos = _cos_rows(emb, ref_emb)
    assert cos.min() > 0.9999, cos


def test_res2net_embedding_parity(ref_models):
    sys.path.insert(0, REF)
    import wespeaker.models.res2net as ref_res2net

    from wespeaker_hubert_tpu.models.convert_torch import res2net_from_torch
    from wespeaker_hubert_tpu.models.res2net import Res2Net34_Base

    torch.manual_seed(10)
    ref = ref_res2net.Res2Net34_Base(feat_dim=40, embed_dim=64)
    ref.eval()
    feats = np.random.default_rng(10).standard_normal((2, 96, 40)).astype(
        np.float32
    )
    with torch.no_grad():
        out = ref(torch.from_numpy(feats))
        ref_emb = (out[-1] if isinstance(out, (tuple, list)) else out).numpy()

    params, stats = res2net_from_torch(ref.state_dict(), feat_dim=40)
    ours = Res2Net34_Base(feat_dim=40, embed_dim=64)
    out = ours.apply(
        {"params": params, "batch_stats": stats},
        jnp.asarray(feats),
        train=False,
    )
    emb = out[-1] if isinstance(out, (tuple, list)) else out
    cos = _cos_rows(emb, ref_emb)
    assert cos.min() > 0.9999, cos


def test_xi_vector_embedding_parity(ref_models):
    """XI pooling on both backbones (reference xi_vector.py:31-49)."""
    sys.path.insert(0, REF)
    import wespeaker.models.xi_vector as ref_xi

    from wespeaker_hubert_tpu.models.convert_torch import (
        ecapa_from_torch,
        xvec_from_torch,
    )
    from wespeaker_hubert_tpu.models.xi_vector import (
        XI_VEC_ECAPA_TDNN_c512,
        XI_VEC_XVEC,
    )

    feats = np.random.default_rng(11).standard_normal((2, 120, 40)).astype(
        np.float32
    )

    torch.manual_seed(11)
    ref = ref_xi.XI_VEC_XVEC(feat_dim=40, embed_dim=64)
    ref.eval()
    with torch.no_grad():
        out = ref(torch.from_numpy(feats))
        ref_emb = (out[-1] if isinstance(out, (tuple, list)) else out).numpy()
    params, stats = xvec_from_torch(ref.state_dict(), pooling_func="XI")
    ours = XI_VEC_XVEC(feat_dim=40, embed_dim=64)
    out = ours.apply(
        {"params": params, "batch_stats": stats}, jnp.asarray(feats),
        train=False,
    )
    emb = out[-1] if isinstance(out, (tuple, list)) else out
    cos = _cos_rows(emb, ref_emb)
    assert cos.min() > 0.9999, cos

    torch.manual_seed(12)
    ref = ref_xi.XI_VEC_ECAPA_TDNN_c512(feat_dim=40, embed_dim=64)
    ref.eval()
    with torch.no_grad():
        out = ref(torch.from_numpy(feats))
        ref_emb = (out[-1] if isinstance(out, (tuple, list)) else out).numpy()
    params, stats = ecapa_from_torch(
        ref.state_dict(), channels=512, pooling_func="XI"
    )
    ours = XI_VEC_ECAPA_TDNN_c512(feat_dim=40, embed_dim=64)
    emb = ours.apply(
        {"params": params, "batch_stats": stats}, jnp.asarray(feats),
        train=False,
    )
    emb = emb[-1] if isinstance(emb, (tuple, list)) else emb
    cos = _cos_rows(emb, ref_emb)
    assert cos.min() > 0.9999, cos


def test_redimnet_b0_embedding_parity(ref_models):
    """B0: basic_resnet blocks, conv_exp squeeze stages, TCB everywhere."""
    sys.path.insert(0, REF)
    import wespeaker.models.redimnet as ref_rdn

    from wespeaker_hubert_tpu.models.convert_torch import redimnet_from_torch
    from wespeaker_hubert_tpu.models.redimnet import ReDimNetB0

    torch.manual_seed(13)
    ref = ref_rdn.ReDimNetB0(feat_dim=60, embed_dim=64)
    ref.eval()
    feats = np.random.default_rng(13).standard_normal((2, 100, 60)).astype(
        np.float32
    )
    with torch.no_grad():
        out = ref(torch.from_numpy(feats))
        ref_emb = (out[-1] if isinstance(out, (tuple, list)) else out).numpy()

    setup = [(1, 2, 1, ((3, 3),), 30), (2, 3, 2, ((3, 3),), 30),
             (1, 3, 3, ((3, 3),), 30), (2, 4, 2, ((3, 3),), 10),
             (1, 3, 1, ((3, 3),), 10)]
    params, stats = redimnet_from_torch(
        ref.state_dict(), setup, C=10, feat_dim=60,
        block_2d_type="basic_resnet",
    )
    ours = ReDimNetB0(feat_dim=60, embed_dim=64)
    out = ours.apply(
        {"params": params, "batch_stats": stats},
        jnp.asarray(feats),
        train=False,
    )
    emb = out[-1] if isinstance(out, (tuple, list)) else out
    cos = _cos_rows(emb, ref_emb)
    assert cos.min() > 0.9999, cos


def test_redimnet_b1_embedding_parity(ref_models):
    """B1: convnext blocks, stages without TCB, stride-3 stage."""
    sys.path.insert(0, REF)
    import wespeaker.models.redimnet as ref_rdn

    from wespeaker_hubert_tpu.models.convert_torch import redimnet_from_torch
    from wespeaker_hubert_tpu.models.redimnet import ReDimNetB1

    torch.manual_seed(14)
    ref = ref_rdn.ReDimNetB1(feat_dim=72, embed_dim=64)
    ref.eval()
    feats = np.random.default_rng(14).standard_normal((2, 100, 72)).astype(
        np.float32
    )
    with torch.no_grad():
        out = ref(torch.from_numpy(feats))
        ref_emb = (out[-1] if isinstance(out, (tuple, list)) else out).numpy()

    setup = [(1, 2, 1, ((3, 3),), None), (2, 3, 1, ((3, 3),), None),
             (3, 4, 1, ((3, 3),), 12), (2, 5, 1, ((3, 3),), 12),
             (2, 3, 1, ((3, 3),), 8)]
    params, stats = redimnet_from_torch(
        ref.state_dict(), setup, C=12, feat_dim=72,
        block_2d_type="convnext_like",
    )
    ours = ReDimNetB1(feat_dim=72, embed_dim=64)
    out = ours.apply(
        {"params": params, "batch_stats": stats},
        jnp.asarray(feats),
        train=False,
    )
    emb = out[-1] if isinstance(out, (tuple, list)) else out
    cos = _cos_rows(emb, ref_emb)
    assert cos.min() > 0.9999, cos


def test_whisper_pmfa_head_parity(ref_models):
    sys.path.insert(0, REF)
    import wespeaker.models.whisper_PMFA as ref_pmfa

    from wespeaker_hubert_tpu.models.convert_torch import (
        whisper_pmfa_from_torch,
    )
    from wespeaker_hubert_tpu.models.whisper_pmfa import WhisperPMFA

    torch.manual_seed(15)
    ref = ref_pmfa.whisper_PMFA(output_size=96, embedding_dim=64)
    ref.eval()
    feats = np.random.default_rng(15).standard_normal((2, 50, 96)).astype(
        np.float32
    )
    with torch.no_grad():
        out = ref(torch.from_numpy(feats))
        ref_emb = (out[-1] if isinstance(out, (tuple, list)) else out).numpy()

    params, stats = whisper_pmfa_from_torch(ref.state_dict())
    ours = WhisperPMFA(output_size=96, embed_dim=64)
    emb = ours.apply(
        {"params": params, "batch_stats": stats},
        jnp.asarray(feats),
        train=False,
    )
    cos = _cos_rows(emb, ref_emb)
    assert cos.min() > 0.9999, cos


def test_import_torch_cli_roundtrip(ref_models, tmp_path):
    """import_torch CLI -> extract API: converted checkpoint must load
    into the SpeakerNet tree (regression: un-nested backbone params were
    silently all-missing and extraction ran on random init)."""
    sys.path.insert(0, REF)
    import json

    import wespeaker.models.tdnn as ref_tdnn

    from wespeaker_hubert_tpu.bin.extract import extract
    from wespeaker_hubert_tpu.bin.import_torch import import_torch
    from wespeaker_hubert_tpu.data import write_wav

    torch.manual_seed(16)
    ref = ref_tdnn.XVEC(feat_dim=80, embed_dim=64)
    sd = {"module." + k: v for k, v in ref.state_dict().items()}
    sd["module.projection.weight"] = torch.zeros(10, 64)
    pt = str(tmp_path / "avg_model.pt")
    torch.save(sd, pt)

    ckpt = str(tmp_path / "xvec.ckpt")
    import_torch("XVEC", pt, ckpt, feat_dim=80)

    rng = np.random.default_rng(16)
    entries = []
    for i in range(2):
        p = str(tmp_path / f"u{i}.wav")
        write_wav(p, (rng.standard_normal(20000) * 0.1).clip(-1, 1))
        entries.append({"key": f"u{i}", "wav": p})
    lst = str(tmp_path / "x.list")
    with open(lst, "w") as f:
        for e in entries:
            f.write(json.dumps(e) + "\n")

    config = {
        "model": "XVEC",
        "model_args": {"feat_dim": 80, "embed_dim": 64},
    }
    keys, emb = extract(
        config, lst, ckpt, str(tmp_path / "e.npz"), batch_size=2
    )
    assert sorted(keys) == ["u0", "u1"]
    assert np.isfinite(emb).all()

    # wrong-model checkpoint must be refused, not silently random
    bad = str(tmp_path / "bad.ckpt")
    import_torch("XVEC", pt, bad, feat_dim=80)
    config_bad = {
        "model": "ECAPA_TDNN_c512",
        "model_args": {"feat_dim": 80, "embed_dim": 64},
    }
    with pytest.raises(RuntimeError, match="matched no backbone"):
        extract(config_bad, lst, bad, str(tmp_path / "b.npz"), batch_size=2)


def test_hub_alias_loads_published_torch_bundle(ref_models, tmp_path,
                                                monkeypatch):
    """Reference-hub UX offline (cli/hub.py): a published bundle
    (config.yaml + torch avg_model.pt, the modelscope tar layout) dropped
    into the hub root loads by alias, auto-converting on first use, and
    produces the same embedding as the torch model."""
    sys.path.insert(0, REF)
    import wespeaker.models.tdnn as ref_tdnn

    from wespeaker_hubert_tpu.cli.speaker import load_model
    from wespeaker_hubert_tpu.data import write_wav
    from wespeaker_hubert_tpu.utils.config import dump_config

    monkeypatch.setenv("WESPEAKER_TPU_HUB", str(tmp_path / "hub"))
    bundle = tmp_path / "hub" / "english"
    bundle.mkdir(parents=True)
    torch.manual_seed(3)
    ref = ref_tdnn.XVEC(feat_dim=40, embed_dim=32)
    ref.eval()
    torch.save(ref.state_dict(), str(bundle / "avg_model.pt"))
    dump_config(
        {
            "model": "XVEC",
            "model_args": {"feat_dim": 40, "embed_dim": 32},
            "dataset_args": {"fbank_args": {"num_mel_bins": 40}},
        },
        str(bundle / "config.yaml"),
    )

    speaker = load_model("english")
    assert os.path.exists(bundle / "avg_model.ckpt")
    rng = np.random.default_rng(3)
    wav_path = str(tmp_path / "u.wav")
    write_wav(wav_path, (rng.standard_normal(24000) * 0.1).clip(-1, 1))
    emb = speaker.extract_embedding(wav_path)

    from wespeaker_hubert_tpu.ops.fbank import FbankConfig, fbank
    from wespeaker_hubert_tpu.data import read_wav

    wav, _ = read_wav(wav_path)
    feats, _ = fbank(
        jnp.asarray(wav)[None] * 32768.0,
        FbankConfig(num_mel_bins=40, dither=0.0),
    )
    feats = feats - feats.mean(axis=1, keepdims=True)
    with torch.no_grad():
        ref_emb = ref(torch.from_numpy(np.asarray(feats)))
    if isinstance(ref_emb, tuple):
        ref_emb = ref_emb[-1]
    cos = _cos_rows(emb[None], ref_emb.numpy())
    assert cos.min() > 0.999, cos


def test_redimnet_b3_fwse_embedding_parity(ref_models):
    """B3: basic_resnet_fwse blocks — covers the fwSE + grouped-conv
    pointwise converter path."""
    sys.path.insert(0, REF)
    import wespeaker.models.redimnet as ref_rdn

    from wespeaker_hubert_tpu.models.convert_torch import (
        _REDIMNET_CFG,
        redimnet_from_torch,
    )
    from wespeaker_hubert_tpu.models.redimnet import ReDimNetB3

    torch.manual_seed(17)
    ref = ref_rdn.ReDimNetB3(feat_dim=72, embed_dim=64)
    ref.eval()
    feats = np.random.default_rng(17).standard_normal((1, 60, 72)).astype(
        np.float32
    )
    with torch.no_grad():
        out = ref(torch.from_numpy(feats))
        ref_emb = (out[-1] if isinstance(out, (tuple, list)) else out).numpy()

    C, F, b2, setup = _REDIMNET_CFG["ReDimNetB3"]
    params, stats = redimnet_from_torch(
        ref.state_dict(), setup, C=C, feat_dim=F, block_2d_type=b2
    )
    ours = ReDimNetB3(feat_dim=72, embed_dim=64)
    out = ours.apply(
        {"params": params, "batch_stats": stats},
        jnp.asarray(feats),
        train=False,
    )
    emb = out[-1] if isinstance(out, (tuple, list)) else out
    cos = _cos_rows(emb, ref_emb)
    assert cos.min() > 0.999, cos
