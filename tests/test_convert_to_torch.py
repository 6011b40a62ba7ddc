"""Flax -> torch reverse conversion round trip (deployment interop).

For each family: randomly initialize the REFERENCE torch module, import
its weights with convert_torch (torch -> flax), export them back with
convert_to_torch (flax -> torch), and require

  1. the exported state_dict loads with strict=True, and every tensor
     is bit-identical to the original (pure-relayout inversion), and
  2. the reloaded torch model produces identical embeddings.

This is the gate that lets TPU-trained checkpoints flow into the
reference's own export_onnx.py / export_jit.py and their ORT/MNN/Triton
consumers (reference wespeaker/bin/export_onnx.py:46,
runtime/core/speaker/onnx_speaker_model.cc:40).
"""

import os
import sys
import types

import numpy as np
import pytest

REF = "/root/reference"

torch = pytest.importorskip("torch")
pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REF, "wespeaker")),
    reason="reference checkout unavailable",
)


def _ref_module(modname):
    if "wespeaker" not in sys.modules or not hasattr(
        sys.modules.get("wespeaker"), "__path__"
    ):
        pkg = types.ModuleType("wespeaker")
        pkg.__path__ = [os.path.join(REF, "wespeaker")]
        sys.modules["wespeaker"] = pkg
    if REF not in sys.path:
        sys.path.insert(0, REF)
    import importlib

    return importlib.import_module(f"wespeaker.models.{modname}")


def _case(modname, factory, model, margs, fargs=None, in_dim=None):
    """(ref module, ref factory, our model, factory kwargs, convert
    kwargs, forward input dim) — fargs defaults to margs; convert
    kwargs are margs minus embed_dim (the forward-converter protocol)."""
    fargs = dict(margs if fargs is None else fargs)
    cargs = {k: v for k, v in margs.items() if k != "embed_dim"}
    if in_dim is None:
        in_dim = fargs.get("feat_dim") or fargs.get("acoustic_dim")
    return (modname, factory, model, fargs, cargs, in_dim)


CASES = [
    _case("ecapa_tdnn", "ECAPA_TDNN_c512", "ECAPA_TDNN_c512",
          {"feat_dim": 80, "embed_dim": 192}),
    _case("resnet", "ResNet34", "ResNet34",
          {"feat_dim": 80, "embed_dim": 256}),
    _case("resnet", "ResNet293", "ResNet293",
          {"feat_dim": 80, "embed_dim": 256}),
    _case("campplus", "CAMPPlus", "CAMPPlus",
          {"feat_dim": 80, "embed_dim": 512}),
    _case("tdnn", "XVEC", "XVEC", {"feat_dim": 80, "embed_dim": 512}),
    _case("res2net", "Res2Net34_Base", "Res2Net34_Base",
          {"feat_dim": 80, "embed_dim": 256}),
    _case("eres2net", "ERes2Net34_Base", "ERes2Net34_Base",
          {"feat_dim": 80, "embed_dim": 192}),
    _case("gemini_dfresnet", "Gemini_DF_ResNet60", "Gemini_DF_ResNet60",
          {"feat_dim": 80, "embed_dim": 256}),
    _case("repvgg", "REPVGG_TINY_A0", "REPVGG_TINY_A0",
          {"feat_dim": 80, "embed_dim": 256}),
    _case("samresnet", "SimAM_ResNet34_ASP", "SimAM_ResNet34_ASP",
          {"in_planes": 64, "embed_dim": 64},
          fargs={"in_planes": 64, "embed_dim": 64, "acoustic_dim": 80},
          in_dim=80),
    _case("redimnet", "ReDimNetB0", "ReDimNetB0",
          {"feat_dim": 60, "embed_dim": 192}),
    _case("whisper_PMFA", "whisper_PMFA_large_v2", "whisper_PMFA_large_v2",
          {"embed_dim": 32}, fargs={"feat_dim": 64, "embed_dim": 32},
          in_dim=64),
]


@pytest.mark.parametrize(
    "modname,factory,model,fargs,cargs,in_dim", CASES,
    ids=[c[2] for c in CASES],
)
def test_round_trip(modname, factory, model, fargs, cargs, in_dim):
    from wespeaker_hubert_tpu.models.convert_to_torch import (
        _template_constant,
        to_torch_state_dict,
    )
    from wespeaker_hubert_tpu.models.convert_torch import convert_checkpoint

    mod = _ref_module(modname)
    torch.manual_seed(0)
    ref = getattr(mod, factory)(**fargs)
    ref.eval()
    sd = ref.state_dict()

    params, batch_stats = convert_checkpoint(model, sd, **cargs)
    back = to_torch_state_dict(
        model, {"params": params, "batch_stats": batch_stats}, sd, **cargs
    )

    assert set(back) == set(sd)
    for k in sd:
        orig = sd[k].detach().cpu().numpy()
        got = np.asarray(back[k])
        assert got.shape == tuple(orig.shape), k
        if orig.dtype.kind == "f" and not _template_constant(model, k):
            np.testing.assert_array_equal(got, orig.astype(np.float32),
                                          err_msg=k)

    x = torch.randn(2, 200, in_dim)
    with torch.no_grad():
        out0 = ref(x)
        emb0 = (out0[-1] if isinstance(out0, tuple) else out0).numpy()
    ref.load_state_dict({k: torch.tensor(v) for k, v in back.items()},
                        strict=True)
    ref.eval()
    with torch.no_grad():
        out1 = ref(x)
        emb1 = (out1[-1] if isinstance(out1, tuple) else out1).numpy()
    # the round trip itself is bit-exact (state_dict equality above);
    # the forward is compared at float tolerance because torch's CPU
    # oneDNN kernels round differently for freshly-allocated tensors
    # (memory-alignment/thread-count dependent blocking), ~1e-7 noise
    np.testing.assert_allclose(emb1, emb0, rtol=1e-4, atol=1e-6)


def test_tpu_trained_params_export(tmp_path):
    """The production direction: a flax-native (TPU-trained) parameter
    tree — NOT one imported from torch — exports into the reference
    module and produces cosine-1.0 embeddings vs the flax forward."""
    import jax
    import jax.numpy as jnp

    from wespeaker_hubert_tpu.models import (
        embedding_from_outputs,
        get_speaker_model,
    )
    from wespeaker_hubert_tpu.models.convert_to_torch import (
        to_torch_state_dict,
    )

    mod = _ref_module("ecapa_tdnn")
    torch.manual_seed(1)
    ref = mod.ECAPA_TDNN_c512(feat_dim=40, embed_dim=64)
    ref.eval()

    ours = get_speaker_model("ECAPA_TDNN_c512")(feat_dim=40, embed_dim=64)
    variables = ours.init(
        jax.random.key(3), jnp.zeros((1, 100, 40)), train=False
    )
    sd = to_torch_state_dict(
        "ECAPA_TDNN_c512", dict(variables), ref.state_dict(), feat_dim=40
    )
    ref.load_state_dict({k: torch.tensor(v) for k, v in sd.items()},
                        strict=True)
    ref.eval()

    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 200, 40)).astype(np.float32)
    emb_flax = np.asarray(embedding_from_outputs(
        ours.apply(variables, jnp.asarray(x), train=False)
    ))
    with torch.no_grad():
        out = ref(torch.tensor(x))
        emb_torch = (out[-1] if isinstance(out, tuple) else out).numpy()
    cos = np.sum(emb_flax * emb_torch, 1) / (
        np.linalg.norm(emb_flax, axis=1) * np.linalg.norm(emb_torch, axis=1)
    )
    assert cos.min() > 0.99999, cos


def test_export_torch_cli(tmp_path):
    """bin/export_torch end to end: train-shaped checkpoint dir ->
    .pt file that loads strict into the reference module."""
    import jax
    import jax.numpy as jnp

    from wespeaker_hubert_tpu.bin.export_torch import export_torch
    from wespeaker_hubert_tpu.bin.train import build_speaker_net
    from wespeaker_hubert_tpu.utils.checkpoint import save_checkpoint
    from wespeaker_hubert_tpu.utils.config import dump_config

    exp = str(tmp_path / "exp")
    os.makedirs(exp)
    config = {
        "model": "ECAPA_TDNN_c512",
        "model_args": {"feat_dim": 40, "embed_dim": 64},
        "dataset_args": {"fbank_args": {"num_mel_bins": 40}},
    }
    net = build_speaker_net(config, num_class=3)
    variables = net.init(
        jax.random.key(0), jnp.zeros((1, 100, 40)),
        jnp.zeros((1,), "int32"), 0.0, train=False,
    )
    dump_config(config, os.path.join(exp, "config.yaml"))
    save_checkpoint(os.path.join(exp, "avg_model.ckpt"), {
        "params": variables["params"],
        "batch_stats": variables.get("batch_stats", {}),
    })
    out = export_torch(exp, str(tmp_path / "model.pt"), ref_repo=REF)
    sd = torch.load(out, weights_only=True)
    mod = _ref_module("ecapa_tdnn")
    ref = mod.ECAPA_TDNN_c512(feat_dim=40, embed_dim=64)
    ref.load_state_dict(sd, strict=True)


class TestProbeGuards:
    """build_index_map probes the forward converter twice with shifted
    bases (ADVICE r3): a converter-synthesized constant NONZERO leaf
    must be classified 'fresh', not inverted as if it were data from
    low torch indices; and strict export must refuse a float torch
    tensor the mapping never produces (it would ship template init)."""

    def _patch(self, monkeypatch, fake):
        from wespeaker_hubert_tpu.models import convert_to_torch as m

        monkeypatch.setattr(m, "convert_checkpoint", fake)
        return m

    def test_nonzero_constant_leaf_is_fresh(self, monkeypatch):
        def fake(model, sd, **kw):
            params = {
                "dense": {"kernel": np.asarray(sd["w"]).reshape(2, 2).T},
                # a constant ones leaf the torch module does not carry —
                # a single probe would read it as torch indices [1,1,1]
                "scale": np.ones((3,), np.float64),
            }
            return params, {}

        m = self._patch(monkeypatch, fake)
        template = {"w": np.zeros((4,), np.float32)}
        info = m.build_index_map("fake", template)
        assert ("params", "scale") in info["fresh"]
        assert ("params", "dense", "kernel") in info["index_map"]

        variables = {
            "params": {
                "dense": {"kernel": np.arange(4.0).reshape(2, 2)},
                "scale": np.ones((3,), np.float32),
            }
        }
        sd = m.to_torch_state_dict("fake", variables, template)
        np.testing.assert_array_equal(
            sd["w"], np.arange(4.0).reshape(2, 2).T.reshape(-1)
        )

    def test_uncovered_float_tensor_refused_in_strict(self, monkeypatch):
        def fake(model, sd, **kw):
            return {"dense": {"kernel": np.asarray(sd["w"])}}, {}

        m = self._patch(monkeypatch, fake)
        template = {
            "w": np.zeros((4,), np.float32),
            # float tensor the mapping never consumes
            "head.weight": np.full((2,), 0.5, np.float32),
            # integer counter: allowed to keep its template value
            "bn.num_batches_tracked": np.asarray(7, np.int64),
        }
        variables = {"params": {"dense": {"kernel": np.arange(4.0)}}}
        with pytest.raises(ValueError, match="head.weight"):
            m.to_torch_state_dict("fake", variables, template)
        sd = m.to_torch_state_dict(
            "fake", variables, template, strict=False
        )
        assert sd["bn.num_batches_tracked"] == 7
        np.testing.assert_array_equal(sd["head.weight"], [0.5, 0.5])
