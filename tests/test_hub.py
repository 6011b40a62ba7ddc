"""Offline hub (cli/hub.py): alias -> local model dir resolution and the
torch-bundle auto-conversion hook (reference cli/hub.py:88-124 UX without
network access)."""

import json
import os

import pytest

from wespeaker_hubert_tpu.cli.hub import (
    Hub,
    ensure_native_checkpoint,
    hub_root,
)


@pytest.fixture()
def hub(tmp_path, monkeypatch):
    root = tmp_path / "hubroot"
    monkeypatch.setenv("WESPEAKER_TPU_HUB", str(root))
    return root


def _native_dir(path):
    path.mkdir(parents=True, exist_ok=True)
    (path / "config.yaml").write_text("model: ECAPA_TDNN_c512\n")
    (path / "avg_model.ckpt").write_bytes(b"\0")
    return str(path)


def test_registry_resolution(hub, tmp_path):
    d = _native_dir(tmp_path / "anywhere" / "mymodel")
    Hub.register("english", d)
    assert hub_root() == str(hub)
    assert Hub.get_model("english") == d
    # registry file is plain JSON, user-editable
    reg = json.load(open(hub / "aliases.json"))
    assert reg["english"] == d


def test_hub_dir_fallback(hub):
    d = _native_dir(hub / "campplus")
    assert Hub.get_model("campplus") == d


def test_unknown_alias_raises_with_instructions(hub):
    with pytest.raises(ValueError, match="chinese.*known reference alias"):
        Hub.get_model("chinese")
    with pytest.raises(ValueError, match="unknown model alias"):
        Hub.get_model("not_an_alias")


def test_ensure_native_passthrough_and_refusal(tmp_path):
    d = _native_dir(tmp_path / "m")
    assert ensure_native_checkpoint(d) == d
    # models/*.ckpt also counts (bin/train output layout)
    d2 = tmp_path / "m2"
    (d2 / "models").mkdir(parents=True)
    (d2 / "models" / "model_3.ckpt").write_bytes(b"\0")
    assert ensure_native_checkpoint(str(d2)) == str(d2)
    empty = tmp_path / "empty"
    empty.mkdir()
    with pytest.raises(FileNotFoundError):
        ensure_native_checkpoint(str(empty))


def test_registered_torch_bundle_converts(hub, tmp_path, monkeypatch):
    """A registered dir holding only config.yaml + avg_model.pt goes
    through bin/import_torch (conversion itself is parity-tested in
    test_torch_parity.py; here the wiring is verified)."""
    d = tmp_path / "torchbundle"
    d.mkdir()
    (d / "config.yaml").write_text(
        "model: XVEC\nmodel_args:\n  feat_dim: 40\n  embed_dim: 8\n"
    )
    (d / "avg_model.pt").write_bytes(b"\0")
    calls = {}

    def fake_import(model, pt, out, **model_args):
        calls["args"] = (model, pt, out, model_args)
        open(out, "wb").write(b"\0")
        return out

    import wespeaker_hubert_tpu.bin.import_torch as it

    monkeypatch.setattr(it, "import_torch", fake_import)
    Hub.register("xv", str(d))
    assert Hub.get_model("xv") == str(d)
    model, pt, out, margs = calls["args"]
    assert model == "XVEC" and pt.endswith("avg_model.pt")
    assert out.endswith("avg_model.ckpt")
    assert margs == {"feat_dim": 40, "embed_dim": 8}
    # second resolution: already converted, no re-run
    calls.clear()
    assert Hub.get_model("xv") == str(d)
    assert not calls


if __name__ == "__main__":
    pytest.main([__file__, "-x", "-q"])
