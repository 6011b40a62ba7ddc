"""Offline pretrained-model hub: alias -> local model directory.

Reference: wespeaker/cli/hub.py:88-124 — `Hub.get_model(lang)` maps an
alias ('chinese', 'english', 'campplus', ...) to `~/.wespeaker/<alias>`
and downloads the published tar from modelscope when the directory is
missing.  This environment has no network egress, so the TPU hub keeps
the alias UX but resolves strictly locally:

  1. an `aliases.json` registry ({alias: model_dir}) in the hub root —
     `$WESPEAKER_TPU_HUB` or `~/.wespeaker_tpu` — lets users register
     any directory under any alias;
  2. otherwise `<hub_root>/<alias>/` itself is the model directory.

A resolved directory must contain `config.yaml` plus a checkpoint.  If it
only holds a published TORCH checkpoint (`avg_model.pt`, the format the
reference's modelscope tars ship — cli/hub.py:109-111), it is converted
in place via bin/import_torch using the `model`/`model_args` from the
bundled config, so reference download bundles work after an scp.
"""

from __future__ import annotations

import json
import logging
import os

logger = logging.getLogger("hub")

__all__ = ["Hub", "ensure_native_checkpoint"]

# Reference cli/hub.py:89-96 asset table: alias -> (model name, model_args
# overrides for conversion when the bundled config lacks them).
KNOWN_ALIASES = (
    "chinese",       # cnceleb_resnet34
    "english",       # voxceleb_resnet221_LM
    "campplus",      # campplus_cn_common_200k
    "eres2net",      # eres2net_cn_commom_200k
    "vblinkp",       # voxblink2_samresnet34
    "vblinkf",       # voxblink2_samresnet34_ft
)

_NATIVE_CKPTS = ("avg_model.ckpt", "final_model.ckpt")


def hub_root() -> str:
    return os.environ.get(
        "WESPEAKER_TPU_HUB",
        os.path.join(os.path.expanduser("~"), ".wespeaker_tpu"),
    )


def _has_native_checkpoint(model_dir: str) -> bool:
    if any(
        os.path.exists(os.path.join(model_dir, c)) for c in _NATIVE_CKPTS
    ):
        return True
    models = os.path.join(model_dir, "models")
    return os.path.isdir(models) and any(
        f.endswith(".ckpt") for f in os.listdir(models)
    )


def ensure_native_checkpoint(model_dir: str) -> str:
    """Make sure `model_dir` holds a native checkpoint; auto-convert a
    published torch `avg_model.pt` (reference bundle format) if that is
    all there is.  Returns the model_dir."""
    if _has_native_checkpoint(model_dir):
        return model_dir
    pt = os.path.join(model_dir, "avg_model.pt")
    cfg_path = os.path.join(model_dir, "config.yaml")
    if os.path.exists(pt) and os.path.exists(cfg_path):
        from ..bin.import_torch import import_torch
        from ..utils.config import load_config

        config = load_config(cfg_path)
        model_args = dict(config.get("model_args", {}))
        # embed_dim/feat_dim are the only args conversion needs; projection
        # (training-only) args are dropped by import_torch
        logger.info("converting %s -> avg_model.ckpt (%s)", pt,
                    config["model"])
        import_torch(
            config["model"], pt, os.path.join(model_dir, "avg_model.ckpt"),
            **model_args,
        )
        return model_dir
    raise FileNotFoundError(
        f"{model_dir!r} holds neither a native .ckpt nor a convertible "
        "config.yaml + avg_model.pt bundle"
    )


class Hub:
    """Alias resolution (reference cli/hub.py Hub.get_model, offline)."""

    @staticmethod
    def register(alias: str, model_dir: str) -> None:
        """Persist alias -> directory in the hub registry."""
        root = hub_root()
        os.makedirs(root, exist_ok=True)
        reg_path = os.path.join(root, "aliases.json")
        reg = {}
        if os.path.exists(reg_path):
            with open(reg_path) as f:
                reg = json.load(f)
        reg[alias] = os.path.abspath(model_dir)
        with open(reg_path, "w") as f:
            json.dump(reg, f, indent=2, sort_keys=True)

    @staticmethod
    def get_model(alias: str) -> str:
        root = hub_root()
        reg_path = os.path.join(root, "aliases.json")
        if os.path.exists(reg_path):
            with open(reg_path) as f:
                reg = json.load(f)
            if alias in reg:
                return ensure_native_checkpoint(reg[alias])
        cand = os.path.join(root, alias)
        if os.path.isdir(cand):
            return ensure_native_checkpoint(cand)
        known = (
            " (a known reference alias — place its published bundle there)"
            if alias in KNOWN_ALIASES
            else ""
        )
        raise ValueError(
            f"unknown model alias {alias!r}{known}: no entry in {reg_path} "
            f"and no directory {cand}. Offline hub: copy a model directory "
            f"(config.yaml + avg_model.ckpt, or a reference config.yaml + "
            f"avg_model.pt which converts automatically) into the hub root "
            f"({root}) or register one with "
            "wespeaker_hubert_tpu.cli.hub.Hub.register(alias, dir)."
        )
