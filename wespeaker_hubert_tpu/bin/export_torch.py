"""Export a TPU-trained checkpoint as a torch state_dict (.pt).

The bridge into the reference deployment ecosystem: the produced file
loads into the reference torch module of the same name
(`model.load_state_dict(torch.load(out))`), after which the reference's
own export_onnx.py / export_jit.py / export_mnn.py run unchanged —
covering the ORT C++ runtime, MNN, and Triton TensorRT consumers
(reference wespeaker/bin/export_onnx.py:46,
runtime/core/speaker/onnx_speaker_model.cc:40).

Usage:
  python -m wespeaker_hubert_tpu.bin.export_torch \
      --exp_dir exp/ECAPA... [--checkpoint path.ckpt] \
      --ref_repo /path/to/wespeaker --output exported.pt

The reference repo is only needed for the state-dict TEMPLATE (tensor
names + shapes); conversion itself is numpy
(models/convert_to_torch.py).
"""

from __future__ import annotations

import argparse
import os
import sys
import types

from ..models.convert_to_torch import to_torch_state_dict
from ..utils.checkpoint import latest_checkpoint, load_checkpoint
from ..utils.config import load_config

__all__ = ["export_torch"]


def _reference_model(ref_repo: str, model: str, **model_args):
    """Instantiate the reference torch module by registry name."""
    if "wespeaker" not in sys.modules or not hasattr(
        sys.modules.get("wespeaker"), "__path__"
    ):
        pkg = types.ModuleType("wespeaker")
        pkg.__path__ = [os.path.join(ref_repo, "wespeaker")]
        sys.modules["wespeaker"] = pkg
    if ref_repo not in sys.path:
        sys.path.insert(0, ref_repo)
    from wespeaker.models.speaker_model import get_speaker_model

    return get_speaker_model(model)(**model_args)


def export_torch(
    exp_dir: str,
    output: str,
    checkpoint: str | None = None,
    ref_repo: str = "/root/reference",
) -> str:
    import torch

    config = load_config(os.path.join(exp_dir, "config.yaml"))
    ckpt = checkpoint
    if ckpt is None:
        for cand in ("avg_model.ckpt", "final_model.ckpt"):
            p = os.path.join(exp_dir, cand)
            if os.path.exists(p):
                ckpt = p
                break
    if ckpt is None:
        ckpt = latest_checkpoint(os.path.join(exp_dir, "models"))
    assert ckpt, f"no checkpoint under {exp_dir}"

    state = load_checkpoint(ckpt)
    variables = {
        "params": state["params"].get("backbone", state["params"]),
        "batch_stats": (state.get("batch_stats") or {}).get(
            "backbone", state.get("batch_stats") or {}
        ),
    }
    model = config["model"]
    margs = dict(config.get("model_args", {}))
    ref = _reference_model(ref_repo, model, **margs)
    sd = to_torch_state_dict(
        model, variables, ref.state_dict(),
        **{k: v for k, v in margs.items() if k != "embed_dim"},
    )
    tensors = {k: torch.tensor(v) for k, v in sd.items()}
    ref.load_state_dict(tensors, strict=True)  # validates before writing
    torch.save(tensors, output)
    return output


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--exp_dir", required=True)
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--ref_repo", default="/root/reference",
                   help="reference WeSpeaker checkout (template shapes)")
    p.add_argument("--output", required=True, help="output .pt path")
    args = p.parse_args()
    out = export_torch(args.exp_dir, args.output,
                       checkpoint=args.checkpoint, ref_repo=args.ref_repo)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
