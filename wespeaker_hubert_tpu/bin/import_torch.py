"""Import a reference (WeSpeaker/torch) checkpoint into our format.

Bridges the reference ecosystem: users with published `avg_model.pt`
checkpoints (reference: wespeaker/bin/average_model.py output, loaded by
extract.py:40-44) convert them once and then run our extract / score /
serve stack on TPU.

Usage:
    python -m wespeaker_hubert_tpu.bin.import_torch \
        --model ECAPA_TDNN_GLOB_c1024 \
        --torch_ckpt avg_model.pt \
        --output models/ecapa.ckpt \
        [feat_dim=80] [two_emb_layer=true]

The torch checkpoint may be a bare state_dict or a dict holding one
(keys 'state_dict' / 'model'); 'projection.*' / 'module.' prefixes are
handled.  Only backbone weights convert — the margin-softmax projection
is training-only state.
"""

from __future__ import annotations

import logging
import sys

from ..models.convert_torch import convert_checkpoint
from ..utils.checkpoint import save_checkpoint
from ..utils.config import coerce_value

logger = logging.getLogger("import_torch")


def _load_state_dict(path: str):
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=True)
    if hasattr(obj, "state_dict"):
        obj = obj.state_dict()
    for key in ("state_dict", "model"):
        if isinstance(obj, dict) and key in obj and isinstance(obj[key], dict):
            obj = obj[key]
    sd = {}
    for k, v in obj.items():
        if k.startswith("module."):
            k = k[len("module."):]
        # training checkpoints bundle the classifier head; strip it
        if k.startswith("projection."):
            continue
        sd[k] = v
    return sd


def import_torch(
    model: str, torch_ckpt: str, output: str, **model_args
):
    sd = _load_state_dict(torch_ckpt)
    params, stats = convert_checkpoint(model, sd, **model_args)
    # nest under 'backbone' to line up with SpeakerNet's param tree
    # (backbone + projection) that bin/extract and bin/train target
    save_checkpoint(
        output,
        {
            "params": {"backbone": params},
            "batch_stats": {"backbone": stats},
        },
        meta={"source": torch_ckpt, "model": model},
    )
    import jax

    n = sum(x.size for x in jax.tree.leaves(params))
    logger.info("imported %s: %d params -> %s", model, n, output)
    return output


def main():
    import argparse

    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--model", required=True)
    p.add_argument("--torch_ckpt", required=True)
    p.add_argument("--output", required=True)
    p.add_argument("overrides", nargs="*", help="model_args key=value")
    args = p.parse_args()
    logging.basicConfig(level=logging.INFO)
    model_args = {}
    for ov in args.overrides:
        if "=" not in ov:
            sys.exit(f"bad override {ov!r}: expected key=value")
        k, v = ov.split("=", 1)
        model_args[k] = coerce_value(v)
    import_torch(args.model, args.torch_ckpt, args.output, **model_args)


if __name__ == "__main__":
    main()
