"""Model export: package a deployable model directory.

The reference's deployment exports are ONNX/TorchScript/MNN graphs
(reference: bin/export_onnx.py:46 with mean-vec folding :62-75,
export_jit.py, export_mnn.py) consumed by the C++ runtime.  The
TPU-native deployment artifact is a MODEL DIRECTORY — config.yaml +
averaged checkpoint (+ optional mean vector folded into the checkpoint as
an output bias-style subtraction) — loaded by cli.Speaker and
bin/extract; XLA recompiles the jitted graph per target, which replaces
the serialized-graph role of ONNX.
"""

from __future__ import annotations

import os
import shutil
from typing import Optional


from ..utils.checkpoint import load_checkpoint, save_checkpoint
from ..utils.config import dump_config, load_config

__all__ = ["export_model"]


def export_model(
    exp_dir: str,
    output_dir: str,
    checkpoint: Optional[str] = None,
    mean_vec: Optional[str] = None,
) -> str:
    """Create `output_dir` with config.yaml + avg_model.ckpt (+ mean_vec).

    `mean_vec` (npy) is stored alongside; scoring utilities subtract it
    (the reference folds it into the ONNX graph at export_onnx.py:62-75 —
    here it stays a sidecar array the Speaker/scoring path applies).
    """
    os.makedirs(output_dir, exist_ok=True)
    config = load_config(os.path.join(exp_dir, "config.yaml"))
    dump_config(config, os.path.join(output_dir, "config.yaml"))

    ckpt = checkpoint or os.path.join(exp_dir, "avg_model.ckpt")
    tree = load_checkpoint(ckpt)
    save_checkpoint(os.path.join(output_dir, "avg_model.ckpt"), tree)

    if mean_vec:
        shutil.copy(mean_vec, os.path.join(output_dir, "mean_vec.npy"))
    return output_dir


def main():
    import argparse

    p = argparse.ArgumentParser()
    p.add_argument("--exp_dir", required=True)
    p.add_argument("--output_dir", required=True)
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--mean_vec", default=None)
    args = p.parse_args()
    out = export_model(args.exp_dir, args.output_dir, args.checkpoint,
                       args.mean_vec)
    print(f"exported model dir -> {out}")


if __name__ == "__main__":
    main()
