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

__all__ = ["export_model", "export_stablehlo"]


def export_stablehlo(
    config: dict,
    checkpoint: str,
    output_path: str,
    feat_dim: Optional[int] = None,
) -> str:
    """Serialize the feats->embedding graph as portable StableHLO
    (jax.export), the role ONNX/TorchScript graphs play for the
    reference's C++/Triton runtimes (reference bin/export_onnx.py:46).

    The exported function takes (B, T, F) features with symbolic batch
    and time dims and returns (B, embed_dim) embeddings; any PJRT
    runtime can load the artifact without Python.
    """
    import jax
    import jax.numpy as jnp
    from jax import export as jax_export

    from ..utils.checkpoint import load_partial
    from .train import build_speaker_net

    net = build_speaker_net(config, num_class=2)
    fd = feat_dim or config.get("model_args", {}).get("feat_dim", 80)
    variables = net.init(
        jax.random.key(0),
        jnp.zeros((1, 100, fd)),
        jnp.zeros((1,), jnp.int32),
        0.0,
        train=False,
    )
    target = {
        "params": variables["params"],
        "batch_stats": variables.get("batch_stats", {}),
    }
    restored, _, _ = load_partial(checkpoint, target)

    def embed(feats):
        return net.apply(restored, feats, method=net.embed)

    b, t = jax_export.symbolic_shape("b, t")
    exported = jax_export.export(jax.jit(embed))(
        jax.ShapeDtypeStruct((b, t, fd), jnp.float32)
    )
    blob = exported.serialize()
    os.makedirs(os.path.dirname(output_path) or ".", exist_ok=True)
    with open(output_path, "wb") as f:
        f.write(blob)
    return output_path


def export_model(
    exp_dir: str,
    output_dir: str,
    checkpoint: Optional[str] = None,
    mean_vec: Optional[str] = None,
    dtype: Optional[str] = None,
) -> str:
    """Create `output_dir` with config.yaml + avg_model.ckpt (+ mean_vec).

    `mean_vec` (npy) is stored alongside; scoring utilities subtract it
    (the reference folds it into the ONNX graph at export_onnx.py:62-75 —
    here it stays a sidecar array the Speaker/scoring path applies).

    `dtype='bf16'` casts all f32 leaves to bfloat16 in the bundle (the
    runtime cast_variables_bf16 applied offline) and sets
    compute_dtype: bf16 in the bundled config so bin/extract runs bf16
    by default — half the artifact size, the role of the reference's
    dynamic-quantization export (export_jit.py:53-65).
    """
    os.makedirs(output_dir, exist_ok=True)
    config = load_config(os.path.join(exp_dir, "config.yaml"))
    if dtype:
        if dtype != "bf16":
            raise ValueError(f"unsupported export dtype {dtype!r}")
        config["compute_dtype"] = dtype
    dump_config(config, os.path.join(output_dir, "config.yaml"))

    ckpt = checkpoint or os.path.join(exp_dir, "avg_model.ckpt")
    tree = load_checkpoint(ckpt)
    if dtype == "bf16":
        from ..train import cast_variables_bf16

        tree = cast_variables_bf16(tree)
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
    p.add_argument("--stablehlo", action="store_true",
                   help="also serialize feats->embedding as StableHLO")
    p.add_argument("--dtype", default=None, choices=["bf16"],
                   help="cast float params (the dynamic-quantization "
                        "export role, reference export_jit.py:53-65)")
    args = p.parse_args()
    out = export_model(args.exp_dir, args.output_dir, args.checkpoint,
                       args.mean_vec, dtype=args.dtype)
    if args.stablehlo:
        config = load_config(os.path.join(out, "config.yaml"))
        path = export_stablehlo(
            config,
            os.path.join(out, "avg_model.ckpt"),
            os.path.join(out, "model.stablehlo"),
        )
        print(f"stablehlo -> {path}")
    print(f"exported model dir -> {out}")


if __name__ == "__main__":
    main()
