"""Checkpoint averaging CLI (reference bin/average_model.py:48)."""

from __future__ import annotations

import os
import re

from ..utils.checkpoint import average_checkpoints, save_checkpoint

__all__ = ["average_model"]


def average_model(
    model_dir: str,
    dst: str,
    num: int = 10,
    min_epoch: int = 0,
    max_epoch: int = 65536,
) -> str:
    """Average the last `num` epoch checkpoints in
    [min_epoch, max_epoch] into `dst` (reference bin/average_model.py
    --num/--min_epoch/--max_epoch)."""
    rx = re.compile(r"model_(\d+)\.ckpt$")
    found = []
    for name in os.listdir(model_dir):
        m = rx.fullmatch(name)
        if m and min_epoch <= int(m.group(1)) <= max_epoch:
            found.append((int(m.group(1)), os.path.join(model_dir, name)))
    found.sort()
    paths = [p for _, p in found[-num:]]
    assert paths, f"no checkpoints in {model_dir}"
    avg = average_checkpoints(paths)
    save_checkpoint(dst, avg, meta={"averaged_from": [p for p in paths]})
    return dst


def main():
    import argparse

    p = argparse.ArgumentParser()
    p.add_argument("--src_dir", required=True)
    p.add_argument("--dst_model", required=True)
    p.add_argument("--num", type=int, default=10)
    p.add_argument("--min_epoch", type=int, default=0)
    p.add_argument("--max_epoch", type=int, default=65536)
    args = p.parse_args()
    average_model(args.src_dir, args.dst_model, args.num,
                  args.min_epoch, args.max_epoch)


if __name__ == "__main__":
    main()
