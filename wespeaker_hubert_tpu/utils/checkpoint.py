"""Checkpoint store: save/load train state with partial-load semantics.

Replaces the reference's torch.save/load flow (reference:
wespeaker/utils/checkpoint.py:20-37 — load is strict=False with warnings,
which is what enables frontend-only / backbone-only partial loads in
bin/train.py:125-167; saves are per-epoch model_N.pt plus a final symlink).

Format: a msgpack file (flax.serialization) of the pytree + a small JSON
sidecar with step/epoch metadata.  `load_partial` merges whatever paths
match into the target tree and reports missing/unexpected keys instead of
failing — the functional analogue of strict=False.
"""

from __future__ import annotations

import json
import os
import re
from typing import Any, Dict, List, Optional, Tuple

import flax.serialization
import jax
import numpy as np

__all__ = [
    "save_checkpoint",
    "load_checkpoint",
    "load_partial",
    "latest_checkpoint",
    "average_checkpoints",
]


def _to_host(tree):
    def fetch(x):
        if isinstance(x, jax.Array) and not x.is_fully_addressable:
            # Multi-process run with params sharded over hosts (fsdp):
            # np.asarray on a span-of-non-addressable-devices array raises;
            # gather the global value across processes instead.
            from jax.experimental import multihost_utils

            return np.asarray(multihost_utils.process_allgather(x, tiled=True))
        return np.asarray(x)

    return jax.tree.map(fetch, tree)


def save_checkpoint(path: str, tree: Any, meta: Optional[Dict] = None) -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    data = flax.serialization.to_bytes(_to_host(tree))
    # every process saves (train never rank-gates saves — _to_host's
    # cross-process gather is collective); a per-process tmp name keeps
    # concurrent writers on a SHARED filesystem from clobbering each
    # other mid-write (the final renames are atomic and byte-identical)
    tmp = f"{path}.tmp{jax.process_index()}"
    with open(tmp, "wb") as f:
        f.write(data)
    os.replace(tmp, path)
    if meta is not None:
        mtmp = f"{path}.json.tmp{jax.process_index()}"
        with open(mtmp, "w") as f:
            json.dump(meta, f)
        os.replace(mtmp, path + ".json")


def load_checkpoint(path: str, target: Any = None) -> Any:
    with open(path, "rb") as f:
        data = f.read()
    if target is not None:
        return flax.serialization.from_bytes(target, data)
    return flax.serialization.msgpack_restore(data)


def _flatten(tree, prefix=()):
    out = {}
    if isinstance(tree, dict):
        if not tree and prefix:
            # structural empty node (e.g. optax EmptyState inside a chain's
            # opt_state tuple): must survive flatten->merge->unflatten or
            # tuple restoration fails with a length mismatch
            out[prefix] = {}
        for k, v in tree.items():
            out.update(_flatten(v, prefix + (k,)))
    else:
        out[prefix] = tree
    return out


def _unflatten(flat):
    out = {}
    for path, v in flat.items():
        node = out
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = v
    return out


def load_partial(
    path: str, target: Any
) -> Tuple[Any, List[str], List[str]]:
    """Merge a checkpoint into `target` wherever paths+shapes match
    (strict=False semantics, reference utils/checkpoint.py:20-27).

    Returns (merged, missing_keys, unexpected_keys)."""
    raw = load_checkpoint(path)  # plain nested dict
    target_host = _to_host(flax.serialization.to_state_dict(target))
    flat_t = _flatten(target_host)
    flat_r = _flatten(raw)

    missing, unexpected = [], []
    merged = dict(flat_t)
    for k, v in flat_r.items():
        if (
            k in flat_t
            and isinstance(v, dict) == isinstance(flat_t[k], dict)
            and (isinstance(v, dict) or np.shape(flat_t[k]) == np.shape(v))
        ):
            merged[k] = v
        else:
            unexpected.append("/".join(map(str, k)))
    for k in flat_t:
        if k not in flat_r and not isinstance(flat_t[k], dict):
            missing.append("/".join(map(str, k)))
    restored = flax.serialization.from_state_dict(target, _unflatten(merged))
    return restored, missing, unexpected


def latest_checkpoint(directory: str, pattern: str = r"model_(\d+)\.ckpt") -> Optional[str]:
    """Find the newest epoch checkpoint (reference bin/train.py:160-167
    parses the epoch from the filename)."""
    if not os.path.isdir(directory):
        return None
    best, best_epoch = None, -1
    rx = re.compile(pattern)
    for name in os.listdir(directory):
        m = rx.fullmatch(name)
        if m and int(m.group(1)) > best_epoch:
            best_epoch = int(m.group(1))
            best = os.path.join(directory, name)
    return best


def average_checkpoints(paths: List[str]) -> Any:
    """Uniform parameter averaging of N checkpoints (reference
    bin/average_model.py:48-77).  Float arrays are averaged; integer
    leaves (e.g. BN counters) are taken from the last checkpoint."""
    assert paths
    acc = None
    for p in paths:
        tree = load_checkpoint(p)
        flat = _flatten(tree)
        if acc is None:
            acc = {k: [v] for k, v in flat.items()}
        else:
            for k, v in flat.items():
                acc[k].append(v)
    out = {}
    for k, vs in acc.items():
        v0 = np.asarray(vs[0])
        if np.issubdtype(v0.dtype, np.floating):
            out[k] = np.mean(np.stack([np.asarray(v) for v in vs]), axis=0)
        else:
            out[k] = np.asarray(vs[-1])
    return _unflatten(out)
