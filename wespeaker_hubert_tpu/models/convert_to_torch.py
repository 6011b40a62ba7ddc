"""Flax parameter tree -> torch-reference state_dict (the REVERSE of
models/convert_torch.py).

Role: deployment interop — TPU-trained checkpoints load into the
reference torch modules unchanged, so the reference's own exporters
(wespeaker/bin/export_onnx.py:46 dynamic-axes opset-14 export,
export_jit.py, export_mnn.py) and its ORT/MNN/Triton consumers
(runtime/core/speaker/onnx_speaker_model.cc:40) work on our models.
It is also the strongest offline parity gate: a flax->torch->flax round
trip must be bit-exact, and torch embeddings from exported weights must
match flax embeddings (tests/test_convert_to_torch.py).

Design: rather than hand-maintaining a second mapping per family, the
forward converter IS the mapping — every `*_from_torch` is a pure
relayout (transposes / reshapes / row permutations / concats), so
probing it once with a state_dict whose every element carries a unique
global index records exactly where each torch element lands in the flax
tree.  Inverting that index map converts any real parameter tree back.
Families whose forward conversion does arithmetic (e.g. a fused
reparameterization) would produce non-integer probe values and are
rejected with a clear error instead of silently corrupting weights.
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np

from .convert_torch import convert_checkpoint

__all__ = ["to_torch_state_dict", "build_index_map"]


# Float state_dict entries that are CONSTANT BY DESIGN in the reference
# module (never trained, not represented in the flax tree), so keeping
# the template's values is the correct export.  Keyed by model-name
# prefix; values are key suffixes.  The only current case: ReDimNet's
# stage-0 input-mix weight is a frozen all-ones (1,1,1,1) parameter
# (reference wespeaker/models/redimnet.py:660-663, requires_grad=False)
# whose softmax over a singleton axis is identically 1.
_TEMPLATE_CONSTANT_KEYS = {
    "ReDimNet": ("inputs_weights.0",),
}


def _template_constant(model: str, key: str) -> bool:
    for prefix, suffixes in _TEMPLATE_CONSTANT_KEYS.items():
        if model.startswith(prefix) and any(
            key.endswith(s) for s in suffixes
        ):
            return True
    return False


def _flatten(tree, prefix=()):
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten(v, prefix + (k,)))
    else:
        out[prefix] = np.asarray(tree)
    return out


def build_index_map(
    model: str, template_sd: Dict, **model_args
) -> Dict[Tuple[str, ...], Tuple[np.ndarray, ...]]:
    """Probe `convert_checkpoint(model, ...)` with globally-unique
    integer values and return, per flax leaf path, the (torch flat
    index) array telling where each flax element came from.

    template_sd: a state_dict of the reference torch module (shapes
    only are used — e.g. `ref_model.state_dict()`).
    Returns {flax_path: (flat torch_global_index per flax element,)}
    plus the bookkeeping needed by `to_torch_state_dict`.
    """
    keys = list(template_sd.keys())
    shapes = {}
    bases = {}
    base = 1  # 0 marks "not from the state_dict" (fresh-init leaves)
    for k in keys:
        v = template_sd[k]
        arr = np.asarray(
            v.detach().cpu().numpy() if hasattr(v, "detach") else v
        )
        shapes[k] = arr.shape
        bases[k] = base
        base += int(arr.size)

    def _probe_once(shift):
        # float64 holds integers exactly up to 2^53 — far beyond any
        # parameter count here
        probe = {}
        for k in keys:
            b, n = bases[k] + shift, int(np.prod(shapes[k], dtype=np.int64))
            probe[k] = np.arange(b, b + n, dtype=np.float64).reshape(
                shapes[k]
            )
        params, batch_stats = convert_checkpoint(model, probe, **model_args)
        return _flatten({"params": params, "batch_stats": batch_stats})

    # TWO probes with shifted bases: a leaf that is a pure relayout of
    # state_dict elements shifts by exactly `delta` between them, while
    # any converter-SYNTHESIZED constant (zeros, but also e.g. a ones
    # init a future family might emit) stays put — a single probe would
    # misread a nonzero constant as data from low torch indices
    delta = base
    flat_a = _probe_once(0)
    flat_b = _probe_once(delta)
    index_map = {}
    fresh = set()
    for path, leaf in flat_a.items():
        vals = np.asarray(leaf, np.float64).reshape(-1)
        vals_b = np.asarray(flat_b[path], np.float64).reshape(-1)
        if vals.size == 0:
            continue
        diff = vals_b - vals
        if (diff == 0).all():
            # constant leaf the converter synthesizes (e.g. a zero bias
            # the torch module doesn't have) — nothing to export
            fresh.add(path)
            continue
        ok = (
            (diff == delta)
            & (vals == np.round(vals))
            & (vals >= 1)
            & (vals < base)
        )
        if not ok.all():
            raise ValueError(
                f"{model}: leaf {'/'.join(path)} is not a pure relayout "
                "of torch parameters (forward converter does arithmetic); "
                "this family cannot be auto-inverted"
            )
        index_map[path] = vals.astype(np.int64)
    return {"index_map": index_map, "bases": bases, "shapes": shapes,
            "total": base, "fresh": fresh}


def to_torch_state_dict(
    model: str,
    variables: Dict,
    template_sd: Dict,
    strict: bool = True,
    **model_args,
) -> Dict[str, np.ndarray]:
    """Flax variables ({'params': ..., 'batch_stats': ...}) -> numpy
    state_dict loadable into the reference torch module
    (`ref.load_state_dict({k: torch.tensor(v) ...})`).

    Torch keys never consumed by the forward converter (e.g.
    num_batches_tracked counters) keep their template values.  With
    strict=True every flax leaf must be consumed and every torch
    parameter fully covered."""
    info = build_index_map(model, template_sd, **model_args)
    index_map, bases, shapes = (
        info["index_map"], info["bases"], info["shapes"],
    )

    flat = _flatten({
        "params": variables.get("params", variables),
        "batch_stats": variables.get("batch_stats", {}),
    })
    out_flat = np.full((info["total"],), np.nan, np.float64)
    used = set()
    for path, idx in index_map.items():
        if path not in flat:
            raise KeyError(
                f"flax tree is missing leaf {'/'.join(path)} expected for "
                f"{model}"
            )
        leaf = np.asarray(flat[path], np.float64).reshape(-1)
        if leaf.size != idx.size:
            raise ValueError(
                f"leaf {'/'.join(path)}: {leaf.size} elements, converter "
                f"map expects {idx.size}"
            )
        out_flat[idx] = leaf
        used.add(path)

    if strict:
        missing = [
            "/".join(p) for p in flat
            if p not in used
            and p not in info["fresh"]
            and np.asarray(flat[p]).size
        ]
        if missing:
            raise ValueError(
                f"{model}: flax leaves not consumed by the torch mapping "
                f"(would be dropped): {missing[:8]}"
            )

    sd = {}
    for k, base in bases.items():
        n = int(np.prod(shapes[k], dtype=np.int64)) if shapes[k] else 1
        if shapes[k] == ():
            n = 1
        vals = out_flat[base : base + n]
        covered = ~np.isnan(vals)
        if not covered.any():
            # untouched by the converter: keep the template value —
            # correct for integer counters (num_batches_tracked), but a
            # FLOAT parameter the forward mapping never consumes would
            # be exported as the template's random init, so strict mode
            # refuses it
            tv = template_sd[k]
            arr = np.asarray(
                tv.detach().cpu().numpy() if hasattr(tv, "detach") else tv
            )
            if (strict and np.issubdtype(arr.dtype, np.floating)
                    and not _template_constant(model, k)):
                raise ValueError(
                    f"{model}: float torch tensor {k!r} is never produced "
                    "by the flax mapping; exporting the template's values "
                    "would silently ship untrained weights (pass "
                    "strict=False only if this tensor is genuinely unused)"
                )
            sd[k] = arr
        elif covered.all():
            sd[k] = vals.astype(np.float32).reshape(shapes[k])
        else:
            # a PARTIALLY covered torch tensor means the forward
            # converter consumed only a slice of it — exporting the
            # template for the rest would silently mix random init with
            # trained weights; refuse loudly
            raise ValueError(
                f"{model}: torch tensor {k!r} is only "
                f"{int(covered.sum())}/{n} covered by the flax mapping; "
                "this family's converter slices it and cannot be "
                "round-tripped safely"
            )
    return sd
