"""YAML config + override parsing.

Equivalent of the reference's config system (reference:
wespeaker/utils/utils.py:37-51 parse_config_or_kwargs merges YAML with CLI
kwargs; the resolved config is re-dumped to exp_dir/config.yaml by
bin/train.py:209-213 and reloaded by extract/export/CLI).  Overrides use
dotted paths ("dataset_args.num_frms=200") and YAML-parsed values.
"""

from __future__ import annotations

import copy
from typing import Any, Dict, Iterable, Optional

import yaml

__all__ = ["load_config", "apply_overrides", "dump_config",
           "parse_config_or_kwargs", "coerce_value"]


def load_config(path: str) -> Dict[str, Any]:
    with open(path, "r", encoding="utf-8") as f:
        return yaml.safe_load(f) or {}


def dump_config(config: Dict[str, Any], path: str) -> None:
    with open(path, "w", encoding="utf-8") as f:
        yaml.safe_dump(config, f, sort_keys=False)


def coerce_value(raw: str) -> Any:
    """YAML-parse a CLI value string, coercing bare numerics ('1e-3')."""
    value = yaml.safe_load(raw)
    if isinstance(value, str):
        try:
            value = int(value)
        except ValueError:
            try:
                value = float(value)
            except ValueError:
                pass
    return value


def apply_overrides(
    config: Dict[str, Any], overrides: Iterable[str]
) -> Dict[str, Any]:
    """Apply 'a.b.c=value' overrides (values YAML-parsed)."""
    out = copy.deepcopy(config)
    for item in overrides:
        if "=" not in item:
            raise ValueError(f"override {item!r} must be key=value")
        key, raw = item.split("=", 1)
        # YAML 1.1 only floats '1.0e-3', not '1e-3'; coerce numerics
        value = coerce_value(raw)
        node = out
        parts = key.split(".")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = value
    return out


def parse_config_or_kwargs(
    config_file: str, overrides: Optional[Iterable[str]] = None, **kwargs
) -> Dict[str, Any]:
    """Load YAML then apply dotted overrides and keyword overrides
    (kwargs win, mirroring the reference's fire.Fire behavior)."""
    config = load_config(config_file)
    if overrides:
        config = apply_overrides(config, overrides)
    config.update(kwargs)
    return config
