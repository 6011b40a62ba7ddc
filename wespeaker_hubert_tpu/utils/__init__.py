from .config import apply_overrides, dump_config, load_config, parse_config_or_kwargs
from .checkpoint import (
    average_checkpoints,
    latest_checkpoint,
    load_checkpoint,
    load_partial,
    save_checkpoint,
)

__all__ = [
    "apply_overrides",
    "dump_config",
    "load_config",
    "parse_config_or_kwargs",
    "average_checkpoints",
    "latest_checkpoint",
    "load_checkpoint",
    "load_partial",
    "save_checkpoint",
]
