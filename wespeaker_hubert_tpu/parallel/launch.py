"""Multi-host launch helpers.

The reference scales out with torchrun c10d rendezvous per GPU process
(reference: examples/voxceleb/v2/run.sh:66-68, bin/train.py:49-54); the
TPU equivalent is ONE process per host: `jax.distributed.initialize()`
wires the hosts, `jax.devices()` then returns the global device list and
the same mesh/pjit code runs unchanged.  Input striping uses
(process_index, process_count) exactly like the reference's
DistributedSampler rank/world_size.
"""

from __future__ import annotations

import logging
from typing import Optional, Tuple

import jax

__all__ = ["initialize_distributed", "host_rank_world"]


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> Tuple[int, int]:
    """Initialize multi-host JAX (no-op single-host when no coordinator).

    On TPU pods the arguments auto-discover from the environment; pass
    them explicitly elsewhere.  Returns (rank, world_size) for input
    striping."""
    if coordinator_address or num_processes or jax.process_count() > 1:
        try:
            jax.distributed.initialize(
                coordinator_address=coordinator_address,
                num_processes=num_processes,
                process_id=process_id,
            )
        except RuntimeError as e:  # already initialized
            logging.getLogger("launch").info("distributed init: %s", e)
    rank = jax.process_index()
    world = jax.process_count()
    logging.getLogger("launch").info(
        "host %d/%d, %d local / %d global devices",
        rank, world, jax.local_device_count(), jax.device_count(),
    )
    return rank, world


def host_rank_world() -> Tuple[int, int]:
    return jax.process_index(), jax.process_count()
