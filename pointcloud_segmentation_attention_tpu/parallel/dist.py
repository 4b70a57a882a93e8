"""Multi-host initialization.

The reference has no multi-host story at all (§2.8 of SURVEY.md); here a
single call wires ``jax.distributed`` so a pod slice presents one global
device list, and the data pipeline shards scenes per host
(``data/pipeline.py``).
"""
from __future__ import annotations

import os
from typing import Optional

import jax


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Initialize jax.distributed when running on a multi-host slice.

    No-ops when single-process (the common dev path) or when already
    initialized.  Env fallbacks: COORDINATOR_ADDRESS, NUM_PROCESSES, PROCESS_ID.
    """
    coordinator_address = coordinator_address or os.environ.get("COORDINATOR_ADDRESS")
    if coordinator_address is None:
        return  # single host
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes or int(os.environ.get("NUM_PROCESSES", "1")),
            process_id=process_id or int(os.environ.get("PROCESS_ID", "0")),
        )
    except RuntimeError:
        pass  # already initialized


def host_shard(items, process_index: Optional[int] = None, process_count: Optional[int] = None):
    """Deterministic round-robin shard of a list across hosts (scene sharding)."""
    pi = jax.process_index() if process_index is None else process_index
    pc = jax.process_count() if process_count is None else process_count
    return [x for i, x in enumerate(items) if i % pc == pi]
