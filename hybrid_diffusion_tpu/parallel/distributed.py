"""Multi-host initialization (SURVEY.md §5.8).

The reference's launcher contract is torchrun-style env vars + NCCL
process groups (utils/rotinas.py:572-577). The TPU-native equivalent is
`jax.distributed.initialize()`: on TPU pods the coordinator/process
topology comes from the runtime metadata, so no LOCAL_RANK plumbing is
needed — call `maybe_initialize()` once at entry and GSPMD handles the
rest (per-host data loading is BatchLoader(shard_hosts=True), gradient
all-reduce is compiler-inserted over ICI/DCN).
"""

from __future__ import annotations

import os

import jax

_initialized = False


def maybe_initialize(force: bool = False) -> bool:
    """Initialize jax.distributed when running multi-host; idempotent.

    Triggers when HDT_MULTIHOST=1 or the standard JAX coordinator env
    (JAX_COORDINATOR_ADDRESS / COORDINATOR_ADDRESS) is present, or when
    `force`. Returns True if initialization ran (now or earlier).
    """
    global _initialized
    if _initialized:
        return True
    want = (
        force
        or os.environ.get("HDT_MULTIHOST") == "1"
        or "JAX_COORDINATOR_ADDRESS" in os.environ
        or "COORDINATOR_ADDRESS" in os.environ
    )
    if not want:
        return False
    jax.distributed.initialize()
    _initialized = True
    return True


def process_info() -> dict:
    """Host topology snapshot for logs/checkpoint gating."""
    return {
        "process_index": jax.process_index(),
        "process_count": jax.process_count(),
        "local_devices": len(jax.local_devices()),
        "global_devices": len(jax.devices()),
    }
