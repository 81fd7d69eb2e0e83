"""Device mesh construction.

The reference scales with DDP-over-NCCL (rotinas.py:572-627). The TPU-
native equivalent is GSPMD over a `jax.sharding.Mesh`: one 2-D logical
mesh with a "data" axis (batch parallelism — gradient all-reduce rides
ICI, inserted by XLA) and a "model" axis (tensor parallelism for the
attention bottleneck). A v5e-8 slice is mesh (8, 1) for pure DP or (4, 2)
for DP×TP; single chip is (1, 1) — same program, no code changes.
"""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh


def local_device_count() -> int:
    return len(jax.devices())


def make_mesh(
    data: int | None = None,
    model: int = 1,
    devices=None,
) -> Mesh:
    """Build a ("data", "model") mesh over `devices` (default: all)."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data is None:
        if n % model:
            raise ValueError(f"{n} devices not divisible by model={model}")
        data = n // model
    if data * model != n:
        raise ValueError(f"mesh {data}×{model} != {n} devices")
    arr = np.asarray(devices).reshape(data, model)
    return Mesh(arr, axis_names=("data", "model"))
