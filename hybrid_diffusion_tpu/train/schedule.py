"""Learning-rate schedule: linear warmup ×multiplier → cosine annealing.

Reproduces the reference's GradualWarmupScheduler (Scheduler.py:3-31, used
at rotinas.py:660-665 with multiplier 2.0, warm_epoch = epochs // 10, and a
CosineAnnealingLR(T_max=epochs, eta_min=0) handoff):

    epoch e ≤ W:  lr = base · ((multiplier − 1) · e / W + 1)
    epoch e > W:  lr = base · multiplier · ½(1 + cos(π · (e − W) / T_max))

The schedule is a pure function of the *step* index (optax convention);
epochs are derived via steps_per_epoch so per-epoch values match the
reference's per-epoch stepping exactly.
"""

from __future__ import annotations

import jax.numpy as jnp


def warmup_cosine_schedule(
    base_lr: float,
    total_epochs: int,
    steps_per_epoch: int,
    multiplier: float = 2.0,
    warm_epochs: int | None = None,
):
    """Returns an optax-style schedule fn: step → lr."""
    if warm_epochs is None:
        warm_epochs = max(total_epochs // 10, 1)
    warm_epochs = max(warm_epochs, 1)

    def schedule(step):
        epoch = step // steps_per_epoch
        e = jnp.asarray(epoch, jnp.float32)
        warm = base_lr * ((multiplier - 1.0) * e / warm_epochs + 1.0)
        prog = jnp.clip((e - warm_epochs) / total_epochs, 0.0, 1.0)
        cos = base_lr * multiplier * 0.5 * (1.0 + jnp.cos(jnp.pi * prog))
        return jnp.where(e <= warm_epochs, warm, cos)

    return schedule
