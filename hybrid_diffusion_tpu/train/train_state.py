"""Train state: params + AdamW(warmup-cosine) + grad clipping.

Reference operating point (Main.py:23-28, rotinas.py:660-665): AdamW
lr=5e-5 wd=1e-4, global-norm clip 1.0, warmup ×2 over epochs//10 then
cosine. Each training *stage* gets a fresh optimizer (rotinas.py:660) —
`create_train_state` is simply called again with the stage's epoch budget.
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import optax
from flax import struct

from .schedule import warmup_cosine_schedule


class TrainState(struct.PyTreeNode):
    step: jax.Array
    params: Any
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)
    apply_fn: Callable = struct.field(pytree_node=False)

    def apply_gradients(self, grads):
        updates, new_opt_state = self.tx.update(grads, self.opt_state, self.params)
        new_params = optax.apply_updates(self.params, updates)
        return self.replace(
            step=self.step + 1, params=new_params, opt_state=new_opt_state
        )


def create_train_state(
    params: Any,
    apply_fn: Callable,
    *,
    lr: float = 5e-5,
    weight_decay: float = 1e-4,
    grad_clip: float = 1.0,
    total_epochs: int = 1000,
    steps_per_epoch: int = 100,
    multiplier: float = 2.0,
    warm_epochs: int | None = None,
) -> TrainState:
    schedule = warmup_cosine_schedule(
        lr, total_epochs, steps_per_epoch, multiplier, warm_epochs
    )
    tx = optax.chain(
        optax.clip_by_global_norm(grad_clip),
        optax.adamw(schedule, weight_decay=weight_decay),
    )
    import jax.numpy as jnp

    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        opt_state=tx.init(params),
        tx=tx,
        apply_fn=apply_fn,
    )
