"""Train state: params + AdamW(warmup-cosine) + grad clipping.

Reference operating point (Main.py:23-28, rotinas.py:660-665): AdamW
lr=5e-5 wd=1e-4, global-norm clip 1.0, warmup ×2 over epochs//10 then
cosine. Each training *stage* gets a fresh optimizer (rotinas.py:660) —
`create_train_state` is simply called again with the stage's epoch budget.

Beyond-reference options (both off by default):
  - ema_decay > 0 keeps an exponential moving average of the parameters
    (standard diffusion practice; evaluation prefers EMA weights);
  - grad_accum > 1 accumulates k micro-batch gradients per optimizer
    update (optax.MultiSteps), for large effective batches per chip.
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
    ema_params: Any = None
    ema_decay: float = struct.field(pytree_node=False, default=0.0)

    def apply_gradients(self, grads):
        updates, new_opt_state = self.tx.update(grads, self.opt_state, self.params)
        new_params = optax.apply_updates(self.params, updates)
        return self.replace(
            step=self.step + 1, params=new_params, opt_state=new_opt_state
        )

    def update_ema(self):
        """ema ← d·ema + (1−d)·params. No-op unless EMA is enabled.

        Called at the *end* of a train step (after any domain-gate blend),
        so the average tracks the parameters actually kept.
        """
        if self.ema_params is None:
            return self
        d = self.ema_decay
        new_ema = jax.tree_util.tree_map(
            lambda e, p: e * d + p.astype(e.dtype) * (1.0 - d),
            self.ema_params, self.params,
        )
        return self.replace(ema_params=new_ema)

    @property
    def eval_params(self):
        """Parameters to sample/evaluate with: EMA when kept, else live."""
        return self.params if self.ema_params is None else self.ema_params


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
    ema_decay: float = 0.0,
    grad_accum: int = 1,
) -> TrainState:
    schedule = warmup_cosine_schedule(
        lr, total_epochs, steps_per_epoch, multiplier, warm_epochs
    )
    tx = optax.chain(
        optax.clip_by_global_norm(grad_clip),
        optax.adamw(schedule, weight_decay=weight_decay),
    )
    if grad_accum > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=grad_accum)
    import jax.numpy as jnp

    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        opt_state=tx.init(params),
        tx=tx,
        apply_fn=apply_fn,
        ema_params=(jax.tree_util.tree_map(jnp.array, params)
                    if ema_decay > 0 else None),
        ema_decay=ema_decay,
    )
