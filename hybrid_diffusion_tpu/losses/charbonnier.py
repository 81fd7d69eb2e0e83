"""Charbonnier (smooth L1-like) loss.

Reference: Loss/loss.py:286-300 wraps kornia's charbonnier_loss. Classic
form: mean over elements of sqrt(diff² + ε²) − ε (the −ε keeps the loss at
exactly 0 for identical inputs; kornia uses the x²/(x²+ε²)-free variant —
we use the standard robust-regression definition and test its properties).
"""

from __future__ import annotations

import jax.numpy as jnp


def charbonnier_loss(
    pred: jnp.ndarray, target: jnp.ndarray, eps: float = 1e-3
) -> jnp.ndarray:
    diff = pred - target
    return jnp.mean(jnp.sqrt(diff * diff + eps * eps) - eps)
