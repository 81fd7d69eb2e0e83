"""Angular color loss: 1 − mean cosine similarity across the channel axis.

Reference: Loss/loss.py:248-264 (`angular_color_loss`) — L2-normalizes both
images over channels then takes cosine similarity; since cosine similarity
is scale-invariant the pre-normalization is a no-op, kept only in spirit.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def angular_color_loss(
    pred: jnp.ndarray, target: jnp.ndarray, eps: float = 1e-8
) -> jnp.ndarray:
    """pred, target: (..., C) NHWC images. Returns a scalar.

    cos(θ) per pixel between the C-dim color vectors; loss = 1 − mean cos.
    """
    dot = jnp.sum(pred * target, axis=-1)
    # rsqrt((|x|²+ε)(|y|²+ε)) instead of 1/max(|x||y|, ε): differentiable at
    # zero-norm pixels (norm's gradient at 0 is NaN and black pixels are
    # common in enhancement targets).
    nx = jnp.sum(pred * pred, axis=-1)
    ny = jnp.sum(target * target, axis=-1)
    cos = dot * jax.lax.rsqrt((nx + eps) * (ny + eps))
    return 1.0 - jnp.mean(cos)
