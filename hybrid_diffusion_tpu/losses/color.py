"""Angular color loss: 1 − norm-weighted mean cosine similarity over pixels.

Reference: Loss/loss.py:248-264 (`angular_color_loss`) — per-pixel cosine
similarity across the channel axis, averaged. Two recorded divergences:

1. The reference L2-normalizes both images before the cosine; since cosine
   similarity is scale-invariant that pre-normalization is a no-op, dropped.
2. The per-pixel *unweighted* mean has unbounded gradients at zero-norm
   pixels: with torch's cosine_similarity(eps=1e-8) semantics,
   ∂cos/∂pred ~ target/√(eps·…) ≈ 10⁴ per dark pixel, and enhancement
   targets are full of dark pixels. The reference never felt this because
   its aux-loss chain was inert at HEAD (SURVEY.md §2.9.5 range bug);
   training honestly with the term at the 256²/T=1000 flagship point
   spiked gradient norms 24→1200 within 2 epochs (round 4,
   docs/logs/flagship256_r4_aux.log). Fix: weight each pixel's cosine by
   the product of the two color-vector norms — w·cos telescopes to the
   plain dot product, so the loss is 1 − Σ⟨x,y⟩ / Σ|x||y| with gradients
   bounded by ~1/Σ|x||y| everywhere. A pixel with no color has no angle;
   weighting by magnitude is the principled treatment of that singularity
   (and keeps the value of the unweighted mean on bright images).
"""

from __future__ import annotations

import jax.numpy as jnp


def angular_color_loss(
    pred: jnp.ndarray, target: jnp.ndarray, eps: float = 1e-8
) -> jnp.ndarray:
    """pred, target: (..., C) NHWC images. Returns a scalar.

    Per image: Σ⟨pred,target⟩ / Σ(|pred|·|target|) over pixels — the
    norm-weighted mean of the per-pixel color-vector cosine (weights
    |pred|·|target|); the loss is 1 − batch-mean of that ratio. The
    per-image ratio keeps the loss decomposable over examples (so the
    train step's per-example ᾱ_t aux weighting composes exactly).
    Equals the plain mean-cosine on images without dark pixels; stays
    finite and smooth (gradients bounded) where either vector's norm → 0.
    """
    dot = jnp.sum(pred * target, axis=-1)
    nx = jnp.sum(pred * pred, axis=-1)
    ny = jnp.sum(target * target, axis=-1)
    w = jnp.sqrt((nx + eps) * (ny + eps))
    # Sum over the spatial axes (per image), mean over any leading dims.
    num = jnp.sum(dot, axis=(-2, -1))
    den = jnp.sum(w, axis=(-2, -1))
    return 1.0 - jnp.mean(num / den)
