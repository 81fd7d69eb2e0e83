"""Pure diffusion-process math: q-sampling, x₀ reconstruction, posterior steps.

Every function is shape-polymorphic over trailing image dims and jit-safe.
`t` is always an int32 array of shape (B,); coefficient gathers broadcast to
the image shape with a trailing-singleton reshape (the reference's `extract`,
diffusion/Diffusion.py:16-23).

Fixed reference bugs (documented divergences, SURVEY.md §2.9.5-7):
  - x₀ reconstruction has no stray /255 (reference Diffusion.py:95-96).
  - DDIM time grid generalizes to any T (reference hardcodes 1000,
    Diffusion.py:246-248) and indexes ᾱ at t, not t+1 (avoids OOB).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from .schedule import DiffusionSchedule


def _gather(table: jnp.ndarray, t: jnp.ndarray, ndim: int) -> jnp.ndarray:
    """Gather per-timestep coefficients and reshape to (B, 1, ..., 1)."""
    out = jnp.take(table, t, axis=0)
    return out.reshape(t.shape[0], *([1] * (ndim - 1)))


def q_sample(
    schedule: DiffusionSchedule,
    x0: jnp.ndarray,
    t: jnp.ndarray,
    noise: jnp.ndarray,
) -> jnp.ndarray:
    """Forward diffusion: x_t = sqrt(ᾱ_t)·x₀ + sqrt(1-ᾱ_t)·ε  (Algorithm 1)."""
    a = _gather(schedule.sqrt_alphas_bar, t, x0.ndim)
    b = _gather(schedule.sqrt_one_minus_alphas_bar, t, x0.ndim)
    return a * x0 + b * noise


def predict_x0_from_eps(
    schedule: DiffusionSchedule,
    x_t: jnp.ndarray,
    t: jnp.ndarray,
    eps: jnp.ndarray,
) -> jnp.ndarray:
    """x₀ = (x_t − sqrt(1−ᾱ_t)·ε) / sqrt(ᾱ_t)."""
    a = _gather(schedule.sqrt_alphas_bar, t, x_t.ndim)
    b = _gather(schedule.sqrt_one_minus_alphas_bar, t, x_t.ndim)
    return (x_t - b * eps) / a


def ddpm_posterior_mean(
    schedule: DiffusionSchedule,
    x_t: jnp.ndarray,
    t: jnp.ndarray,
    eps: jnp.ndarray,
) -> jnp.ndarray:
    """µ_{t-1} = coeff1_t·x_t − coeff2_t·ε (reference Diffusion.py:202-207)."""
    c1 = _gather(schedule.coeff1, t, x_t.ndim)
    c2 = _gather(schedule.coeff2, t, x_t.ndim)
    return c1 * x_t - c2 * eps


def ddpm_sampling_variance(
    schedule: DiffusionSchedule, t: jnp.ndarray, ndim: int
) -> jnp.ndarray:
    """Sampling variance used by the ancestral loop (posterior var at t=0)."""
    return _gather(schedule.sampling_var, t, ndim)


def ddim_time_grid(T: int, ddim_steps: int) -> tuple[np.ndarray, np.ndarray]:
    """Uniform DDIM subsequence and its predecessor grid.

    Returns (seq, seq_prev) as int arrays of length `ddim_steps`, ordered from
    high t to low t (sampling order). seq_prev[k] = previous element of seq,
    with -1 marking the terminal step (ᾱ_{-1} := 1).

    Generalizes the reference's hardcoded `range(0, 1000, step)` grid
    (diffusion/Diffusion.py:246-249) to any T.
    """
    if not 1 <= ddim_steps <= T:
        raise ValueError(f"ddim_steps must be in [1, {T}], got {ddim_steps}")
    stride = T // ddim_steps
    seq = np.arange(0, ddim_steps) * stride
    seq_prev = np.concatenate([[-1], seq[:-1]])
    return seq[::-1].copy(), seq_prev[::-1].copy()


def ddim_coefficients(
    schedule: DiffusionSchedule, ddim_steps: int, eta: float = 0.0
) -> dict[str, jnp.ndarray]:
    """Precompute per-step DDIM update coefficients for a `lax.scan`.

    For each step k (sampling order, t_k from high to low):
        x₀ = (x_t − sqrt(1−ᾱ_t)·ε) / sqrt(ᾱ_t)
        c1 = η·sqrt((1 − ᾱ_t/ᾱ_prev)(1 − ᾱ_prev)/(1 − ᾱ_t))
        c2 = sqrt((1 − ᾱ_prev) − c1²)
        x_prev = sqrt(ᾱ_prev)·x₀ + c1·z + c2·ε

    ᾱ is indexed at t (the reference indexes at t+1, an off-by-one that reads
    OOB when ddim_steps ≥ T; diffusion/Diffusion.py:253-254).
    """
    T = schedule.num_steps
    seq, seq_prev = ddim_time_grid(T, ddim_steps)
    alphas_bar = np.asarray(schedule.alphas_bar, dtype=np.float64)
    at = alphas_bar[seq]
    at_prev = np.where(seq_prev >= 0, alphas_bar[np.maximum(seq_prev, 0)], 1.0)

    c1 = eta * np.sqrt((1.0 - at / at_prev) * (1.0 - at_prev) / (1.0 - at))
    c2 = np.sqrt(np.maximum((1.0 - at_prev) - c1**2, 0.0))

    f32 = lambda x: jnp.asarray(x, dtype=jnp.float32)
    return {
        "t": jnp.asarray(seq, dtype=jnp.int32),
        "sqrt_at": f32(np.sqrt(at)),
        "sqrt_one_minus_at": f32(np.sqrt(1.0 - at)),
        "sqrt_at_prev": f32(np.sqrt(at_prev)),
        "c1": f32(c1),
        "c2": f32(c2),
    }
