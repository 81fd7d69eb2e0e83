"""DPM-Solver++(2M): deterministic 2nd-order multistep sampling.

Beyond-reference capability (the reference ships DDPM + DDIM only,
diffusion/Diffusion.py:224-269): DPM-Solver++ integrates the probability-
flow ODE in log-SNR time with a 2nd-order linear-multistep data-prediction
update (Lu et al., 2022, "DPM-Solver++"), reaching DDIM-100-class sample
quality in ~15-25 NFEs — a 4-5× sampling-throughput lever at matched
quality on TPU, since cost is one U-Net call per step either way.

Update rule (data-prediction, deterministic):
    λ_t = log(α_t/σ_t),   α_t = sqrt(ᾱ_t),  σ_t = sqrt(1-ᾱ_t)
    h_i = λ_{t_i} − λ_{t_{i-1}}        (target minus source, > 0)
    D_i = (1 + 1/(2r_i))·x0_i − (1/(2r_i))·x0_{i-1},  r_i = h_{i-1}/h_i
          (first step: D_1 = x0_1 — one DDIM/Euler step)
    x_{t_i} = (σ_{t_i}/σ_{t_{i-1}})·x_{t_{i-1}} − α_{t_i}·(e^{−h_i}−1)·D_i
The terminal step targets ᾱ = 1 (σ = 0), where the update degenerates to
x = D — handled with an explicit last-step flag instead of ±inf λ.

Implemented as one `lax.scan` carrying (x, previous x0, previous h);
coefficients precomputed in float64 numpy like ddim_coefficients.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .process import ddim_time_grid
from .schedule import DiffusionSchedule

DenoiseFn = Callable[..., jnp.ndarray]


def dpm_solver_coefficients(
    schedule: DiffusionSchedule, steps: int
) -> dict[str, jnp.ndarray]:
    """Per-step scalars for the 2M scan over the uniform DDIM grid."""
    seq, seq_prev = ddim_time_grid(schedule.num_steps, steps)
    ab = np.asarray(schedule.alphas_bar, np.float64)
    a_cur = np.sqrt(ab[seq])                       # source α (model eval)
    s_cur = np.sqrt(1.0 - ab[seq])
    ab_next = np.where(seq_prev >= 0, ab[np.maximum(seq_prev, 0)], 1.0)
    a_next = np.sqrt(ab_next)
    s_next = np.sqrt(1.0 - ab_next)

    lam_cur = np.log(a_cur / s_cur)
    # λ at the target; terminal (σ=0) flagged, value unused there.
    with np.errstate(divide="ignore"):
        lam_next = np.where(s_next > 0, np.log(a_next / np.maximum(s_next, 1e-300)), 0.0)
    is_last = (seq_prev < 0).astype(np.float64)
    h = np.where(is_last > 0, 1.0, lam_next - lam_cur)   # placeholder at last
    sigma_ratio = np.where(s_cur > 0, s_next / s_cur, 0.0)
    phi = np.expm1(-h)                                   # e^{−h} − 1

    f32 = lambda x: jnp.asarray(x, jnp.float32)
    return {
        "t": jnp.asarray(seq, jnp.int32),
        "a_cur": f32(a_cur), "s_cur": f32(s_cur),
        "a_next": f32(a_next),
        "sigma_ratio": f32(sigma_ratio),
        "phi": f32(phi),
        "h": f32(h),
        "is_last": f32(is_last),
    }


def dpm_solver_pp_2m_sample(
    denoise_fn: DenoiseFn,
    schedule: DiffusionSchedule,
    cond_image: jnp.ndarray,
    rng: jax.Array,
    steps: int = 20,
    guidance_scale: float = 1.0,
    init_noise: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Deterministic DPM-Solver++(2M) sampling conditioned on cond_image.

    Same denoiser contract as ddim_sample (6-channel input, ε output);
    returns images in [-1, 1].
    """
    from .sampler import _guided_eps

    B = cond_image.shape[0]
    coeffs = dpm_solver_coefficients(schedule, steps)
    rng, noise_rng = jax.random.split(rng)
    x = (
        init_noise
        if init_noise is not None
        else jax.random.normal(noise_rng, cond_image.shape, jnp.float32)
    )

    def step(carry, c):
        x, x0_prev, h_prev, have_prev = carry
        t = jnp.full((B,), c["t"], jnp.int32)
        x6 = jnp.concatenate([cond_image, x], axis=-1)
        eps = _guided_eps(denoise_fn, x6, t, guidance_scale)
        x0 = (x - c["s_cur"] * eps) / c["a_cur"]

        r = h_prev / c["h"]
        d_2m = (1.0 + 1.0 / (2.0 * r)) * x0 - (1.0 / (2.0 * r)) * x0_prev
        d = jnp.where(have_prev > 0, d_2m, x0)

        x_new = c["sigma_ratio"] * x - c["a_next"] * c["phi"] * d
        x_new = jnp.where(c["is_last"] > 0, d, x_new)
        return (x_new, x0, c["h"], jnp.float32(1.0)), None

    init = (x, jnp.zeros_like(x), jnp.float32(1.0), jnp.float32(0.0))
    (x, _, _, _), _ = jax.lax.scan(step, init, coeffs)
    return jnp.clip(x, -1.0, 1.0)
