"""Reverse-diffusion samplers as jittable `lax.scan` loops.

TPU-native rewrite of the reference's Python-loop samplers
(diffusion/Diffusion.py:224-269): one compiled denoise step scanned over a
static time grid — no host round-trips, no per-step dispatch. Classifier-free
guidance batches the conditional and unconditional branches into a single 2B
model call so the MXU sees one large matmul stream instead of two small ones.

Denoiser contract:
    denoise_fn(x6: (B, H, W, 6) f32, t: (B,) i32, context_zero: bool)
        -> eps (B, H, W, 3) f32
where x6 = concat([cond_image, y_t], axis=-1), both in [-1, 1].
(The reference concatenates [input_image, y_t] on the channel axis,
diffusion/Diffusion.py:67, 230, 255.)
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp

from .process import ddim_coefficients, ddpm_posterior_mean, ddpm_sampling_variance
from .schedule import DiffusionSchedule

DenoiseFn = Callable[..., jnp.ndarray]


def _guided_eps(
    denoise_fn: DenoiseFn,
    x6: jnp.ndarray,
    t: jnp.ndarray,
    guidance_scale: float,
) -> jnp.ndarray:
    """ε with classifier-free guidance (reference Diffusion.py:255-261).

    guidance_scale is a static Python float: at 1.0 a single call is traced
    using the denoiser's OWN context default; otherwise cond+uncond are
    stacked into one 2B batch.

    The w==1 call deliberately does not pass context_zero: the model must
    be sampled the way it was trained. The reference's w==1 call
    (`self.model(input, t)`, Diffusion.py:257) hits its forward's
    context_zero=True default — i.e. unconditional — and at reference HEAD
    even its "conditional" eps does (the CFG branch is a double no-op,
    SURVEY §2.9.4). Here `make_sampler` sets the denoiser default from
    config.use_conditioning, so unconditionally-trained weights sample
    unconditionally (no live random-init cemb at eval) and conditioned
    weights sample conditionally.
    """
    if guidance_scale == 1.0:
        return denoise_fn(x6, t)
    both = jnp.concatenate([x6, x6], axis=0)
    t_both = jnp.concatenate([t, t], axis=0)
    # One model call; the context_zero mask is per-example.
    eps_both = denoise_fn(
        both,
        t_both,
        context_zero=jnp.concatenate(
            [jnp.zeros(t.shape[0], bool), jnp.ones(t.shape[0], bool)]
        ),
    )
    eps_c, eps_u = jnp.split(eps_both, 2, axis=0)
    return eps_u + guidance_scale * (eps_c - eps_u)


def ddpm_sample(
    denoise_fn: DenoiseFn,
    schedule: DiffusionSchedule,
    cond_image: jnp.ndarray,
    rng: jax.Array,
    guidance_scale: float = 1.0,
    init_noise: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Full-T ancestral DDPM sampling (reference Diffusion.py:224-239).

    cond_image: (B, H, W, 3) in [-1, 1]. Returns images in [-1, 1].
    """
    T = schedule.num_steps
    B = cond_image.shape[0]
    rng, noise_rng = jax.random.split(rng)
    y_t = (
        init_noise
        if init_noise is not None
        else jax.random.normal(noise_rng, cond_image.shape, jnp.float32)
    )
    step_rngs = jax.random.split(rng, T)
    # Scan runs t = T-1 ... 0.
    ts = jnp.arange(T - 1, -1, -1, dtype=jnp.int32)

    def step(y_t, inputs):
        t_scalar, step_rng = inputs
        t = jnp.full((B,), t_scalar, dtype=jnp.int32)
        x6 = jnp.concatenate([cond_image, y_t], axis=-1)
        eps = _guided_eps(denoise_fn, x6, t, guidance_scale)
        mean = ddpm_posterior_mean(schedule, y_t, t, eps)
        var = ddpm_sampling_variance(schedule, t, y_t.ndim)
        z = jax.random.normal(step_rng, y_t.shape, jnp.float32)
        z = jnp.where(t_scalar > 0, z, jnp.zeros_like(z))
        return mean + jnp.sqrt(var) * z, None

    y_0, _ = jax.lax.scan(step, y_t, (ts, step_rngs))
    return jnp.clip(y_0, -1.0, 1.0)


def ddim_sample(
    denoise_fn: DenoiseFn,
    schedule: DiffusionSchedule,
    cond_image: jnp.ndarray,
    rng: jax.Array,
    ddim_steps: int = 100,
    eta: float = 0.0,
    guidance_scale: float = 1.0,
    init_noise: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """DDIM sampling over a T//ddim_steps-strided grid (Diffusion.py:241-269).

    η=0 (the reference's fixed choice, Diffusion.py:264) gives deterministic
    sampling given init_noise. Returns images in [-1, 1].
    """
    B = cond_image.shape[0]
    coeffs = ddim_coefficients(schedule, ddim_steps, eta)
    rng, noise_rng = jax.random.split(rng)
    y_t = (
        init_noise
        if init_noise is not None
        else jax.random.normal(noise_rng, cond_image.shape, jnp.float32)
    )
    step_rngs = jax.random.split(rng, ddim_steps)

    def step(y_t, inputs):
        c, step_rng = inputs
        t = jnp.full((B,), c["t"], dtype=jnp.int32)
        x6 = jnp.concatenate([cond_image, y_t], axis=-1)
        eps = _guided_eps(denoise_fn, x6, t, guidance_scale)
        x0_pred = (y_t - eps * c["sqrt_one_minus_at"]) / c["sqrt_at"]
        z = jax.random.normal(step_rng, y_t.shape, jnp.float32)
        y_prev = c["sqrt_at_prev"] * x0_pred + c["c1"] * z + c["c2"] * eps
        return y_prev, None

    y_0, _ = jax.lax.scan(step, y_t, (coeffs, step_rngs))
    return jnp.clip(y_0, -1.0, 1.0)
