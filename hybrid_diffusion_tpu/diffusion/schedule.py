"""Diffusion noise schedule as an immutable pytree of coefficient tables.

Rebuilds the buffer math of the reference's GaussianDiffusionTrainer/Sampler
(reference: diffusion/Diffusion.py:33-40, 189-200) as a stateless pytree so
every downstream op is a pure function compatible with `jax.jit`/`lax.scan`.

Divergences from the reference (intentional bug fixes, see SURVEY.md §2.9.7):
  - `sqrt_alphas_bar` actually holds sqrt(ᾱ) (the reference's sampler bound
    the un-rooted ᾱ to that name, Diffusion.py:193).
  - Tables are computed in float64 numpy then cast to float32 once, matching
    the reference's `.double()` buffer precision.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class DiffusionSchedule:
    """Coefficient tables for a T-step Gaussian diffusion.

    All fields are float32 arrays of shape (T,). Constructed via
    `linear_beta_schedule`; treated as a static pytree of constants inside
    jitted functions (XLA folds them into the compiled program).
    """

    betas: jax.Array
    alphas: jax.Array
    alphas_bar: jax.Array
    alphas_bar_prev: jax.Array          # ᾱ_{t-1}, with ᾱ_{-1} := 1
    sqrt_alphas_bar: jax.Array
    sqrt_one_minus_alphas_bar: jax.Array
    coeff1: jax.Array                   # 1/sqrt(α_t)
    coeff2: jax.Array                   # coeff1 * β_t / sqrt(1-ᾱ_t)
    posterior_var: jax.Array            # β_t (1-ᾱ_{t-1}) / (1-ᾱ_t)
    sampling_var: jax.Array             # cat([posterior_var[1:2], betas[1:]])

    @property
    def num_steps(self) -> int:
        return int(self.betas.shape[0])


def linear_beta_schedule(beta_1: float, beta_T: float, T: int) -> DiffusionSchedule:
    """Linear β schedule from β₁ to β_T over T steps.

    Matches torch.linspace(beta_1, beta_T, T) in float64 (reference:
    diffusion/Diffusion.py:34) and precomputes every derived table the
    trainer and both samplers need.
    """
    betas = np.linspace(beta_1, beta_T, T, dtype=np.float64)
    alphas = 1.0 - betas
    alphas_bar = np.cumprod(alphas)
    alphas_bar_prev = np.concatenate([[1.0], alphas_bar[:-1]])

    coeff1 = np.sqrt(1.0 / alphas)
    coeff2 = coeff1 * (1.0 - alphas) / np.sqrt(1.0 - alphas_bar)
    posterior_var = betas * (1.0 - alphas_bar_prev) / (1.0 - alphas_bar)
    # The ancestral sampler uses posterior variance at t=1 for step 0 and raw
    # β elsewhere (reference: diffusion/Diffusion.py:210).
    sampling_var = np.concatenate([posterior_var[1:2], betas[1:]])

    f32 = lambda x: jnp.asarray(x, dtype=jnp.float32)
    return DiffusionSchedule(
        betas=f32(betas),
        alphas=f32(alphas),
        alphas_bar=f32(alphas_bar),
        alphas_bar_prev=f32(alphas_bar_prev),
        sqrt_alphas_bar=f32(np.sqrt(alphas_bar)),
        sqrt_one_minus_alphas_bar=f32(np.sqrt(1.0 - alphas_bar)),
        coeff1=f32(coeff1),
        coeff2=f32(coeff2),
        posterior_var=f32(posterior_var),
        sampling_var=f32(sampling_var),
    )
