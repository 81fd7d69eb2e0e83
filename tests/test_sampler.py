"""Sampler tests with a dummy denoiser (the reference's DummyModel pattern,
diffusion/Diffusion.py:373-375)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hybrid_diffusion_tpu.diffusion import (
    linear_beta_schedule,
    ddpm_sample,
    ddim_sample,
)


def dummy_denoise(x6, t, context_zero=False):
    """Predicts ε as the noisy half of the input (shape-correct stand-in)."""
    return x6[..., 3:]


@pytest.fixture(scope="module")
def sched():
    return linear_beta_schedule(1e-4, 0.02, 50)


def test_ddpm_shapes_and_range(sched):
    cond = jnp.zeros((2, 16, 16, 3))
    out = ddpm_sample(dummy_denoise, sched, cond, jax.random.PRNGKey(0))
    assert out.shape == (2, 16, 16, 3)
    assert np.all(np.abs(np.asarray(out)) <= 1.0)


def test_ddim_shapes_and_determinism(sched):
    cond = jnp.zeros((2, 16, 16, 3))
    noise = jax.random.normal(jax.random.PRNGKey(1), cond.shape)
    a = ddim_sample(
        dummy_denoise, sched, cond, jax.random.PRNGKey(2), ddim_steps=10,
        init_noise=noise,
    )
    b = ddim_sample(
        dummy_denoise, sched, cond, jax.random.PRNGKey(3), ddim_steps=10,
        init_noise=noise,
    )
    # η=0 → deterministic given init noise, regardless of rng.
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_ddim_perfect_denoiser_recovers_x0(sched):
    """If ε_pred is the exact noise that generated y_t from x₀, DDIM converges
    to x₀ (a strong correctness check on the update equations)."""
    x0 = jnp.tanh(jax.random.normal(jax.random.PRNGKey(4), (1, 8, 8, 3)))
    init_noise = jax.random.normal(jax.random.PRNGKey(5), x0.shape)

    ab = sched.alphas_bar

    def oracle(x6, t, context_zero=False):
        y_t = x6[..., 3:]
        at = ab[t].reshape(-1, 1, 1, 1)
        # ε consistent with y_t = sqrt(at)·x0 + sqrt(1-at)·ε
        return (y_t - jnp.sqrt(at) * x0) / jnp.sqrt(1 - at)

    out = ddim_sample(
        oracle, sched, jnp.zeros_like(x0), jax.random.PRNGKey(6),
        ddim_steps=50, init_noise=init_noise,
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(x0), atol=1e-3)


def test_ddpm_perfect_denoiser_recovers_x0(sched):
    x0 = jnp.tanh(jax.random.normal(jax.random.PRNGKey(7), (1, 8, 8, 3))) * 0.8
    ab = sched.alphas_bar

    def oracle(x6, t, context_zero=False):
        y_t = x6[..., 3:]
        at = ab[t].reshape(-1, 1, 1, 1)
        return (y_t - jnp.sqrt(at) * x0) / jnp.sqrt(1 - at)

    out = ddpm_sample(oracle, sched, jnp.zeros_like(x0), jax.random.PRNGKey(8))
    np.testing.assert_allclose(np.asarray(out), np.asarray(x0), atol=0.05)


def test_cfg_batched_equivalence(sched):
    """Guided sampling with scale≠1 calls the model once on a 2B batch; with a
    context-independent denoiser it must equal the unguided result."""
    cond = jnp.zeros((2, 8, 8, 3))
    noise = jax.random.normal(jax.random.PRNGKey(9), cond.shape)
    a = ddim_sample(
        dummy_denoise, sched, cond, jax.random.PRNGKey(0), ddim_steps=10,
        guidance_scale=1.0, init_noise=noise,
    )
    b = ddim_sample(
        dummy_denoise, sched, cond, jax.random.PRNGKey(0), ddim_steps=10,
        guidance_scale=1.8, init_noise=noise,
    )
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_samplers_jit(sched):
    cond = jnp.zeros((1, 8, 8, 3))
    f = jax.jit(
        lambda c, r: ddim_sample(dummy_denoise, sched, c, r, ddim_steps=5)
    )
    out = f(cond, jax.random.PRNGKey(0))
    assert out.shape == cond.shape
