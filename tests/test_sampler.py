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


# ---------- DPM-Solver++(2M) ----------

def test_dpm_solver_constant_x0_exact():
    """A denoiser whose eps corresponds to a constant x0* must be solved
    EXACTLY by the data-prediction multistep update (every x0_i = x0*)."""
    from hybrid_diffusion_tpu.diffusion import dpm_solver_pp_2m_sample

    schedule = linear_beta_schedule(1e-4, 0.02, 100)
    x0_star = jnp.asarray(
        np.random.RandomState(0).uniform(-0.9, 0.9, (2, 8, 8, 3)),
        jnp.float32)
    ab = schedule.alphas_bar

    def denoise(x6, t, context_zero=True):
        x = x6[..., 3:]
        a = jnp.sqrt(ab[t])[:, None, None, None]
        s = jnp.sqrt(1.0 - ab[t])[:, None, None, None]
        return (x - a * x0_star) / s

    out = dpm_solver_pp_2m_sample(denoise, schedule,
                                  jnp.zeros((2, 8, 8, 3)),
                                  jax.random.PRNGKey(0), steps=8)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x0_star),
                               atol=1e-4)


def test_dpm_solver_fewer_steps_tracks_ddim_many_steps():
    """2nd order: DPM++(2M) at 10 steps should approximate the ODE limit
    (DDIM at 100 steps) better than DDIM at 10 steps, for a nontrivial
    linear denoiser."""
    from hybrid_diffusion_tpu.diffusion import dpm_solver_pp_2m_sample

    schedule = linear_beta_schedule(1e-4, 0.02, 100)

    def denoise(x6, t, context_zero=True):
        x = x6[..., 3:]
        return 0.7 * x + 0.1  # linear, time-independent eps model

    cond = jnp.zeros((1, 8, 8, 3))
    noise = jax.random.normal(jax.random.PRNGKey(3), (1, 8, 8, 3))
    ref = ddim_sample(denoise, schedule, cond, jax.random.PRNGKey(0),
                      ddim_steps=100, init_noise=noise)
    ddim10 = ddim_sample(denoise, schedule, cond, jax.random.PRNGKey(0),
                         ddim_steps=10, init_noise=noise)
    dpm10 = dpm_solver_pp_2m_sample(denoise, schedule, cond,
                                    jax.random.PRNGKey(0), steps=10,
                                    init_noise=noise)
    err_ddim = float(jnp.max(jnp.abs(ddim10 - ref)))
    err_dpm = float(jnp.max(jnp.abs(dpm10 - ref)))
    assert err_dpm < err_ddim, (err_dpm, err_ddim)


def test_dpm_solver_jits_and_shapes():
    from hybrid_diffusion_tpu.diffusion import dpm_solver_pp_2m_sample

    schedule = linear_beta_schedule(1e-4, 0.02, 50)
    dummy = lambda x6, t, context_zero=True: x6[..., 3:] * 0.1
    f = jax.jit(lambda c, r: dpm_solver_pp_2m_sample(
        dummy, schedule, c, r, steps=5))
    out = f(jnp.zeros((2, 8, 8, 3)), jax.random.PRNGKey(0))
    assert out.shape == (2, 8, 8, 3)
    assert float(jnp.max(jnp.abs(out))) <= 1.0
