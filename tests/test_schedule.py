"""Golden-value tests for the diffusion schedule and process math."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hybrid_diffusion_tpu.diffusion import (
    DiffusionSchedule,
    linear_beta_schedule,
    q_sample,
    predict_x0_from_eps,
    ddpm_posterior_mean,
    ddim_coefficients,
)
from hybrid_diffusion_tpu.diffusion.process import ddim_time_grid


@pytest.fixture(scope="module")
def sched():
    return linear_beta_schedule(1e-4, 0.02, 1000)


def test_beta_endpoints(sched):
    assert np.isclose(sched.betas[0], 1e-4)
    assert np.isclose(sched.betas[-1], 0.02)
    assert sched.num_steps == 1000


def test_alphas_bar_monotone_decreasing(sched):
    ab = np.asarray(sched.alphas_bar)
    assert np.all(np.diff(ab) < 0)
    assert 0 < ab[-1] < ab[0] < 1


def test_golden_values_small_T():
    """Hand-computed tables for T=4, β from 0.1 to 0.4."""
    s = linear_beta_schedule(0.1, 0.4, 4)
    betas = np.array([0.1, 0.2, 0.3, 0.4])
    alphas = 1 - betas
    ab = np.cumprod(alphas)  # [0.9, 0.72, 0.504, 0.3024]
    np.testing.assert_allclose(s.alphas_bar, ab, rtol=1e-6)
    np.testing.assert_allclose(s.sqrt_alphas_bar, np.sqrt(ab), rtol=1e-6)
    np.testing.assert_allclose(s.alphas_bar_prev, [1.0, 0.9, 0.72, 0.504], rtol=1e-6)
    np.testing.assert_allclose(s.coeff1, np.sqrt(1 / alphas), rtol=1e-6)
    np.testing.assert_allclose(
        s.coeff2, np.sqrt(1 / alphas) * betas / np.sqrt(1 - ab), rtol=1e-6
    )
    post = betas * (1 - np.array([1.0, 0.9, 0.72, 0.504])) / (1 - ab)
    np.testing.assert_allclose(s.posterior_var, post, rtol=1e-6)
    np.testing.assert_allclose(
        s.sampling_var, np.concatenate([post[1:2], betas[1:]]), rtol=1e-6
    )


def test_q_sample_broadcast(sched):
    rng = jax.random.PRNGKey(0)
    x0 = jax.random.normal(rng, (4, 8, 8, 3))
    noise = jax.random.normal(jax.random.PRNGKey(1), x0.shape)
    t = jnp.array([0, 10, 500, 999])
    xt = q_sample(sched, x0, t, noise)
    assert xt.shape == x0.shape
    # At t=0, ᾱ≈1-1e-4 → x_t ≈ x0 (noise term ≲ 0.01·|ε|).
    np.testing.assert_allclose(xt[0], x0[0], atol=0.06)
    # At t=999, ᾱ is tiny → x_t ≈ noise.
    np.testing.assert_allclose(xt[3], noise[3], atol=0.3)


def test_x0_roundtrip(sched):
    """predict_x0_from_eps inverts q_sample exactly."""
    rng = jax.random.PRNGKey(2)
    x0 = jax.random.normal(rng, (4, 8, 8, 3))
    noise = jax.random.normal(jax.random.PRNGKey(3), x0.shape)
    t = jnp.array([5, 100, 700, 999])
    xt = q_sample(sched, x0, t, noise)
    x0_rec = predict_x0_from_eps(sched, xt, t, noise)
    np.testing.assert_allclose(x0_rec, x0, atol=1e-3)


def test_ddpm_posterior_mean_matches_formula(sched):
    x = jnp.ones((2, 4, 4, 3))
    eps = jnp.full_like(x, 0.5)
    t = jnp.array([3, 800])
    out = ddpm_posterior_mean(sched, x, t, eps)
    c1 = np.asarray(sched.coeff1)[np.array([3, 800])]
    c2 = np.asarray(sched.coeff2)[np.array([3, 800])]
    expected = c1[:, None, None, None] * 1.0 - c2[:, None, None, None] * 0.5
    np.testing.assert_allclose(out, np.broadcast_to(expected, out.shape), rtol=1e-5)


def test_ddim_grid_reference_operating_point():
    """T=1000, 100 steps → the reference's range(0, 1000, 10) grid."""
    seq, seq_prev = ddim_time_grid(1000, 100)
    assert seq[0] == 990 and seq[-1] == 0
    assert seq_prev[0] == 980 and seq_prev[-1] == -1
    assert len(seq) == 100
    np.testing.assert_array_equal(np.diff(seq), -10 * np.ones(99))


def test_ddim_grid_general_T():
    seq, seq_prev = ddim_time_grid(500, 50)
    assert seq[0] == 490 and seq[-1] == 0
    # Full-step DDIM is valid too (the reference would read OOB here).
    seq, _ = ddim_time_grid(100, 100)
    assert seq[0] == 99


def test_ddim_coefficients_eta0(sched):
    c = ddim_coefficients(sched, 100, eta=0.0)
    np.testing.assert_array_equal(np.asarray(c["c1"]), 0.0)
    ab = np.asarray(sched.alphas_bar)
    # step 0: t=990, prev=980
    assert np.isclose(c["sqrt_at"][0], np.sqrt(ab[990]), rtol=1e-5)
    assert np.isclose(c["sqrt_at_prev"][0], np.sqrt(ab[980]), rtol=1e-5)
    # last step: prev = -1 → ᾱ_prev = 1
    assert np.isclose(c["sqrt_at_prev"][-1], 1.0)
    # c2 = sqrt(1-ᾱ_prev) when η=0
    np.testing.assert_allclose(
        np.asarray(c["c2"]) ** 2 + np.asarray(c["sqrt_at_prev"]) ** 2,
        1.0,
        atol=1e-5,
    )


def test_schedule_is_pytree(sched):
    leaves = jax.tree_util.tree_leaves(sched)
    assert len(leaves) == 10
    jitted = jax.jit(lambda s: s.betas.sum())
    jitted(sched)
