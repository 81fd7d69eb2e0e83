"""Exactness tests for the FLOP-reducing resampling rewrites
(ops/fast_conv.py) against their lax reference formulations."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hybrid_diffusion_tpu.models.blocks import DownSample, UpSample
from hybrid_diffusion_tpu.ops.fast_conv import (
    conv_transpose_5x5_s2,
    fused_dual_downsample,
)


@pytest.mark.parametrize("shape,cout", [
    ((1, 6, 6, 1), 4),
    ((2, 8, 10, 3), 4),
    ((2, 16, 16, 8), 8),
])
def test_conv_transpose_pixel_shuffle_exact(shape, cout):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(*shape).astype(np.float32))
    k = jnp.asarray(rng.randn(5, 5, shape[-1], cout).astype(np.float32))
    ref = jax.lax.conv_transpose(
        x, k, strides=(2, 2), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    out = conv_transpose_5x5_s2(x, k)
    assert out.shape == (shape[0], shape[1] * 2, shape[2] * 2, cout)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-4)


def test_fused_dual_downsample_exact():
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(2, 16, 12, 5).astype(np.float32))
    k3 = jnp.asarray(rng.randn(3, 3, 5, 5).astype(np.float32))
    b3 = jnp.asarray(rng.randn(5).astype(np.float32))
    k5 = jnp.asarray(rng.randn(5, 5, 5, 5).astype(np.float32))
    b5 = jnp.asarray(rng.randn(5).astype(np.float32))
    dn = jax.lax.conv_dimension_numbers(x.shape, k3.shape,
                                        ("NHWC", "HWIO", "NHWC"))
    a = jax.lax.conv_general_dilated(x, k3, (2, 2), "SAME",
                                     dimension_numbers=dn) + b3
    dn5 = jax.lax.conv_dimension_numbers(x.shape, k5.shape,
                                         ("NHWC", "HWIO", "NHWC"))
    b = jax.lax.conv_general_dilated(x, k5, (2, 2), "SAME",
                                     dimension_numbers=dn5) + b5
    fused = fused_dual_downsample(x, k3, b3, k5, b5)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(a + b),
                               rtol=1e-5, atol=1e-4)


@pytest.mark.parametrize("mod_cls", [DownSample, UpSample])
def test_module_fast_matches_reference_path(mod_cls):
    """The fast=True module output equals the reference formulation with
    the SAME parameters (so fast/slow are checkpoint-interchangeable)."""
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(2, 16, 16, 8).astype(np.float32))
    params = mod_cls(fast=True).init(jax.random.PRNGKey(0), x)
    fast = mod_cls(fast=True).apply(params, x)
    slow = mod_cls(fast=False).apply(params, x)
    np.testing.assert_allclose(np.asarray(fast), np.asarray(slow),
                               rtol=1e-5, atol=1e-4)
