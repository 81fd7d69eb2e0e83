"""SSIM / MS-SSIM in pure JAX (NHWC).

Replaces the reference's kornia MS_SSIMLoss wrapper (Loss/loss.py:269-283).
Standard Wang et al. construction: 11×11 Gaussian window (σ=1.5), K1=0.01,
K2=0.03, five scales with weights [0.0448, 0.2856, 0.3001, 0.2363, 0.1333],
contrast-structure terms at coarse scales, luminance at the last.

The Gaussian filter is separable: two depthwise 1-D convs, which XLA:TPU
fuses far better than an 11×11 dense conv.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

MS_SSIM_WEIGHTS = (0.0448, 0.2856, 0.3001, 0.2363, 0.1333)


def _gaussian_kernel1d(size: int, sigma: float) -> np.ndarray:
    x = np.arange(size, dtype=np.float64) - (size - 1) / 2
    g = np.exp(-(x**2) / (2 * sigma**2))
    return (g / g.sum()).astype(np.float32)


def _gaussian_blur(x: jnp.ndarray, size: int, sigma: float) -> jnp.ndarray:
    """Depthwise separable Gaussian blur, 'valid' padding (NHWC)."""
    C = x.shape[-1]
    k = jnp.asarray(_gaussian_kernel1d(size, sigma))
    kh = jnp.tile(k.reshape(size, 1, 1, 1), (1, 1, 1, C))
    kw = jnp.tile(k.reshape(1, size, 1, 1), (1, 1, 1, C))
    dn = ("NHWC", "HWIO", "NHWC")
    x = jax.lax.conv_general_dilated(
        x, kh, (1, 1), "VALID", dimension_numbers=dn, feature_group_count=C
    )
    x = jax.lax.conv_general_dilated(
        x, kw, (1, 1), "VALID", dimension_numbers=dn, feature_group_count=C
    )
    return x


def _ssim_components(
    x: jnp.ndarray,
    y: jnp.ndarray,
    data_range: float,
    window_size: int,
    sigma: float,
    k1: float,
    k2: float,
):
    c1 = (k1 * data_range) ** 2
    c2 = (k2 * data_range) ** 2
    mu_x = _gaussian_blur(x, window_size, sigma)
    mu_y = _gaussian_blur(y, window_size, sigma)
    mu_xx, mu_yy, mu_xy = mu_x * mu_x, mu_y * mu_y, mu_x * mu_y
    sigma_x = _gaussian_blur(x * x, window_size, sigma) - mu_xx
    sigma_y = _gaussian_blur(y * y, window_size, sigma) - mu_yy
    sigma_xy = _gaussian_blur(x * y, window_size, sigma) - mu_xy
    cs = (2 * sigma_xy + c2) / (sigma_x + sigma_y + c2)
    lum = (2 * mu_xy + c1) / (mu_xx + mu_yy + c1)
    return lum * cs, cs


def ssim(
    x: jnp.ndarray,
    y: jnp.ndarray,
    data_range: float = 1.0,
    window_size: int = 11,
    sigma: float = 1.5,
    k1: float = 0.01,
    k2: float = 0.03,
) -> jnp.ndarray:
    """Mean single-scale SSIM over the batch. x, y: (B, H, W, C)."""
    s, _ = _ssim_components(x, y, data_range, window_size, sigma, k1, k2)
    return jnp.mean(s)


def _avg_pool2(x: jnp.ndarray) -> jnp.ndarray:
    return jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
    ) / 4.0


def ms_ssim(
    x: jnp.ndarray,
    y: jnp.ndarray,
    data_range: float = 1.0,
    window_size: int = 11,
    sigma: float = 1.5,
    weights=MS_SSIM_WEIGHTS,
) -> jnp.ndarray:
    """Multi-scale SSIM (scalar).

    The number of scales adapts to the image: scale k needs
    min(H, W) / 2^k ≥ window_size. At the 256² operating point all 5
    standard scales run; smaller images use a renormalized weight prefix
    (the pytorch-msssim convention) instead of producing NaN.
    """
    H, W = x.shape[1], x.shape[2]
    usable = 1
    while usable < len(weights) and min(H, W) // (2 ** usable) >= window_size:
        usable += 1
    if usable < len(weights):
        w = np.asarray(weights[:usable])
        weights = tuple(w / w.sum())
    levels = len(weights)
    vals = []
    for i in range(levels):
        s, cs = _ssim_components(x, y, data_range, window_size, sigma, 0.01, 0.03)
        if i == levels - 1:
            vals.append(jnp.mean(s))
        else:
            vals.append(jnp.mean(cs))
            x, y = _avg_pool2(x), _avg_pool2(y)
    vals = jnp.stack(vals)
    # Clamp to avoid NaN from tiny negatives under fractional powers.
    vals = jnp.maximum(vals, 1e-6)
    return jnp.prod(vals ** jnp.asarray(weights))


def ms_ssim_loss(
    pred: jnp.ndarray, target: jnp.ndarray, data_range: float = 1.0
) -> jnp.ndarray:
    """1 − MS-SSIM (the kornia MS_SSIMLoss convention the reference uses)."""
    return 1.0 - ms_ssim(pred, target, data_range=data_range)
