"""Exact FLOP-reducing rewrites of the U-Net's resampling convolutions.

Two algebraic identities (validated numerically in tests/test_fast_conv.py):

1. `conv_transpose_5x5_s2` — the reference upsamples with
   ConvTranspose2d(5,5, stride 2) (diffusion/Model.py:181-191). XLA lowers a
   transposed conv to a convolution over the stride-dilated input, so 75%
   of the MACs multiply inserted zeros. The pixel-shuffle decomposition
   computes each of the 4 output phases with only its non-zero taps
   (3x3 / 3x2 / 2x3 / 2x2 sub-kernels) and interleaves — a ~4x FLOP
   reduction on the hottest single op in the sampler (the 128²→256²
   ch-256 upsample costs ~3.4 TFLOP per batch-16 as a dilated conv).

2. `fused_dual_downsample` — the reference downsamples with parallel
   3x3-stride-2 and 5x5-stride-2 convs summed (diffusion/Model.py:170-178).
   sum-of-convs == conv-of-summed-kernels once the 3x3 kernel is embedded
   in the center of the 5x5, so one MXU conv does the work of two
   (34 → 25 MACs per output element).

Both operate on NHWC with HWIO kernels (flax conventions).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def conv_transpose_5x5_s2(x: jnp.ndarray, kernel: jnp.ndarray) -> jnp.ndarray:
    """Equivalent of flax nn.ConvTranspose(C, (5,5), strides=(2,2), 'SAME')
    minus the bias: returns (B, 2H, 2W, Cout) from (B, H, W, Cin).

    Tap algebra (probed against lax.conv_transpose, see test):
        out[2m + a] = Σ_d x[m - d] · k[3 - a - 2d]
    with d ∈ {0,1} for phase a=0 and d ∈ {-1,0,1} for phase a=1. As a
    lax correlation (out[m] = Σ_u x[m - pad_lo + u] K[u], u = d_max - d):
        a=0: K = k[1::2]  (taps 1,3),   padding (1, 0)
        a=1: K = k[0::2]  (taps 0,2,4), padding (1, 1)
    applied independently per spatial axis; the 4 phase outputs interleave
    into the 2x-upsampled result.
    """
    B, H, W, Cin = x.shape
    Cout = kernel.shape[-1]
    dtype = x.dtype

    def sub(a_y: int, a_x: int) -> jnp.ndarray:
        k = kernel[(1 - a_y)::2][:, (1 - a_x)::2]
        pad_y = (1, a_y)  # a=0 → (1,0); a=1 → (1,1)
        pad_x = (1, a_x)
        dn = jax.lax.conv_dimension_numbers(
            x.shape, k.shape, ("NHWC", "HWIO", "NHWC"))
        return jax.lax.conv_general_dilated(
            x, k.astype(dtype), window_strides=(1, 1),
            padding=(pad_y, pad_x), dimension_numbers=dn)

    p00, p01 = sub(0, 0), sub(0, 1)
    p10, p11 = sub(1, 0), sub(1, 1)
    # out[:, 2m+ay, 2n+ax] = p{ay}{ax}[:, m, n]
    row0 = jnp.stack([p00, p01], axis=3)        # (B, H, W, 2x, C)
    row1 = jnp.stack([p10, p11], axis=3)
    out = jnp.stack([row0, row1], axis=3)       # (B, H, W, 2y, 2x, C)
    out = out.transpose(0, 1, 3, 2, 4, 5)       # (B, H, 2y, W, 2x, C)
    return out.reshape(B, 2 * H, 2 * W, Cout)


def fused_dual_downsample(
    x: jnp.ndarray,
    k3: jnp.ndarray,
    b3: jnp.ndarray,
    k5: jnp.ndarray,
    b5: jnp.ndarray,
) -> jnp.ndarray:
    """conv3x3(x, stride2, SAME) + conv5x5(x, stride2, SAME) as ONE conv.

    For even H, SAME stride-2 padding is (0,1) for k=3 and (1,2) for k=5,
    so the 3x3 kernel embedded at [1:4, 1:4] of the 5x5 sees exactly the
    same input windows. Kernels are HWIO; biases (Cout,).
    """
    k = (jnp.pad(k3, ((1, 1), (1, 1), (0, 0), (0, 0))) + k5).astype(x.dtype)
    dn = jax.lax.conv_dimension_numbers(x.shape, k.shape,
                                        ("NHWC", "HWIO", "NHWC"))
    y = jax.lax.conv_general_dilated(
        x, k, window_strides=(2, 2), padding=((1, 2), (1, 2)),
        dimension_numbers=dn)
    return y + (b3 + b5).astype(x.dtype)
