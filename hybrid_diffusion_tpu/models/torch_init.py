"""torch-default parameter initializers, for faithful reference parity.

The reference re-initializes ONLY the U-Net head and tail with xavier
(diffusion/Model.py:403-407); every other Conv2d/Linear keeps torch's
default `kaiming_uniform_(a=√5)`:

    weight ~ U(±1/√fan_in)            (variance 1/(3·fan_in))
    bias   ~ U(±1/√fan_in)

flax's defaults (lecun_normal kernels — 3× the variance — and zero
biases) are hotter; at the 256² ch=128 depth-4 operating point that
difference is enough to destabilize training (measured: loss collapse
~350 steps in with flax defaults; see PARITY.md "§2.9 stability note").
torch.nn.MultiheadAttention additionally xavier-uniforms its packed
in_proj and zeroes both proj biases, keeping the kaiming default for the
out_proj weight.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from flax import linen as nn

# kaiming_uniform(a=√5): gain² = 2/(1+5) = 1/3 → variance 1/(3·fan_in).
torch_kernel_init = nn.initializers.variance_scaling(
    1.0 / 3.0, "fan_in", "uniform")

# torch MHA in_proj: xavier_uniform over (E, 3E) ≡ flax fan_avg = 2E.
xavier_uniform = nn.initializers.variance_scaling(1.0, "fan_avg", "uniform")


def torch_bias_init(fan_in: int):
    """torch's Conv/Linear bias default: U(±1/√fan_in)."""
    bound = 1.0 / float(np.sqrt(fan_in))

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init
