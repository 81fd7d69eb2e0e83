"""Time / condition embedding modules.

Reference parity targets:
  - TimeEmbedding (diffusion/Model.py:22-44): a *trainable* embedding table
    initialized with interleaved sin/cos sinusoids, followed by
    Linear → Swish → Linear.
  - ConditionalEmbedding (diffusion/Model.py:110-167): a 3-conv stride-2
    encoder of the conditioning image (channels d_model//16 → ×2 → ×4, no
    inter-conv nonlinearities in the reference), global average pool, then
    Linear → Swish → Linear.
  - ConditionalEmbedding for labels (DiffusionFreeGuidence/ModelCondition.py:
    52-65): embedding table with padding_idx=0 (label 0 == unconditional),
    then Linear → Swish → Linear.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from flax import linen as nn

from .torch_init import torch_bias_init, torch_kernel_init


def sinusoidal_table(T: int, d_model: int) -> np.ndarray:
    """Interleaved sin/cos position table of shape (T, d_model).

    Matches the reference's construction (Model.py:26-33): frequencies
    exp(-log(10000)·(2i/d_model)), stacked as [sin, cos] on the last axis and
    flattened so columns interleave sin0, cos0, sin1, cos1, ...
    """
    assert d_model % 2 == 0
    freqs = np.exp(-np.arange(0, d_model, 2) / d_model * np.log(10000.0))
    args = np.arange(T, dtype=np.float64)[:, None] * freqs[None, :]
    table = np.stack([np.sin(args), np.cos(args)], axis=-1).reshape(T, d_model)
    return table.astype(np.float32)


class TimeEmbedding(nn.Module):
    """Trainable sinusoidal-init timestep embedding → MLP."""

    T: int
    d_model: int
    dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, t: jnp.ndarray) -> jnp.ndarray:
        table = self.param(
            "table",
            lambda _key, shape: jnp.asarray(sinusoidal_table(*shape)),
            (self.T, self.d_model),
        )
        emb = jnp.take(table, t, axis=0).astype(self.dtype)
        emb = nn.Dense(self.dim, dtype=self.dtype, name="dense1",
                       kernel_init=torch_kernel_init,
                       bias_init=torch_bias_init(self.d_model))(emb)
        emb = nn.silu(emb)
        emb = nn.Dense(self.dim, dtype=self.dtype, name="dense2",
                       kernel_init=torch_kernel_init,
                       bias_init=torch_bias_init(self.dim))(emb)
        return emb


class ImageConditionEmbedding(nn.Module):
    """Conv encoder of the conditioning image → pooled embedding vector.

    Channel widths follow the reference's d_model//16 scaling
    (Model.py:115-120); like the reference, there are no nonlinearities
    between the convolutions (only after the first Dense).
    """

    d_model: int
    dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, image: jnp.ndarray) -> jnp.ndarray:
        ch = self.d_model // 16
        x = image.astype(self.dtype)
        x = nn.Conv(ch, (3, 3), strides=2, padding="SAME", dtype=self.dtype,
                    kernel_init=torch_kernel_init,
                    bias_init=torch_bias_init(3 * 9), name="conv1")(x)
        x = nn.Conv(ch * 2, (3, 3), strides=2, padding="SAME", dtype=self.dtype,
                    kernel_init=torch_kernel_init,
                    bias_init=torch_bias_init(ch * 9), name="conv2")(x)
        x = nn.Conv(ch * 4, (3, 3), strides=2, padding="SAME", dtype=self.dtype,
                    kernel_init=torch_kernel_init,
                    bias_init=torch_bias_init(ch * 2 * 9), name="conv3")(x)
        x = jnp.mean(x, axis=(1, 2))  # global average pool (NHWC)
        x = nn.Dense(self.dim, dtype=self.dtype, name="dense1",
                     kernel_init=torch_kernel_init,
                     bias_init=torch_bias_init(ch * 4))(x)
        x = nn.silu(x)
        x = nn.Dense(self.dim, dtype=self.dtype, name="dense2",
                     kernel_init=torch_kernel_init,
                     bias_init=torch_bias_init(self.dim))(x)
        return x


class LabelEmbedding(nn.Module):
    """Integer-label embedding with index 0 reserved as the null/uncond slot
    (reference: ModelCondition.py:52-65, padding_idx=0)."""

    num_labels: int
    d_model: int
    dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, labels: jnp.ndarray) -> jnp.ndarray:
        table = self.param(
            "table",
            nn.initializers.normal(1.0),
            (self.num_labels + 1, self.d_model),
        )
        # padding_idx=0: the null-label row is pinned to zero.
        table = table.at[0].set(0.0)
        emb = jnp.take(table, labels, axis=0).astype(self.dtype)
        emb = nn.Dense(self.dim, dtype=self.dtype, name="dense1",
                       kernel_init=torch_kernel_init,
                       bias_init=torch_bias_init(self.d_model))(emb)
        emb = nn.silu(emb)
        emb = nn.Dense(self.dim, dtype=self.dtype, name="dense2",
                       kernel_init=torch_kernel_init,
                       bias_init=torch_bias_init(self.dim))(emb)
        return emb
