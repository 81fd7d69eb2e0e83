"""U-Net building blocks in NHWC.

Reference parity targets (diffusion/Model.py):
  - ResBlock (:267-312): GN(32)→Swish→Conv3 | +temb | [+cemb] |
    GN→Swish→Dropout→Conv3 | +shortcut | optional spatial MHA that
    *replaces* h (not residual — the reference feeds h through
    nn.MultiheadAttention and keeps only the output).
  - DownSample (:170-178): parallel 3×3 and 5×5 stride-2 convs, summed.
  - UpSample (:181-191): ConvTranspose 5×5 stride-2 (exact 2× upsample)
    followed by a 3×3 conv.

TPU-first choices: NHWC layout (XLA:TPU's native conv layout), fused
scaled-dot-product attention over the flattened spatial axis with an
optional Pallas kernel for the 32×32-token bottleneck, bf16 compute with
fp32 GroupNorm statistics.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.attention import fused_spatial_attention
from ..ops.fast_conv import conv_transpose_5x5_s2, fused_dual_downsample
from .torch_init import torch_bias_init, torch_kernel_init, xavier_uniform


class SpatialSelfAttention(nn.Module):
    """Multi-head self-attention over flattened H·W tokens.

    Semantics match torch.nn.MultiheadAttention(embed_dim=C, num_heads=8)
    as the reference uses it (Model.py:306-311): joint qkv projection,
    scaled dot-product per head, output projection.
    """

    channels: int
    num_heads: int = 8
    dtype: jnp.dtype = jnp.float32
    use_pallas: bool = False
    # Optional override for the core (q, k, v) → out computation, e.g.
    # ops.make_ring_attention(mesh) for token-sharded sequence parallelism
    # when attending at high resolution (SURVEY.md §5.7).
    attention_fn: Any = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        B, H, W, C = x.shape
        assert C % self.num_heads == 0
        head_dim = C // self.num_heads
        tokens = x.reshape(B, H * W, C)
        qkv = nn.Dense(3 * C, dtype=self.dtype, name="in_proj",
                       kernel_init=xavier_uniform)(tokens)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def split_heads(t):
            return t.reshape(B, H * W, self.num_heads, head_dim)

        q, k, v = split_heads(q), split_heads(k), split_heads(v)
        if self.attention_fn is not None:
            out = self.attention_fn(q, k, v)
        else:
            out = fused_spatial_attention(q, k, v, use_pallas=self.use_pallas)
        out = out.reshape(B, H * W, C)
        out = nn.Dense(C, dtype=self.dtype, name="out_proj",
                       kernel_init=torch_kernel_init)(out)
        return out.reshape(B, H, W, C)


class ResBlock(nn.Module):
    """Residual block with FiLM-style time/condition embedding adds."""

    out_ch: int
    tdim: int
    dropout: float = 0.0
    attn: bool = False
    num_heads: int = 8
    dtype: jnp.dtype = jnp.float32
    norm_dtype: jnp.dtype = jnp.float32
    use_pallas_attention: bool = False
    # Module-level dropout switch: a static attribute (not a call kwarg)
    # so nn.remat-wrapped blocks don't trace it (jax.checkpoint would
    # otherwise see a traced bool inside nn.Dropout).
    deterministic: Optional[bool] = None

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        temb: jnp.ndarray,
        cemb: Optional[jnp.ndarray] = None,
        *,
        deterministic: Optional[bool] = None,
    ) -> jnp.ndarray:
        if deterministic is None:
            deterministic = (True if self.deterministic is None
                             else self.deterministic)
        in_ch = x.shape[-1]
        h = nn.GroupNorm(num_groups=32, epsilon=1e-5,
                         dtype=self.norm_dtype, name="norm1")(x)
        h = nn.silu(h).astype(self.dtype)
        h = nn.Conv(self.out_ch, (3, 3), padding="SAME", dtype=self.dtype,
                    kernel_init=torch_kernel_init,
                    bias_init=torch_bias_init(in_ch * 9), name="conv1")(h)

        t = nn.Dense(self.out_ch, dtype=self.dtype, name="temb_proj",
                     kernel_init=torch_kernel_init,
                     bias_init=torch_bias_init(self.tdim))(
            nn.silu(temb.astype(self.dtype))
        )
        h = h + t[:, None, None, :]
        if cemb is not None:
            c = nn.Dense(self.out_ch, dtype=self.dtype, name="cemb_proj",
                         kernel_init=torch_kernel_init,
                         bias_init=torch_bias_init(self.tdim))(
                nn.silu(cemb.astype(self.dtype))
            )
            h = h + c[:, None, None, :]

        h = nn.GroupNorm(num_groups=32, epsilon=1e-5,
                         dtype=self.norm_dtype, name="norm2")(h)
        h = nn.silu(h).astype(self.dtype)
        h = nn.Dropout(self.dropout, deterministic=deterministic)(h)
        h = nn.Conv(self.out_ch, (3, 3), padding="SAME", dtype=self.dtype,
                    kernel_init=torch_kernel_init,
                    bias_init=torch_bias_init(self.out_ch * 9),
                    name="conv2")(h)

        if in_ch != self.out_ch:
            x = nn.Conv(self.out_ch, (1, 1), dtype=self.dtype,
                        kernel_init=torch_kernel_init,
                        bias_init=torch_bias_init(in_ch),
                        name="shortcut")(x)
        h = h + x

        if self.attn:
            # The reference replaces h with the attention output
            # (Model.py:306-311) — no residual around the attention.
            h = SpatialSelfAttention(
                channels=self.out_ch,
                num_heads=self.num_heads,
                dtype=self.dtype,
                use_pallas=self.use_pallas_attention,
                name="attn",
            )(h)
        return h


class DownSample(nn.Module):
    """Sum of parallel 3×3 and 5×5 stride-2 convolutions.

    Executed as ONE fused 5×5 conv (the 3×3 kernel embedded center-aligned —
    exact identity, ops/fast_conv.py) so the MXU sees a single large op;
    `fast=False` keeps the two-conv reference formulation for A/B checks.
    """

    dtype: jnp.dtype = jnp.float32
    fast: bool = True
    # torch_pad: use torch's symmetric stride-2 padding (p=1 for the 3×3,
    # p=2 for the 5×5) instead of XLA SAME (lo=0/hi=1 and lo=1/hi=2) — the
    # two sample spatial positions one pixel apart. Bit-parity mode for
    # golden tests against the reference (Model.py:170-178); training
    # keeps SAME (the shipped flagship weights are SAME-trained).
    torch_pad: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        ch = x.shape[-1]
        k3 = self.param("k3", torch_kernel_init, (3, 3, ch, ch))
        b3 = self.param("b3", torch_bias_init(ch * 9), (ch,))
        k5 = self.param("k5", torch_kernel_init, (5, 5, ch, ch))
        b5 = self.param("b5", torch_bias_init(ch * 25), (ch,))
        if self.fast and not self.torch_pad:
            return fused_dual_downsample(x, k3, b3, k5, b5)
        pad3 = ((1, 1), (1, 1)) if self.torch_pad else "SAME"
        pad5 = ((2, 2), (2, 2)) if self.torch_pad else "SAME"
        dn3 = jax.lax.conv_dimension_numbers(x.shape, k3.shape,
                                             ("NHWC", "HWIO", "NHWC"))
        dn5 = jax.lax.conv_dimension_numbers(x.shape, k5.shape,
                                             ("NHWC", "HWIO", "NHWC"))
        a = jax.lax.conv_general_dilated(
            x, k3.astype(x.dtype), (2, 2), pad3, dimension_numbers=dn3)
        b = jax.lax.conv_general_dilated(
            x, k5.astype(x.dtype), (2, 2), pad5, dimension_numbers=dn5)
        return a + b + (b3 + b5).astype(x.dtype)


class UpSample(nn.Module):
    """ConvTranspose 5×5 stride-2 (exact 2×) followed by a 3×3 conv.

    The transposed conv runs as a 4-phase pixel-shuffle decomposition
    (exact identity, ops/fast_conv.py) — XLA's dilated-input lowering
    spends 75% of its MACs on inserted zeros; this spends none.
    """

    dtype: jnp.dtype = jnp.float32
    fast: bool = True
    # torch_pad: reproduce torch ConvTranspose2d(5, 2, 2, output_padding=1)
    # exactly — an lhs-dilated correlation with padding (2, 3) — instead of
    # lax.conv_transpose SAME, whose output is the same values shifted one
    # pixel. `kt` is interpreted as an HWIO correlation kernel either way
    # (torch weights convert via spatial flip — convert_torch_weights.py).
    torch_pad: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        ch = x.shape[-1]
        kt = self.param("kt", torch_kernel_init, (5, 5, ch, ch))
        bt = self.param("bt", torch_bias_init(ch * 25), (ch,))
        if self.torch_pad:
            dn = jax.lax.conv_dimension_numbers(
                x.shape, kt.shape, ("NHWC", "HWIO", "NHWC"))
            x = jax.lax.conv_general_dilated(
                x, kt.astype(x.dtype), (1, 1), ((2, 3), (2, 3)),
                lhs_dilation=(2, 2), dimension_numbers=dn,
            ) + bt.astype(x.dtype)
        elif self.fast:
            x = conv_transpose_5x5_s2(x, kt) + bt.astype(x.dtype)
        else:
            x = jax.lax.conv_transpose(
                x, kt.astype(x.dtype), strides=(2, 2), padding="SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            ).astype(x.dtype) + bt.astype(x.dtype)
        x = nn.Conv(ch, (3, 3), padding="SAME", dtype=self.dtype,
                    kernel_init=torch_kernel_init,
                    bias_init=torch_bias_init(ch * 9), name="c")(x)
        return x
