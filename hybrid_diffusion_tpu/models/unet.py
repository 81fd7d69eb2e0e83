"""DynamicUNet — the hybrid two-domain conditional denoiser.

Architecture parity with the reference's DynamicUNet (diffusion/Model.py:
382-517), re-expressed in NHWC flax.linen:

  - head: Conv 6→ch (conditioning image ⊕ noisy image on channels)
  - down path: per ch_mult level, num_res_blocks ResBlocks (no attention)
    + a dual-kernel DownSample between levels; every output pushed to the
    skip stack (Model.py:409-423)
  - middle: 4 ResBlocks, all with 8-head spatial attention (Model.py:425-431)
    — even-indexed blocks specialize to the underwater domain, odd-indexed
    to atmospheric (the "dynamic routing" of Model.py:446-474)
  - up path: per level only num_res_blocks skips are popped (the reference
    omits the classic +1, Model.py:438-445), mismatched skip shapes are
    nearest-resized (Model.py:507-509), 4 skip tensors intentionally remain
    unused — replicated exactly since it defines the trained topology
  - tail: GroupNorm→Swish→Conv→3 with xavier(gain=1e-5) init (Model.py:
    396-407)

Domain routing is NOT done with requires_grad mutation (a no-op under jit
and under the reference's own torch.no_grad inference — SURVEY.md §2.9.11).
Instead `domain_gates_from_batch` computes per-middle-block gradient gates
from batch color statistics and the train step multiplies the corresponding
parameter gradients by those gates — the intended freeze semantics,
recompile-free because the gate is a traced value.
"""

from __future__ import annotations

from typing import Sequence, Union

import jax.numpy as jnp
from flax import linen as nn

from ..ops.resize import nearest_resize
from .blocks import DownSample, ResBlock, UpSample
from .embeddings import ImageConditionEmbedding, TimeEmbedding

xavier_uniform = nn.initializers.variance_scaling(1.0, "fan_avg", "uniform")
# torch xavier_uniform_(gain=g) scales the bound by g → variance by g².
tail_init = nn.initializers.variance_scaling(1e-10, "fan_avg", "uniform")

NUM_MIDDLE_BLOCKS = 4


def domain_gates_from_batch(cond_image: jnp.ndarray) -> jnp.ndarray:
    """Per-middle-block gradient gates from batch color statistics.

    The reference declares the batch "subaquatic" when the blue channel mean
    exceeds the red channel mean (Model.py:454-458), then freezes the
    odd-indexed middle blocks (and vice versa for atmospheric batches).

    cond_image: (B, H, W, 3) RGB, any range. Returns float32 (4,) of 0/1:
    gates[i] == 1 ⇒ middle block i receives gradients for this batch.
    """
    red = jnp.mean(cond_image[..., 0])
    blue = jnp.mean(cond_image[..., 2])
    is_underwater = (blue > red).astype(jnp.float32)
    even = jnp.asarray([1.0, 0.0, 1.0, 0.0])
    return is_underwater * even + (1.0 - is_underwater) * (1.0 - even)


class DynamicUNet(nn.Module):
    """6-channel-input conditional U-Net with domain-specialized middle blocks."""

    T: int = 1000
    ch: int = 128
    ch_mult: Sequence[int] = (1, 2, 2, 2)
    num_res_blocks: int = 2
    dropout: float = 0.15
    num_heads: int = 8
    dtype: jnp.dtype = jnp.float32
    # GroupNorm compute dtype. Statistics are always computed in fp32 by
    # flax; bf16 here only affects the normalize/scale arithmetic and
    # halves the HBM traffic of every norm in the hot path.
    norm_dtype: jnp.dtype = jnp.float32
    use_pallas_attention: bool = False
    # Rematerialize ResBlock activations in the backward pass
    # (jax.checkpoint): trades ~30% more FLOPs for O(depth) less HBM —
    # the lever for large per-chip batches at 256² (HBM is the scaling
    # bottleneck, not MXU).
    remat: bool = False
    # Bit-parity mode vs the torch reference: stride-2 convs use torch's
    # symmetric padding and the up-path transpose uses torch's exact
    # (2, 3) cropping instead of XLA SAME (a one-pixel phase shift — the
    # one documented divergence, PARITY.md C4). Golden tests only; the
    # shipped weights are SAME-trained.
    torch_pad: bool = False

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        t: jnp.ndarray,
        cond_image: jnp.ndarray | None = None,
        context_zero: Union[bool, jnp.ndarray] = True,
        *,
        train: bool = False,
    ) -> jnp.ndarray:
        """x: (B, H, W, 6) = concat([cond_image, y_t], -1); t: (B,) int32.

        context_zero: True ⇒ the conditional embedding is zeroed (the
        reference's effective default, Model.py:483-486); may be a per-
        example bool vector for batched classifier-free guidance.
        """
        tdim = self.ch * 4
        temb = TimeEmbedding(self.T, self.ch, tdim, dtype=self.dtype,
                             name="time_embedding")(t)

        if cond_image is None:
            cond_image = x[..., :3]
        cemb = ImageConditionEmbedding(self.ch, tdim, dtype=self.dtype,
                                       name="cond_embedding")(cond_image)
        mask = jnp.asarray(context_zero)
        mask = jnp.broadcast_to(mask, (x.shape[0],)).astype(cemb.dtype)
        cemb = cemb * (1.0 - mask)[:, None]

        kw = dict(tdim=tdim, dropout=self.dropout, dtype=self.dtype,
                  norm_dtype=self.norm_dtype)
        Block = (nn.remat(ResBlock, static_argnums=())
                 if self.remat else ResBlock)

        h = nn.Conv(self.ch, (3, 3), padding="SAME", dtype=self.dtype,
                    kernel_init=xavier_uniform, name="head")(x.astype(self.dtype))
        hs = [h]

        # Down path.
        now_ch = self.ch
        for i, mult in enumerate(self.ch_mult):
            out_ch = self.ch * mult
            for b in range(self.num_res_blocks):
                h = Block(out_ch=out_ch, attn=False, name=f"down_{i}_{b}",
                          deterministic=not train, **kw)(h, temb, cemb)
                hs.append(h)
            now_ch = out_ch
            if i != len(self.ch_mult) - 1:
                h = DownSample(dtype=self.dtype, torch_pad=self.torch_pad,
                               name=f"downsample_{i}")(h)
                hs.append(h)

        # Middle: 4 attention ResBlocks (domain-routed via gradient gates).
        for m in range(NUM_MIDDLE_BLOCKS):
            h = Block(out_ch=now_ch, attn=True, num_heads=self.num_heads,
                      use_pallas_attention=self.use_pallas_attention,
                      deterministic=not train,
                      name=f"middle_{m}", **kw)(h, temb, cemb)

        # Up path: pop only num_res_blocks skips per level (reference
        # topology); nearest-resize on spatial mismatch.
        for i, mult in reversed(list(enumerate(self.ch_mult))):
            out_ch = self.ch * mult
            for b in range(self.num_res_blocks):
                skip = hs.pop()
                skip = nearest_resize(skip, h.shape[1], h.shape[2])
                h = jnp.concatenate([h, skip], axis=-1)
                h = Block(out_ch=out_ch, attn=False, name=f"up_{i}_{b}",
                          deterministic=not train, **kw)(h, temb, cemb)
            if i != 0:
                h = UpSample(dtype=self.dtype, torch_pad=self.torch_pad,
                             name=f"upsample_{i}")(h)

        # len(hs) == num_res_blocks + len(ch_mult) - 1 - num_res_blocks... the
        # reference leaves 2·num_res_blocks unused entries at the first level
        # plus the head — intentional parity (Model.py:513-515).

        h = nn.GroupNorm(num_groups=32, epsilon=1e-5, dtype=self.norm_dtype,
                         name="tail_norm")(h)
        h = nn.silu(h).astype(self.dtype)
        out = nn.Conv(3, (3, 3), padding="SAME", dtype=jnp.float32,
                      kernel_init=tail_init, name="tail_conv")(h)
        return out
