"""CFGUNet — label-conditioned U-Net for the classifier-free-guidance
CIFAR-10 subsystem.

Parity target: DiffusionFreeGuidence/ModelCondition.py:213-276 (UNet), with
the reference's unimportable-at-HEAD syntax error (`pa dding`, :289) simply
not reproduced. Structure:

  - head Conv 3→ch
  - down path: num_res_blocks ResBlocks per level — reference ResBlock
    defaults attn=True (ModelCondition.py:167), so EVERY down/up block
    carries spatial attention — plus DownSample between levels
  - middle: [ResBlock(attn=True), ResBlock(attn=False)]
  - up path: classic topology popping num_res_blocks+1 skips per level
    (ModelCondition.py:241) — all skips consumed, shapes always match
  - tail GroupNorm→Swish→Conv→3

Label 0 is the unconditional/null class (embedding padding_idx=0).
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
from flax import linen as nn

from .blocks import DownSample, ResBlock, UpSample
from .embeddings import LabelEmbedding, TimeEmbedding
from .unet import tail_init, xavier_uniform


class CFGUNet(nn.Module):
    T: int = 500
    num_labels: int = 10
    ch: int = 128
    ch_mult: Sequence[int] = (1, 2, 2, 2)
    num_res_blocks: int = 2
    dropout: float = 0.15
    num_heads: int = 8
    attn_everywhere: bool = True
    dtype: jnp.dtype = jnp.float32
    use_pallas_attention: bool = False

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        t: jnp.ndarray,
        labels: jnp.ndarray,
        *,
        train: bool = False,
    ) -> jnp.ndarray:
        """x: (B, H, W, 3) in [-1, 1]; t: (B,) int32; labels: (B,) int32
        where 0 means unconditional."""
        tdim = self.ch * 4
        temb = TimeEmbedding(self.T, self.ch, tdim, dtype=self.dtype,
                             name="time_embedding")(t)
        cemb = LabelEmbedding(self.num_labels, self.ch, tdim, dtype=self.dtype,
                              name="cond_embedding")(labels)

        kw = dict(tdim=tdim, dropout=self.dropout, dtype=self.dtype,
                  num_heads=self.num_heads,
                  use_pallas_attention=self.use_pallas_attention)
        blk_attn = self.attn_everywhere

        h = nn.Conv(self.ch, (3, 3), padding="SAME", dtype=self.dtype,
                    kernel_init=xavier_uniform,
                    name="head")(x.astype(self.dtype))
        hs = [h]

        for i, mult in enumerate(self.ch_mult):
            out_ch = self.ch * mult
            for b in range(self.num_res_blocks):
                h = ResBlock(out_ch=out_ch, attn=blk_attn,
                             name=f"down_{i}_{b}", **kw)(
                    h, temb, cemb, deterministic=not train)
                hs.append(h)
            if i != len(self.ch_mult) - 1:
                h = DownSample(dtype=self.dtype, name=f"downsample_{i}")(h)
                hs.append(h)
        now_ch = self.ch * self.ch_mult[-1]

        h = ResBlock(out_ch=now_ch, attn=True, name="middle_0", **kw)(
            h, temb, cemb, deterministic=not train)
        h = ResBlock(out_ch=now_ch, attn=False, name="middle_1", **kw)(
            h, temb, cemb, deterministic=not train)

        for i, mult in reversed(list(enumerate(self.ch_mult))):
            out_ch = self.ch * mult
            for b in range(self.num_res_blocks + 1):
                h = jnp.concatenate([h, hs.pop()], axis=-1)
                h = ResBlock(out_ch=out_ch, attn=blk_attn,
                             name=f"up_{i}_{b}", **kw)(
                    h, temb, cemb, deterministic=not train)
            if i != 0:
                h = UpSample(dtype=self.dtype, name=f"upsample_{i}")(h)
        assert not hs  # classic topology consumes every skip

        h = nn.GroupNorm(num_groups=32, epsilon=1e-5, dtype=jnp.float32,
                         name="tail_norm")(h)
        h = nn.silu(h)
        return nn.Conv(3, (3, 3), padding="SAME", dtype=jnp.float32,
                       kernel_init=tail_init, name="tail_conv")(h)
