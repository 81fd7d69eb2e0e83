"""Golden tests: flax ViTSmall vs a torch DINOv2-architecture reference.

The converter (scripts/convert_torch_weights.py::convert_dino_vits14) maps
a facebookresearch/dinov2 ViT-S/14 state_dict into the flax ViTSmall layout
(reference consumer: Loss/loss.py:29-60). Until now it had only
round-tripped synthetic dicts — a wrong weight layout would load
strict-clean but compute garbage. These tests share ONE set of random
weights between a minimal torch implementation of the DINOv2 block/trunk
(exact dinov2 semantics: pre-norm, LayerScale, eps=1e-6, exact GELU) and
ViTSmall via the converter's npz path, and assert forward agreement.

Block-level catches attention head-layout bugs cheaply; the full-trunk test
runs at the native 518² grid (37×37 patches + cls = 1370 positions) so no
pos-embed interpolation is involved on either side.
"""

from __future__ import annotations

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from hybrid_diffusion_tpu.losses.perceptual import (  # noqa: E402
    ViTBlock,
    ViTSmall,
    _load_npz_params,
)

import sys  # noqa: E402
import os  # noqa: E402

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))
from convert_torch_weights import convert_dino_vits14  # noqa: E402


class TorchDinoAttention(tnn.Module):
    """dinov2 Attention: fused qkv linear + proj (attn.qkv / attn.proj)."""

    def __init__(self, dim: int, num_heads: int):
        super().__init__()
        self.num_heads = num_heads
        self.qkv = tnn.Linear(dim, dim * 3)
        self.proj = tnn.Linear(dim, dim)

    def forward(self, x):
        B, N, D = x.shape
        h = self.num_heads
        hd = D // h
        qkv = self.qkv(x).reshape(B, N, 3, h, hd).permute(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]  # (B, h, N, hd)
        attn = (q @ k.transpose(-2, -1)) * (hd ** -0.5)
        attn = attn.softmax(dim=-1)
        out = (attn @ v).transpose(1, 2).reshape(B, N, D)
        return self.proj(out)


class TorchLayerScale(tnn.Module):
    def __init__(self, dim: int):
        super().__init__()
        self.gamma = tnn.Parameter(torch.ones(dim))

    def forward(self, x):
        return x * self.gamma


class TorchDinoBlock(tnn.Module):
    """dinov2 Block: x += ls1(attn(norm1(x))); x += ls2(mlp(norm2(x)))."""

    def __init__(self, dim: int = 384, num_heads: int = 6):
        super().__init__()
        self.norm1 = tnn.LayerNorm(dim, eps=1e-6)
        self.attn = TorchDinoAttention(dim, num_heads)
        self.ls1 = TorchLayerScale(dim)
        self.norm2 = tnn.LayerNorm(dim, eps=1e-6)
        self.mlp = tnn.Sequential()
        self.mlp.fc1 = tnn.Linear(dim, dim * 4)
        self.mlp.act = tnn.GELU()  # exact, like dinov2's default
        self.mlp.fc2 = tnn.Linear(dim * 4, dim)

    def forward(self, x):
        x = x + self.ls1(self.attn(self.norm1(x)))
        h = self.mlp.fc2(self.mlp.act(self.mlp.fc1(self.norm2(x))))
        return x + self.ls2(h) if hasattr(self, "ls2") else x + h


class TorchDinoTrunk(tnn.Module):
    """Minimal dinov2 VisionTransformer trunk with matching key names."""

    def __init__(self, dim: int = 384, depth: int = 12, num_heads: int = 6,
                 patch: int = 14, num_positions: int = 1370):
        super().__init__()
        self.patch_embed = tnn.Sequential()
        self.patch_embed.proj = tnn.Conv2d(3, dim, patch, stride=patch)
        self.cls_token = tnn.Parameter(torch.zeros(1, 1, dim))
        self.pos_embed = tnn.Parameter(torch.zeros(1, num_positions, dim))
        self.blocks = tnn.ModuleList(
            [TorchDinoBlock(dim, num_heads) for _ in range(depth)])
        for b in self.blocks:
            b.ls2 = TorchLayerScale(dim)
        self.norm = tnn.LayerNorm(dim, eps=1e-6)

    def forward(self, x):
        # x: (B, 3, H, W) with H, W = native grid (no pos interpolation)
        x = self.patch_embed.proj(x)              # (B, D, gh, gw)
        x = x.flatten(2).transpose(1, 2)          # (B, N, D) row-major
        cls = self.cls_token.expand(x.shape[0], -1, -1)
        x = torch.cat([cls, x], dim=1) + self.pos_embed
        feats = []
        for blk in self.blocks:
            x = blk(x)
            feats.append(x)
        feats.append(self.norm(x))
        return feats


def _randomize(module: tnn.Module, seed: int) -> None:
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for p in module.parameters():
            p.copy_(torch.randn(p.shape, generator=g) * 0.02)


def test_dino_block_golden():
    """One ViTBlock vs the torch dinov2 block, shared random weights via the
    converter's qkv/proj reshapes — catches head-layout mistakes."""
    dim, heads = 64, 4
    tblock = TorchDinoBlock(dim, heads)
    tblock.ls2 = TorchLayerScale(dim)
    _randomize(tblock, 0)

    # Route the torch weights through the real converter by wrapping them
    # in a one-block trunk state_dict.
    sd = {f"blocks.0.{k}": v for k, v in tblock.state_dict().items()}
    sd["cls_token"] = torch.zeros(1, 1, dim)
    sd["pos_embed"] = torch.zeros(1, 10, dim)
    sd["patch_embed.proj.weight"] = torch.zeros(dim, 3, 14, 14)
    sd["patch_embed.proj.bias"] = torch.zeros(dim)
    sd["norm.weight"] = torch.ones(dim)
    sd["norm.bias"] = torch.zeros(dim)
    flat = convert_dino_vits14(sd, depth=1, dim=dim, num_heads=heads)

    block = ViTBlock(dim=dim, num_heads=heads)
    x_np = np.random.RandomState(1).randn(2, 9, dim).astype(np.float32)
    params = block.init(jax.random.PRNGKey(0), jnp.asarray(x_np))
    block_flat = {k.replace("params/block_0/", "params/"): v
                  for k, v in flat.items() if "block_0" in k}

    import tempfile

    with tempfile.NamedTemporaryFile(suffix=".npz") as f:
        np.savez(f.name, **block_flat)
        loaded = _load_npz_params(f.name, params)

    ours = np.asarray(block.apply(loaded, jnp.asarray(x_np)))
    with torch.no_grad():
        theirs = tblock(torch.from_numpy(x_np)).numpy()
    np.testing.assert_allclose(ours, theirs, atol=1e-5, rtol=1e-5)


def test_dino_trunk_golden_full_forward():
    """Full ViTSmall vs the torch trunk at the native 518² grid (37×37
    patches + cls = 1370 positions — the stored pos table, no interpolation
    on either side). Exercises _load_npz_params end-to-end via the npz
    file path. Agreement ≤1e-4 on every tapped feature."""
    trunk = TorchDinoTrunk()
    _randomize(trunk, 7)

    flat = convert_dino_vits14(trunk.state_dict())

    import tempfile

    model = ViTSmall()
    x_img = np.random.RandomState(3).rand(1, 518, 518, 3).astype(np.float32)
    params = jax.jit(model.init)(jax.random.PRNGKey(0),
                                 jnp.zeros((1, 518, 518, 3)))
    with tempfile.NamedTemporaryFile(suffix=".npz") as f:
        np.savez(f.name, **flat)
        loaded = _load_npz_params(f.name, params)  # strict: all keys used

    ours = jax.jit(model.apply)(loaded, jnp.asarray(x_img))
    with torch.no_grad():
        theirs = trunk(torch.from_numpy(
            x_img.transpose(0, 3, 1, 2)))

    assert len(ours) == len(theirs) == 13  # 12 blocks + final norm
    for i, (a, b) in enumerate(zip(ours, theirs)):
        np.testing.assert_allclose(
            np.asarray(a), b.numpy(), atol=1e-4, rtol=1e-4,
            err_msg=f"feature {i} diverges")


def test_dino_loss_consumes_converted_weights(tmp_path):
    """DinoPerceptualLoss(weights_path=npz) loads the converted tensors
    (pretrained=True) and produces a finite, zero-at-identity loss through
    the 256→252 crop + pos-interpolation path."""
    from hybrid_diffusion_tpu.losses import DinoPerceptualLoss

    trunk = TorchDinoTrunk()
    _randomize(trunk, 11)
    path = str(tmp_path / "dino.npz")
    np.savez(path, **convert_dino_vits14(trunk.state_dict()))

    loss_fn = DinoPerceptualLoss(jax.random.PRNGKey(0), weights_path=path,
                                 image_size=70)
    assert loss_fn.pretrained
    img = jnp.asarray(np.random.RandomState(5).rand(1, 70, 70, 3) * 2 - 1,
                      jnp.float32)
    assert float(loss_fn(img, img)) == 0.0
    other = jnp.clip(img + 0.1, -1, 1)
    v = float(loss_fn(img, other))
    assert np.isfinite(v) and v > 0
