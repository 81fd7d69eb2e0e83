"""Perceptual losses: DINOv2 ViT-S/14 and VGG16 feature matching in flax.

Reference parity targets (Loss/loss.py):
  - PerceptualLoss_dino (:15-154): DINOv2 ViT-S/14 via torch.hub, frozen;
    center-crop 256→252 for /14 patching (:61-82); smooth-L1 over hooked
    features summed. The reference hooks EVERY named module (:107-113) — an
    accident that double-counts nested modules; here features are the
    outputs of each of the 12 transformer blocks plus the final norm
    (a principled fixed list, divergence documented per SURVEY.md §7).
  - PerceptualLoss_vgg (:159-241): VGG-16 features, L1 at layer indices
    {3, 8, 15, 22} (the reference's post-ReLU taps of conv1_2, conv2_2,
    conv3_3, conv4_3).

Weights: this build environment has no network egress, so pretrained
weights load from a local file when provided (``weights_path`` pointing to
an .npz with matching parameter names, or a torch state_dict via
``load_torch_dino_weights``); otherwise the extractors run with a fixed
random init — random-feature perceptual distances are still a usable
training signal and keep the loss interface identical.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


def center_crop_to_multiple(x: jnp.ndarray, multiple: int = 14) -> jnp.ndarray:
    """Center-crop NHWC spatial dims down to the nearest multiple.

    256→252 at multiple=14, matching the reference's negative-pad crop
    (Loss/loss.py:61-82).
    """
    B, H, W, C = x.shape
    nh, nw = (H // multiple) * multiple, (W // multiple) * multiple
    top, left = (H - nh) // 2, (W - nw) // 2
    return x[:, top : top + nh, left : left + nw, :]


class ViTBlock(nn.Module):
    """Pre-norm transformer block with LayerScale (DINOv2 ls1/ls2.gamma).

    gamma params init to 1 (identity) for the random-feature mode; the
    converter (scripts/convert_torch_weights.py) overwrites them with the
    pretrained LayerScale values. GELU is exact (not tanh-approximate) to
    match torch.nn.GELU.
    """

    dim: int
    num_heads: int
    mlp_ratio: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        g1 = self.param("gamma_1", nn.initializers.ones, (self.dim,))
        g2 = self.param("gamma_2", nn.initializers.ones, (self.dim,))
        h = nn.LayerNorm(dtype=jnp.float32, name="norm1")(x)
        h = nn.MultiHeadDotProductAttention(
            num_heads=self.num_heads, dtype=self.dtype, name="attn"
        )(h, h)
        x = x + g1.astype(h.dtype) * h
        h = nn.LayerNorm(dtype=jnp.float32, name="norm2")(x)
        h = nn.Dense(self.dim * self.mlp_ratio, dtype=self.dtype, name="fc1")(h)
        h = nn.gelu(h, approximate=False)
        h = nn.Dense(self.dim, dtype=self.dtype, name="fc2")(h)
        return x + g2.astype(h.dtype) * h


class ViTSmall(nn.Module):
    """DINOv2-style ViT-S/14: patch 14, dim 384, 6 heads, 12 blocks."""

    patch_size: int = 14
    dim: int = 384
    depth: int = 12
    num_heads: int = 6
    num_positions: int = 1370  # 37×37 patches + cls (DINOv2 518² training res)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> list[jnp.ndarray]:
        """x: (B, H, W, 3) with H, W multiples of patch_size.
        Returns [block_0_out, ..., block_{depth-1}_out, final_norm_out],
        each (B, N+1, dim)."""
        B, H, W, _ = x.shape
        gh, gw = H // self.patch_size, W // self.patch_size
        x = nn.Conv(self.dim, (self.patch_size, self.patch_size),
                    strides=self.patch_size, dtype=self.dtype,
                    name="patch_embed")(x)
        x = x.reshape(B, gh * gw, self.dim)

        cls = self.param("cls_token", nn.initializers.zeros, (1, 1, self.dim))
        x = jnp.concatenate([jnp.tile(cls, (B, 1, 1)), x], axis=1)

        pos = self.param("pos_embed", nn.initializers.normal(0.02),
                         (1, self.num_positions, self.dim))
        x = x + _interpolate_pos_embed(pos, gh, gw)

        feats = []
        for i in range(self.depth):
            x = ViTBlock(self.dim, self.num_heads, dtype=self.dtype,
                         name=f"block_{i}")(x)
            feats.append(x)
        x = nn.LayerNorm(dtype=jnp.float32, name="norm")(x)
        feats.append(x)
        return feats


def _interpolate_pos_embed(pos: jnp.ndarray, gh: int, gw: int) -> jnp.ndarray:
    """Bicubic-resize the (1, N+1, D) position table to a gh×gw grid."""
    n_patches = pos.shape[1] - 1
    side = int(round(n_patches**0.5))
    cls_pos, grid_pos = pos[:, :1], pos[:, 1:]
    if side == gh and side == gw:
        return pos
    if side * side != n_patches:
        # A non-square stored table can only be used verbatim; resizing it
        # would need an unknown (h, w) factorization.
        if n_patches == gh * gw:
            return pos
        raise ValueError(
            f"pos_embed has {n_patches} patch positions (not a square grid) "
            f"and cannot be resized to {gh}x{gw}")
    grid = grid_pos.reshape(1, side, side, -1)
    grid = jax.image.resize(grid, (1, gh, gw, grid.shape[-1]), method="cubic")
    return jnp.concatenate([cls_pos, grid.reshape(1, gh * gw, -1)], axis=1)


class DinoPerceptualLoss:
    """Frozen DINO feature-matching loss (smooth-L1, summed over features).

    Usage:
        loss_fn = DinoPerceptualLoss(rng)           # random features
        loss_fn = DinoPerceptualLoss(rng, weights_path="dino.npz")
        value = loss_fn(pred, target)               # images in [-1, 1]
    """

    # DINOv2 normalization (ImageNet statistics) applied after mapping to [0,1].
    MEAN = np.array([0.485, 0.456, 0.406], np.float32)
    STD = np.array([0.229, 0.224, 0.225], np.float32)

    def __init__(
        self,
        rng: jax.Array | None = None,
        weights_path: Optional[str] = None,
        layers: Optional[Sequence[int]] = None,
        dtype: jnp.dtype = jnp.float32,
        image_size: int = 256,
    ):
        self.model = ViTSmall(dtype=dtype)
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        size = (image_size // 14) * 14
        dummy = jnp.zeros((1, size, size, 3))
        self.params = jax.jit(self.model.init)(rng, dummy)
        self.pretrained = False
        weights_path = weights_path or os.environ.get("HDT_DINO_WEIGHTS")
        if weights_path and os.path.exists(weights_path):
            self.params = _load_npz_params(weights_path, self.params)
            self.pretrained = True
        self.layers = list(layers) if layers is not None else None

    def features(self, images: jnp.ndarray) -> list[jnp.ndarray]:
        """images in [-1, 1], NHWC."""
        x = (images + 1.0) / 2.0
        x = (x - self.MEAN) / self.STD
        x = center_crop_to_multiple(x, 14)
        feats = self.model.apply(self.params, x)
        if self.layers is not None:
            feats = [feats[i] for i in self.layers]
        return feats

    def __call__(self, pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
        fp = self.features(pred)
        ft = self.features(jax.lax.stop_gradient(target))
        loss = 0.0
        for a, b in zip(fp, ft):
            b = jax.lax.stop_gradient(b)
            d = a - b
            # smooth-L1 (huber, beta=1), mean per feature, summed across
            # features (reference Loss/loss.py:148-154).
            loss = loss + jnp.mean(
                jnp.where(jnp.abs(d) < 1.0, 0.5 * d * d, jnp.abs(d) - 0.5)
            )
        return loss


# torchvision `features` stack configurations (numbers = conv out-channels,
# "M" = 2×2 max-pool) and the reference's default tap indices per variant
# (Loss/loss.py:193-204). Tap indices address the *torchvision features
# Sequential* (conv/BN/ReLU/pool each count one slot), reproduced exactly —
# including vgg11's accidental pre-ReLU/pool taps and its out-of-range 22.
VGG_CFGS: dict[str, list] = {
    "vgg11": [64, "M", 128, "M", 256, 256, "M", 512, 512, "M", 512, 512, "M"],
    "vgg13": [64, 64, "M", 128, 128, "M", 256, 256, "M", 512, 512, "M",
              512, 512, "M"],
    "vgg16": [64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
              512, 512, 512, "M", 512, 512, 512, "M"],
    "vgg19": [64, 64, "M", 128, 128, "M", 256, 256, 256, 256, "M",
              512, 512, 512, 512, "M", 512, 512, 512, 512, "M"],
}
VGG_DEFAULT_TAPS: dict[str, list[int]] = {
    "vgg11": [3, 8, 15, 22],
    "vgg13": [3, 8, 15, 22],
    "vgg16": [3, 8, 15, 22],
    "vgg19": [3, 8, 17, 26, 35],
    # Non-VGG members of the reference's selectable list
    # (Loss/loss.py:180-183, 193-204). Slots address the torchvision
    # features Sequential: a SqueezeNet Fire module is ONE slot; alex's
    # taps land on pre-ReLU conv outputs (reproduced exactly).
    "squeeze": [3, 7, 12],
    "alex": [3, 6, 8, 10, 12],
}


class _VGGFeatures(nn.Module):
    """A torchvision-`features`-ordered VGG stack emitting tapped layers.

    batch_norm inserts eval-mode BN (affine with frozen running stats, as
    the reference uses the extractor: .eval() + requires_grad=False,
    Loss/loss.py:189-192) between each conv and its ReLU.
    """

    cfg: tuple
    taps: tuple
    batch_norm: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> list[jnp.ndarray]:
        taps = set(self.taps)
        max_tap = max(taps) if taps else -1
        feats = []
        idx = 0  # torchvision features-Sequential slot counter

        def emit(y):
            if idx in taps:
                feats.append(y)

        conv_i = 0
        for v in self.cfg:
            if idx > max_tap:  # nothing left to tap — skip deeper stages
                break
            if v == "M":
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
                emit(x)
                idx += 1
            else:
                x = nn.Conv(v, (3, 3), padding="SAME", dtype=self.dtype,
                            name=f"conv_{conv_i}")(x)
                emit(x)
                idx += 1
                if self.batch_norm:
                    scale = self.param(f"bn_{conv_i}_scale",
                                       nn.initializers.ones, (v,))
                    bias = self.param(f"bn_{conv_i}_bias",
                                      nn.initializers.zeros, (v,))
                    mean = self.param(f"bn_{conv_i}_mean",
                                      nn.initializers.zeros, (v,))
                    var = self.param(f"bn_{conv_i}_var",
                                     nn.initializers.ones, (v,))
                    x = (x - mean) * jax.lax.rsqrt(var + 1e-5) * scale + bias
                    emit(x)
                    idx += 1
                x = nn.relu(x)
                emit(x)
                idx += 1
                conv_i += 1
        return feats


class _AlexFeatures(nn.Module):
    """torchvision alexnet.features with tapped slot outputs.

    Slots (Sequential indices): 0 Conv(64,11,s4,p2) 1 ReLU 2 MaxPool(3,2)
    3 Conv(192,5,p2) 4 ReLU 5 MaxPool 6 Conv(384,3,p1) 7 ReLU
    8 Conv(256,3,p1) 9 ReLU 10 Conv(256,3,p1) 11 ReLU 12 MaxPool.
    """

    taps: tuple
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> list[jnp.ndarray]:
        taps = set(self.taps)
        feats: list[jnp.ndarray] = []
        idx = 0

        def emit(y):
            nonlocal idx
            if idx in taps:
                feats.append(y)
            idx += 1

        convs = [(64, 11, 4, 2), (192, 5, 1, 2), (384, 3, 1, 1),
                 (256, 3, 1, 1), (256, 3, 1, 1)]
        pools_after = {0, 1, 4}  # maxpool follows convs 0, 1 and 4
        for ci, (ch, k, s, p) in enumerate(convs):
            x = nn.Conv(ch, (k, k), strides=s, padding=((p, p), (p, p)),
                        dtype=self.dtype, name=f"conv_{ci}")(x)
            emit(x)
            x = nn.relu(x)
            emit(x)
            if ci in pools_after:
                x = nn.max_pool(x, (3, 3), strides=(2, 2))
                emit(x)
        return feats


class _Fire(nn.Module):
    """SqueezeNet Fire: 1×1 squeeze+ReLU → (1×1, 3×3) expands+ReLU, concat."""

    squeeze_ch: int
    expand_ch: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        s = nn.relu(nn.Conv(self.squeeze_ch, (1, 1), dtype=self.dtype,
                            name="squeeze")(x))
        e1 = nn.Conv(self.expand_ch, (1, 1), dtype=self.dtype,
                     name="expand1x1")(s)
        e3 = nn.Conv(self.expand_ch, (3, 3), padding="SAME",
                     dtype=self.dtype, name="expand3x3")(s)
        return jnp.concatenate([nn.relu(e1), nn.relu(e3)], axis=-1)


def _max_pool_ceil(x: jnp.ndarray, k: int = 3, s: int = 2) -> jnp.ndarray:
    """MaxPool(k, s, ceil_mode=True) — torch's SqueezeNet pools; pads
    right/bottom with -inf so the last partial window is kept."""
    h, w = x.shape[1], x.shape[2]

    def pad_amount(n):
        out = -(-(n - k) // s) + 1  # ceil((n-k)/s) + 1
        return max((out - 1) * s + k - n, 0)

    ph, pw = pad_amount(h), pad_amount(w)
    if ph or pw:
        x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)),
                    constant_values=-jnp.inf)
    return nn.max_pool(x, (k, k), strides=(s, s))


class _SqueezeFeatures(nn.Module):
    """torchvision squeezenet1_1.features with tapped slot outputs.

    Slots: 0 Conv(64,3,s2) 1 ReLU 2 MaxPool(3,2,ceil) 3-4 Fire(16,64)
    5 MaxPool 6-7 Fire(32,128) 8 MaxPool 9-10 Fire(48,192)
    11-12 Fire(64,256). A Fire module is one slot (reference taps [3,7,12]
    are Fire outputs, Loss/loss.py:194).
    """

    taps: tuple
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> list[jnp.ndarray]:
        taps = set(self.taps)
        feats: list[jnp.ndarray] = []
        idx = 0

        def emit(y):
            nonlocal idx
            if idx in taps:
                feats.append(y)
            idx += 1

        x = nn.Conv(64, (3, 3), strides=2, padding="VALID",
                    dtype=self.dtype, name="conv_0")(x)
        emit(x)
        x = nn.relu(x)
        emit(x)
        x = _max_pool_ceil(x)
        emit(x)
        fire_cfg = [(16, 64), (16, 64), None, (32, 128), (32, 128), None,
                    (48, 192), (48, 192), (64, 256), (64, 256)]
        fi = 0
        for cfg in fire_cfg:
            if cfg is None:
                x = _max_pool_ceil(x)
                emit(x)
            else:
                x = _Fire(cfg[0], cfg[1], dtype=self.dtype,
                          name=f"fire_{fi}")(x)
                emit(x)
                fi += 1
        return feats


class VGGPerceptualLoss:
    """Frozen feature-matching loss (L1, summed over tap layers).

    model: one of vgg11/13/16/19 (+ '_bn' suffix), 'squeeze'
    (SqueezeNet 1.1) or 'alex' (AlexNet) — the reference's full selectable
    backbone list (Loss/loss.py:159-204).
    layer_indices overrides the default taps, like the reference ctor.
    """

    def __init__(
        self,
        rng: jax.Array | None = None,
        weights_path: Optional[str] = None,
        dtype: jnp.dtype = jnp.float32,
        model: str = "vgg16",
        layer_indices: Optional[Sequence[int]] = None,
    ):
        base = model[:-3] if model.endswith("_bn") else model
        valid = (sorted(VGG_CFGS) + [k + "_bn" for k in sorted(VGG_CFGS)]
                 + ["squeeze", "alex"])
        taps = tuple(layer_indices if layer_indices is not None
                     else VGG_DEFAULT_TAPS.get(base, ()))
        if base in VGG_CFGS:
            self.model = _VGGFeatures(cfg=tuple(VGG_CFGS[base]), taps=taps,
                                      batch_norm=model.endswith("_bn"),
                                      dtype=dtype)
        elif model == "alex":
            self.model = _AlexFeatures(taps=taps, dtype=dtype)
        elif model == "squeeze":
            self.model = _SqueezeFeatures(taps=taps, dtype=dtype)
        else:
            raise ValueError(
                f"Unsupported perceptual model {model!r}. Choose from "
                f"{valid}")
        self.name = f"VGGPerceptualLoss_{model}"
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        self.params = jax.jit(self.model.init)(rng, jnp.zeros((1, 64, 64, 3)))
        self.pretrained = False
        weights_path = weights_path or os.environ.get("HDT_VGG_WEIGHTS")
        if weights_path and os.path.exists(weights_path):
            self.params = _load_npz_params(weights_path, self.params)
            self.pretrained = True

    def __call__(self, pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
        fp = self.model.apply(self.params, (pred + 1.0) / 2.0)
        ft = self.model.apply(self.params, (target + 1.0) / 2.0)
        loss = 0.0
        for a, b in zip(fp, ft):
            loss = loss + jnp.mean(jnp.abs(a - jax.lax.stop_gradient(b)))
        return loss


def _load_npz_params(path: str, template, strict: bool = True):
    """Load a flat {'/'.join(path): array} npz into a flax param tree.

    strict: raise if the npz holds keys that match no template leaf or if
    a matched array's shape differs — silent partial loads produce random
    features that LOOK pretrained.
    """
    flat = dict(np.load(path))
    used = set()

    def pick(kp, leaf):
        key = "/".join(str(k.key) for k in kp)
        if key in flat:
            used.add(key)
            arr = flat[key]
            if strict and tuple(arr.shape) != tuple(leaf.shape):
                raise ValueError(
                    f"{path}: shape mismatch at {key}: "
                    f"npz {arr.shape} vs model {tuple(leaf.shape)}")
            return jnp.asarray(arr)
        return leaf

    out = jax.tree_util.tree_map_with_path(pick, template)
    unused = set(flat) - used
    if strict and unused:
        raise ValueError(
            f"{path}: {len(unused)} arrays match no model parameter, e.g. "
            f"{sorted(unused)[:5]}")
    return out
