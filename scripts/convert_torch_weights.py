#!/usr/bin/env python
"""Convert torch state_dicts to the .npz layout the JAX extractors load.

This environment has no network egress, so pretrained weights cannot be
fetched here — but a user with the reference's checkpoints (DINOv2
ViT-S/14 from torch.hub as used by Loss/loss.py:29-60, torchvision VGG16
as loss.py:193-204, torchvision inception_v3 as metrics/metrics.py:477)
runs this once and points HDT_DINO_WEIGHTS / HDT_VGG_WEIGHTS /
HDT_INCEPTION_WEIGHTS at the output.

Key layout: flat {"/".join(flax_path): array}, e.g.
    params/block_0/attn/query/kernel
consumed by hybrid_diffusion_tpu.losses.perceptual._load_npz_params.

Usage:
    python scripts/convert_torch_weights.py --model dino \
        --input dinov2_vits14.pth --output dino_vits14.npz
    python scripts/convert_torch_weights.py --model vgg16 ...
    python scripts/convert_torch_weights.py --model inception ...

The converters are pure-numpy on tensors (torch only to unpickle), so they
also accept a plain {name: np.ndarray} dict — which is how the round-trip
tests exercise them without real checkpoints.
"""

from __future__ import annotations

import argparse

import numpy as np


def _np(t) -> np.ndarray:
    if isinstance(t, np.ndarray):
        return t
    return t.detach().cpu().numpy()  # torch tensor


# ---------------------------------------------------------------- DINOv2

def convert_dino_vits14(sd: dict, depth: int = 12, dim: int = 384,
                        num_heads: int = 6) -> dict:
    """facebookresearch/dinov2 ViT-S/14 state_dict → ViTSmall npz dict."""
    hd = dim // num_heads
    out = {}
    p = "params/"

    out[p + "cls_token"] = _np(sd["cls_token"]).reshape(1, 1, dim)
    out[p + "pos_embed"] = _np(sd["pos_embed"])
    # patch embed: torch (D, 3, 14, 14) OIHW → flax HWIO
    out[p + "patch_embed/kernel"] = _np(
        sd["patch_embed.proj.weight"]).transpose(2, 3, 1, 0)
    out[p + "patch_embed/bias"] = _np(sd["patch_embed.proj.bias"])

    for i in range(depth):
        t = f"blocks.{i}."
        f = f"{p}block_{i}/"
        out[f + "norm1/scale"] = _np(sd[t + "norm1.weight"])
        out[f + "norm1/bias"] = _np(sd[t + "norm1.bias"])
        out[f + "norm2/scale"] = _np(sd[t + "norm2.weight"])
        out[f + "norm2/bias"] = _np(sd[t + "norm2.bias"])
        out[f + "gamma_1"] = _np(sd[t + "ls1.gamma"])
        out[f + "gamma_2"] = _np(sd[t + "ls2.gamma"])

        qkv_w = _np(sd[t + "attn.qkv.weight"])       # (3D, D)
        qkv_b = _np(sd[t + "attn.qkv.bias"])          # (3D,)
        for j, name in enumerate(("query", "key", "value")):
            w = qkv_w[j * dim:(j + 1) * dim]          # (D_out, D_in)
            # flax MHDPA kernel: (D_in, heads, head_dim)
            out[f + f"attn/{name}/kernel"] = (
                w.T.reshape(dim, num_heads, hd))
            out[f + f"attn/{name}/bias"] = (
                qkv_b[j * dim:(j + 1) * dim].reshape(num_heads, hd))
        proj_w = _np(sd[t + "attn.proj.weight"])      # (D, D): out = W @ x
        # flax out kernel: (heads, head_dim, D) with out = x · K
        out[f + "attn/out/kernel"] = proj_w.T.reshape(num_heads, hd, dim)
        out[f + "attn/out/bias"] = _np(sd[t + "attn.proj.bias"])

        out[f + "fc1/kernel"] = _np(sd[t + "mlp.fc1.weight"]).T
        out[f + "fc1/bias"] = _np(sd[t + "mlp.fc1.bias"])
        out[f + "fc2/kernel"] = _np(sd[t + "mlp.fc2.weight"]).T
        out[f + "fc2/bias"] = _np(sd[t + "mlp.fc2.bias"])

    out[p + "norm/scale"] = _np(sd["norm.weight"])
    out[p + "norm/bias"] = _np(sd["norm.bias"])
    return out


# ----------------------------------------------------------------- VGG16

# torchvision vgg16.features conv indices, in order (through conv4_3 —
# the deepest tap the reference uses, Loss/loss.py:193-204).
_VGG16_CONV_IDS = [0, 2, 5, 7, 10, 12, 14, 17, 19, 21]


def convert_vgg16(sd: dict) -> dict:
    """torchvision vgg16 state_dict → _VGG16Features npz dict."""
    out = {}
    for our_i, torch_i in enumerate(_VGG16_CONV_IDS):
        w = _np(sd[f"features.{torch_i}.weight"])     # OIHW
        b = _np(sd[f"features.{torch_i}.bias"])
        out[f"params/conv_{our_i}/kernel"] = w.transpose(2, 3, 1, 0)
        out[f"params/conv_{our_i}/bias"] = b
    return out


# ---------------------------------------------------- AlexNet / SqueezeNet

# torchvision alexnet.features conv indices, in order.
_ALEX_CONV_IDS = [0, 3, 6, 8, 10]


def convert_alexnet(sd: dict) -> dict:
    """torchvision alexnet state_dict → _AlexFeatures npz dict."""
    out = {}
    for our_i, torch_i in enumerate(_ALEX_CONV_IDS):
        w = _np(sd[f"features.{torch_i}.weight"])     # OIHW
        out[f"params/conv_{our_i}/kernel"] = w.transpose(2, 3, 1, 0)
        out[f"params/conv_{our_i}/bias"] = _np(sd[f"features.{torch_i}.bias"])
    return out


# torchvision squeezenet1_1.features Fire-module indices, in order.
_SQUEEZE_FIRE_IDS = [3, 4, 6, 7, 9, 10, 11, 12]


def convert_squeezenet(sd: dict) -> dict:
    """torchvision squeezenet1_1 state_dict → _SqueezeFeatures npz dict."""
    out = {
        "params/conv_0/kernel": _np(
            sd["features.0.weight"]).transpose(2, 3, 1, 0),
        "params/conv_0/bias": _np(sd["features.0.bias"]),
    }
    for our_i, t in enumerate(_SQUEEZE_FIRE_IDS):
        for name in ("squeeze", "expand1x1", "expand3x3"):
            w = _np(sd[f"features.{t}.{name}.weight"])
            out[f"params/fire_{our_i}/{name}/kernel"] = w.transpose(2, 3, 1, 0)
            out[f"params/fire_{our_i}/{name}/bias"] = _np(
                sd[f"features.{t}.{name}.bias"])
    return out


# ------------------------------------------------------------ InceptionV3

def convert_inception_v3(sd: dict) -> dict:
    """torchvision inception_v3 state_dict → InceptionV3Features npz dict.

    torchvision module names match the flax module names 1:1
    (Mixed_5b.branch1x1.conv.weight → params/Mixed_5b/branch1x1/conv/kernel);
    BatchNorm running stats land in the batch_stats collection.
    """
    out = {}
    for key, val in sd.items():
        if key.startswith(("fc.", "AuxLogits.")):
            continue  # classifier head removed (metrics.py:481 fc=Identity)
        v = _np(val)
        parts = key.split(".")
        leaf = parts[-1]
        path = "/".join(parts[:-1])
        if leaf == "weight" and path.endswith("conv"):
            out[f"params/{path}/kernel"] = v.transpose(2, 3, 1, 0)
        elif leaf == "weight" and path.endswith("bn"):
            out[f"params/{path}/scale"] = v
        elif leaf == "bias" and path.endswith("bn"):
            out[f"params/{path}/bias"] = v
        elif leaf == "running_mean":
            out[f"batch_stats/{path}/mean"] = v
        elif leaf == "running_var":
            out[f"batch_stats/{path}/var"] = v
        # num_batches_tracked → dropped
    return out


# ----------------------------------------------------------- DynamicUNet

def convert_dynamic_unet(sd: dict, ch: int, ch_mult, num_res_blocks: int,
                         num_middle_blocks: int = 4) -> dict:
    """Reference DynamicUNet state_dict (diffusion/Model.py:382-517) →
    this repo's models.DynamicUNet flat npz dict.

    Layout rules (all verified by the full-forward golden test,
    tests/test_models.py::test_full_unet_golden_vs_torch_reference):
      - Conv2d OIHW → HWIO via transpose(2, 3, 1, 0)
      - Linear (out, in) → Dense kernel (in, out) via .T
      - GroupNorm weight/bias → scale/bias
      - MultiheadAttention in_proj_weight (3C, C) → in_proj/kernel (C, 3C)
      - ConvTranspose2d weight (in, out, kh, kw) → spatially flipped HWIO
        (lax.conv_transpose correlates where torch convolves)
    """
    out = {}

    def conv(dst, src):
        out[f"params/{dst}/kernel"] = _np(
            sd[f"{src}.weight"]).transpose(2, 3, 1, 0)
        out[f"params/{dst}/bias"] = _np(sd[f"{src}.bias"])

    def dense(dst, src):
        out[f"params/{dst}/kernel"] = _np(sd[f"{src}.weight"]).T
        out[f"params/{dst}/bias"] = _np(sd[f"{src}.bias"])

    def norm(dst, src):
        out[f"params/{dst}/scale"] = _np(sd[f"{src}.weight"])
        out[f"params/{dst}/bias"] = _np(sd[f"{src}.bias"])

    def resblock(dst, src, in_ch, out_ch, attn):
        norm(f"{dst}/norm1", f"{src}.block1.0")
        conv(f"{dst}/conv1", f"{src}.block1.2")
        dense(f"{dst}/temb_proj", f"{src}.temb_proj.1")
        dense(f"{dst}/cemb_proj", f"{src}.cond_proj.1")
        norm(f"{dst}/norm2", f"{src}.block2.0")
        conv(f"{dst}/conv2", f"{src}.block2.3")
        if in_ch != out_ch:
            conv(f"{dst}/shortcut", f"{src}.shortcut")
        if attn:
            out[f"params/{dst}/attn/in_proj/kernel"] = _np(
                sd[f"{src}.attn.in_proj_weight"]).T
            out[f"params/{dst}/attn/in_proj/bias"] = _np(
                sd[f"{src}.attn.in_proj_bias"])
            out[f"params/{dst}/attn/out_proj/kernel"] = _np(
                sd[f"{src}.attn.out_proj.weight"]).T
            out[f"params/{dst}/attn/out_proj/bias"] = _np(
                sd[f"{src}.attn.out_proj.bias"])

    # Embeddings.
    out["params/time_embedding/table"] = _np(
        sd["time_embedding.timembedding.0.weight"])
    dense("time_embedding/dense1", "time_embedding.timembedding.1")
    dense("time_embedding/dense2", "time_embedding.timembedding.3")
    for i in (1, 2, 3):
        conv(f"cond_embedding/conv{i}", f"cond_embedding.conv{i}")
    dense("cond_embedding/dense1", "cond_embedding.linear1")
    dense("cond_embedding/dense2", "cond_embedding.linear2")

    conv("head", "head")

    # Down path: the torch ModuleList interleaves ResBlocks and DownSamples
    # in construction order (Model.py:409-423).
    k = 0
    now_ch = ch
    chs = [ch]
    for i, mult in enumerate(ch_mult):
        out_ch = ch * mult
        for b in range(num_res_blocks):
            resblock(f"down_{i}_{b}", f"downblocks.{k}", now_ch, out_ch,
                     attn=False)
            now_ch = out_ch
            chs.append(now_ch)
            k += 1
        if i != len(ch_mult) - 1:
            out[f"params/downsample_{i}/k3"] = _np(
                sd[f"downblocks.{k}.c1.weight"]).transpose(2, 3, 1, 0)
            out[f"params/downsample_{i}/b3"] = _np(
                sd[f"downblocks.{k}.c1.bias"])
            out[f"params/downsample_{i}/k5"] = _np(
                sd[f"downblocks.{k}.c2.weight"]).transpose(2, 3, 1, 0)
            out[f"params/downsample_{i}/b5"] = _np(
                sd[f"downblocks.{k}.c2.bias"])
            chs.append(now_ch)
            k += 1

    for m in range(num_middle_blocks):
        resblock(f"middle_{m}", f"middleblocks.{m}", now_ch, now_ch,
                 attn=True)

    # Up path (Model.py:434-445): ResBlock in_ch = popped skip + now_ch.
    k = 0
    for i, mult in reversed(list(enumerate(ch_mult))):
        out_ch = ch * mult
        for b in range(num_res_blocks):
            in_ch = chs.pop() + now_ch
            resblock(f"up_{i}_{b}", f"upblocks.{k}", in_ch, out_ch,
                     attn=False)
            now_ch = out_ch
            k += 1
        if i != 0:
            # ConvTranspose2d weight (in, out, kh, kw): flip spatially,
            # then (kh, kw, in, out).
            w = _np(sd[f"upblocks.{k}.t.weight"])
            out[f"params/upsample_{i}/kt"] = (
                w[:, :, ::-1, ::-1].transpose(2, 3, 0, 1).copy())
            out[f"params/upsample_{i}/bt"] = _np(sd[f"upblocks.{k}.t.bias"])
            conv(f"upsample_{i}/c", f"upblocks.{k}.c")
            k += 1

    norm("tail_norm", "tail.0")
    conv("tail_conv", "tail.2")
    return out


CONVERTERS = {
    "dino": convert_dino_vits14,
    "vgg16": convert_vgg16,
    "alex": convert_alexnet,
    "squeeze": convert_squeezenet,
    "inception": convert_inception_v3,
}


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--model", choices=sorted(CONVERTERS), required=True)
    ap.add_argument("--input", required=True, help=".pth/.pt state_dict")
    ap.add_argument("--output", required=True, help="output .npz path")
    args = ap.parse_args()

    import torch

    sd = torch.load(args.input, map_location="cpu", weights_only=True)
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    if "state_dict" in sd and isinstance(sd["state_dict"], dict):
        sd = sd["state_dict"]
    flat = CONVERTERS[args.model](sd)
    np.savez(args.output, **flat)
    print(f"wrote {len(flat)} arrays → {args.output}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
