"""Golden tests: flax VGG16/AlexNet/SqueezeNet feature extractors vs
minimal torch implementations with torchvision-compatible state_dicts.

Same pattern as test_dino_golden: shared random weights flow through the
real converters (scripts/convert_torch_weights.py) into the flax
extractors; feature-map agreement proves both the weight layout and the
tap/padding/pool semantics (incl. SqueezeNet's ceil-mode pools and alex's
stride-4/pad-2 head). torchvision itself is not installed here, so the
torch side is hand-built with matching `features.N.*` key names.
"""

from __future__ import annotations

import os
import sys
import tempfile

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from hybrid_diffusion_tpu.losses.perceptual import (  # noqa: E402
    VGGPerceptualLoss,
    _load_npz_params,
)

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))
from convert_torch_weights import (  # noqa: E402
    convert_alexnet,
    convert_squeezenet,
    convert_vgg16,
)


def _torch_vgg16_features() -> tnn.Sequential:
    cfg = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
           512, 512, 512, "M", 512, 512, 512, "M"]
    layers, in_ch = [], 3
    for v in cfg:
        if v == "M":
            layers.append(tnn.MaxPool2d(2, 2))
        else:
            layers.append(tnn.Conv2d(in_ch, v, 3, padding=1))
            layers.append(tnn.ReLU(inplace=False))
            in_ch = v
    return tnn.Sequential(*layers)


class _TorchFire(tnn.Module):
    def __init__(self, in_ch, s, e):
        super().__init__()
        self.squeeze = tnn.Conv2d(in_ch, s, 1)
        self.squeeze_activation = tnn.ReLU()
        self.expand1x1 = tnn.Conv2d(s, e, 1)
        self.expand1x1_activation = tnn.ReLU()
        self.expand3x3 = tnn.Conv2d(s, e, 3, padding=1)
        self.expand3x3_activation = tnn.ReLU()

    def forward(self, x):
        x = self.squeeze_activation(self.squeeze(x))
        return torch.cat([
            self.expand1x1_activation(self.expand1x1(x)),
            self.expand3x3_activation(self.expand3x3(x)),
        ], dim=1)


def _torch_squeezenet_features() -> tnn.Sequential:
    return tnn.Sequential(
        tnn.Conv2d(3, 64, 3, stride=2),
        tnn.ReLU(),
        tnn.MaxPool2d(3, 2, ceil_mode=True),
        _TorchFire(64, 16, 64),
        _TorchFire(128, 16, 64),
        tnn.MaxPool2d(3, 2, ceil_mode=True),
        _TorchFire(128, 32, 128),
        _TorchFire(256, 32, 128),
        tnn.MaxPool2d(3, 2, ceil_mode=True),
        _TorchFire(256, 48, 192),
        _TorchFire(384, 48, 192),
        _TorchFire(384, 64, 256),
        _TorchFire(512, 64, 256),
    )


def _torch_alexnet_features() -> tnn.Sequential:
    return tnn.Sequential(
        tnn.Conv2d(3, 64, 11, stride=4, padding=2),
        tnn.ReLU(),
        tnn.MaxPool2d(3, 2),
        tnn.Conv2d(64, 192, 5, padding=2),
        tnn.ReLU(),
        tnn.MaxPool2d(3, 2),
        tnn.Conv2d(192, 384, 3, padding=1),
        tnn.ReLU(),
        tnn.Conv2d(384, 256, 3, padding=1),
        tnn.ReLU(),
        tnn.Conv2d(256, 256, 3, padding=1),
        tnn.ReLU(),
        tnn.MaxPool2d(3, 2),
    )


def _randomize(module: tnn.Module, seed: int) -> None:
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for p in module.parameters():
            p.copy_(torch.randn(p.shape, generator=g) * 0.05)


def _torch_taps(features: tnn.Sequential, x: torch.Tensor,
                taps: list[int]) -> list[np.ndarray]:
    """The reference's extract_features loop (Loss/loss.py:235-241)."""
    out = []
    with torch.no_grad():
        for i, layer in enumerate(features):
            x = layer(x)
            if i in taps:
                out.append(x.numpy().transpose(0, 2, 3, 1))  # NCHW→NHWC
    return out


def _golden_compare(model_name, torch_features, converter, taps, seed,
                    size=64, atol=1e-4):
    _randomize(torch_features, seed)
    sd = {f"features.{k}": v for k, v in torch_features.state_dict().items()}
    flat = converter(sd)

    loss = VGGPerceptualLoss(jax.random.PRNGKey(0), model=model_name)
    with tempfile.NamedTemporaryFile(suffix=".npz") as f:
        np.savez(f.name, **flat)
        loaded = _load_npz_params(f.name, loss.params)  # strict

    x = np.random.RandomState(seed + 1).rand(2, size, size, 3).astype(
        np.float32)
    ours = loss.model.apply(loaded, jnp.asarray(x))
    theirs = _torch_taps(torch_features,
                         torch.from_numpy(x.transpose(0, 3, 1, 2)), taps)
    assert len(ours) == len(theirs)
    for i, (a, b) in enumerate(zip(ours, theirs)):
        np.testing.assert_allclose(np.asarray(a), b, atol=atol, rtol=1e-4,
                                   err_msg=f"{model_name} tap {i}")


def test_vgg16_golden_vs_torch():
    _golden_compare("vgg16", _torch_vgg16_features(), convert_vgg16,
                    [3, 8, 15, 22], seed=0)


def test_alexnet_golden_vs_torch():
    _golden_compare("alex", _torch_alexnet_features(), convert_alexnet,
                    [3, 6, 8, 10, 12], seed=1)


def test_squeezenet_golden_vs_torch():
    """Also exercises the ceil-mode max-pool emulation on an odd spatial
    size (65 → every pool hits the partial-window path)."""
    _golden_compare("squeeze", _torch_squeezenet_features(),
                    convert_squeezenet, [3, 7, 12], seed=2, size=65)
