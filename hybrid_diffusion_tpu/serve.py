"""Serving: a warm, recompile-free enhancement endpoint.

The reference has no serving story (inference = rerunning the eval script,
rotinas.py:1086). For production TPU serving the rules are: compile once,
never change shapes, keep weights resident, overlap host I/O with device
compute. `Enhancer` encodes them:

  - the DDIM sampler is jitted for ONE padded batch shape (`max_batch`);
    short batches are padded, never recompiled;
  - weights load once (Orbax checkpoint or init) and stay on device;
  - arbitrary input sizes are resized host-side through the native C++
    batch resizer (data/native.py) and restored on output;
  - optional device mesh: batches shard over the data axis
    (parallel.make_sharded_sampler) for pod-slice serving.

Usage:
    enh = Enhancer(config, checkpoint_path="…/ckpt_1000_…")
    out = enh.enhance(images)           # list[HWC uint8] → list[HWC uint8]
    out = enh.enhance_paths(["a.png"])  # files → arrays
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .config import Config
from .data.native import BILINEAR, batch_resize
from .train.loop import build_model, init_params, make_sampler, setup_cache


class Enhancer:
    """Warm single-shape enhancement service over a trained checkpoint."""

    def __init__(
        self,
        config: Config,
        checkpoint_path: Optional[str] = None,
        max_batch: int = 8,
        mesh=None,
        warmup: bool = True,
    ):
        setup_cache(config)
        self.config = Config(**{**config.__dict__, "dropout": 0.0})
        if checkpoint_path:
            self.config.pretrained_path = checkpoint_path
        self.max_batch = max_batch
        self.size = self.config.img_size
        self._model = build_model(self.config)
        self._params = init_params(self.config, self._model)
        self._sample = make_sampler(self.config, self._model, self._params,
                                    mesh=mesh)
        self._rng = jax.random.PRNGKey(self.config.seed)
        if warmup:
            self._run(np.zeros((max_batch, self.size, self.size, 3),
                               np.uint8))

    def _run(self, batch_u8: np.ndarray) -> np.ndarray:
        """One padded fixed-shape device call. batch_u8: (≤max_batch,S,S,3)."""
        n = batch_u8.shape[0]
        if n < self.max_batch:
            pad = np.zeros((self.max_batch - n, self.size, self.size, 3),
                           np.uint8)
            batch_u8 = np.concatenate([batch_u8, pad])
        self._rng, sub = jax.random.split(self._rng)
        out01 = np.asarray(self._sample(jnp.asarray(batch_u8), sub))
        return np.clip(out01[:n] * 255.0, 0, 255).astype(np.uint8)

    def enhance(self, images: Sequence[np.ndarray]) -> list[np.ndarray]:
        """Enhance HWC uint8 images of any sizes; outputs match inputs'
        original sizes (model runs at config.img_size)."""
        if not len(images):
            return []
        sizes = [im.shape[:2] for im in images]
        batch = batch_resize(list(images), (self.size, self.size), BILINEAR)
        outs: list[np.ndarray] = []
        for lo in range(0, len(images), self.max_batch):
            outs.extend(self._run(batch[lo : lo + self.max_batch]))
        return [
            batch_resize([o], (h, w), BILINEAR)[0] if (h, w) != o.shape[:2]
            else o
            for o, (h, w) in zip(outs, sizes)
        ]

    def enhance_paths(
        self,
        paths: Sequence[str],
        output_dir: Optional[str] = None,
    ) -> list[np.ndarray]:
        """Enhance image files; optionally write enhanced_<name> files."""
        from .data.registry import load_image

        outs = self.enhance([load_image(p) for p in paths])
        if output_dir:
            import cv2

            os.makedirs(output_dir, exist_ok=True)
            for p, o in zip(paths, outs):
                dst = os.path.join(output_dir,
                                   f"enhanced_{os.path.basename(p)}")
                cv2.imwrite(dst, cv2.cvtColor(o, cv2.COLOR_RGB2BGR))
        return outs


def export_enhancer(
    enhancer: Enhancer,
    path: Optional[str] = None,
    platforms: Optional[Sequence[str]] = None,
):
    """Serialize the warm sampler to portable StableHLO (jax.export).

    The exported artifact captures the whole enhancement program — weights
    baked in as constants, DDIM scan, normalization — callable from any
    JAX process (or a C++ PJRT runtime) without this package or Python
    model code. `platforms` pins lowering targets (e.g. ("tpu", "cpu"));
    default is the current backend.

    Returns the serialized bytes; writes them to `path` when given.
    Reload with `load_exported(path)(batch_u8, key)`.
    """
    from jax import export as jax_export

    def fn(batch_u8, key):
        return enhancer._sample(batch_u8, key)

    args = (
        jnp.zeros((enhancer.max_batch, enhancer.size, enhancer.size, 3),
                  jnp.uint8),
        jax.random.PRNGKey(0),
    )
    kwargs = {"platforms": list(platforms)} if platforms else {}
    exported = jax_export.export(jax.jit(fn), **kwargs)(*args)
    data = exported.serialize()
    if path:
        with open(path, "wb") as f:
            f.write(data)
    return data


def load_exported(path_or_bytes):
    """Deserialize an export_enhancer artifact → callable (batch_u8, key)."""
    from jax import export as jax_export

    if isinstance(path_or_bytes, (str, os.PathLike)):
        with open(path_or_bytes, "rb") as f:
            path_or_bytes = f.read()
    exported = jax_export.deserialize(path_or_bytes)
    return exported.call
