"""Nearest-neighbour spatial resize for skip-connection shape repair.

The reference patches its up-path/skip shape mismatches with
F.interpolate(mode="nearest") (diffusion/Model.py:507-509). For the 2×
integer upscales that actually occur this reduces to a repeat, which XLA
lowers to a cheap broadcast-reshape instead of a gather.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def nearest_resize(x: jnp.ndarray, height: int, width: int) -> jnp.ndarray:
    """Resize NHWC `x` to (height, width) with nearest-neighbour sampling."""
    B, H, W, C = x.shape
    if H == height and W == width:
        return x
    if height % H == 0 and width % W == 0:
        # Integer upscale: repeat is exact nearest-neighbour and fuses well.
        x = jnp.repeat(x, height // H, axis=1)
        x = jnp.repeat(x, width // W, axis=2)
        return x
    return jax.image.resize(x, (B, height, width, C), method="nearest")
