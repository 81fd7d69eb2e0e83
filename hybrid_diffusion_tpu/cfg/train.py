"""CFG CIFAR-10 training / evaluation drivers.

Rebuilds DiffusionFreeGuidence/TrainCondition.py (train :20-72, eval
:75-108) and the unconditional legacy trainer diffusion/Train.py:16-89
(both dead at the reference's HEAD — SURVEY.md §2.9.1-2) as pure-JAX
train steps + thin Python loops:

  - labels are shifted +1 (0 is the null/uncond slot) and dropped to 0
    with probability `p_uncond` = 10% (TrainCondition.py:56-58);
  - loss: the reference computes `mse(...,'none').sum() / b²`
    (TrainCondition.py:59) — for batch b and CIFAR shapes that equals
    mean-MSE × (3·32²/b), a batch-size-dependent scale. Here the loss is
    mean-MSE and the scale difference is absorbed into lr; `sum_div_b2=True`
    reproduces the reference scaling exactly for parity checks;
  - optimizer: AdamW + warmup-cosine (multiplier 2.5 — MainCondition.py);
  - `unconditional=True` trains with all labels pinned to the null slot —
    the fixed intent of diffusion/Train.py, whose UNet import is broken
    upstream;
  - eval: sample a label grid (nrow per class, MainCondition.py "nrow": 8)
    through the scan-based CFG sampler and write a PNG grid.
"""

from __future__ import annotations

import dataclasses
import functools
import os
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..diffusion.schedule import DiffusionSchedule, linear_beta_schedule
from ..models.cfg_unet import CFGUNet
from ..train.checkpoint import restore_params, save_checkpoint
from ..train.train_state import TrainState, create_train_state
from .data import make_labeled_dataset
from .sampler import cfg_ddpm_sample


@dataclasses.dataclass
class CFGConfig:
    """Reference operating point: MainCondition.py:5-29."""

    state: str = "train"
    epochs: int = 70
    batch_size: int = 80
    T: int = 500
    channel: int = 128
    channel_mult: tuple = (1, 2, 2, 2)
    num_res_blocks: int = 2
    dropout: float = 0.15
    lr: float = 1e-4
    multiplier: float = 2.5
    beta_1: float = 1e-4
    beta_T: float = 0.028
    img_size: int = 32
    grad_clip: float = 1.0
    w: float = 1.8
    p_uncond: float = 0.1
    num_labels: int = 10
    nrow: int = 8
    unconditional: bool = False          # diffusion/Train.py intent
    sum_div_b2: bool = False             # exact reference loss scaling
    save_dir: str = "./CheckpointsCondition/"
    sampled_dir: str = "./SampledImgs/"
    data_root: Optional[str] = None      # local CIFAR-10; None → synthetic
    synthetic_length: int = 256
    bf16: bool = True
    seed: int = 0
    save_every: int = 1                  # reference checkpoints every epoch


def normalize_cifar(x: jnp.ndarray) -> jnp.ndarray:
    """uint8 → [-1, 1] (the reference's Normalize(±0.5) on [0,1] tensors)."""
    return x.astype(jnp.float32) / 255.0 * 2.0 - 1.0


def cfg_train_step(
    state: TrainState,
    batch: dict,
    rng: jax.Array,
    schedule: DiffusionSchedule,
    p_uncond: float = 0.1,
    unconditional: bool = False,
    sum_div_b2: bool = False,
) -> tuple[TrainState, dict]:
    """One CFG diffusion training step.

    batch: {"image": (B,H,W,3) uint8, "label": (B,) int32 in [0, 10)}.
    """
    x0 = normalize_cifar(batch["image"])
    B = x0.shape[0]
    labels = batch["label"].astype(jnp.int32) + 1  # 0 reserved for null
    t_rng, noise_rng, drop_rng, dropout_rng = jax.random.split(rng, 4)
    if unconditional:
        labels = jnp.zeros_like(labels)
    else:
        drop = jax.random.bernoulli(drop_rng, p_uncond, (B,))
        labels = jnp.where(drop, 0, labels)

    t = jax.random.randint(t_rng, (B,), 0, schedule.num_steps)
    noise = jax.random.normal(noise_rng, x0.shape, jnp.float32)
    from ..diffusion.process import q_sample

    x_t = q_sample(schedule, x0, t, noise)

    def loss_fn(params):
        eps = state.apply_fn(params, x_t, t, labels, train=True,
                             rngs={"dropout": dropout_rng})
        sq = jnp.square(eps.astype(jnp.float32) - noise)
        if sum_div_b2:
            return jnp.sum(sq) / (B ** 2)
        return jnp.mean(sq)

    loss, grads = jax.value_and_grad(loss_fn)(state.params)
    new_state = state.apply_gradients(grads).update_ema()
    return new_state, {"loss": loss}


def make_cfg_train_step(
    schedule: DiffusionSchedule,
    p_uncond: float = 0.1,
    unconditional: bool = False,
    sum_div_b2: bool = False,
    jit: bool = True,
):
    step = functools.partial(
        cfg_train_step,
        schedule=schedule,
        p_uncond=p_uncond,
        unconditional=unconditional,
        sum_div_b2=sum_div_b2,
    )
    return jax.jit(step, donate_argnums=(0,)) if jit else step


def build_cfg_model(config: CFGConfig) -> CFGUNet:
    return CFGUNet(
        T=config.T,
        num_labels=config.num_labels,
        ch=config.channel,
        ch_mult=tuple(config.channel_mult),
        num_res_blocks=config.num_res_blocks,
        dropout=config.dropout,
        dtype=jnp.bfloat16 if config.bf16 else jnp.float32,
    )


def train_cfg(config: CFGConfig, max_steps: Optional[int] = None) -> dict:
    """Epoch loop (TrainCondition.py:46-72). Returns summary for tests."""
    from ..data.pipeline import BatchLoader

    ds = make_labeled_dataset(config.data_root, train=True,
                              synthetic_length=config.synthetic_length,
                              image_size=config.img_size)
    loader = BatchLoader(ds, config.batch_size, shuffle=True,
                         seed=config.seed)
    schedule = linear_beta_schedule(config.beta_1, config.beta_T, config.T)
    model = build_cfg_model(config)

    x = jnp.zeros((1, config.img_size, config.img_size, 3))
    params = jax.jit(model.init)(
        jax.random.PRNGKey(config.seed), x, jnp.zeros((1,), jnp.int32),
        jnp.zeros((1,), jnp.int32))
    state = create_train_state(
        params, model.apply, lr=config.lr, weight_decay=1e-4,
        grad_clip=config.grad_clip, total_epochs=config.epochs,
        steps_per_epoch=max(len(loader), 1), multiplier=config.multiplier,
    )
    step_fn = make_cfg_train_step(schedule, config.p_uncond,
                                  config.unconditional,
                                  sum_div_b2=config.sum_div_b2)

    rng = jax.random.PRNGKey(config.seed)
    summary = {"steps": 0, "losses": []}
    for epoch in range(config.epochs):
        loader.set_epoch(epoch)
        t0 = time.time()
        loss = float("nan")
        for batch in loader:
            rng, sub = jax.random.split(rng)
            arrays = {"image": jnp.asarray(batch["image"]),
                      "label": jnp.asarray(batch["label"])}
            state, metrics = step_fn(state, arrays, sub)
            summary["steps"] += 1
            if max_steps and summary["steps"] >= max_steps:
                break
        loss = float(metrics["loss"])
        summary["losses"].append(loss)
        print(f"[cfg] epoch {epoch+1}/{config.epochs} loss={loss:.4f} "
              f"{time.time()-t0:.1f}s")
        if (epoch + 1) % config.save_every == 0:
            save_checkpoint(config.save_dir, epoch + 1,
                            "CFG" if not config.unconditional else "Uncond",
                            "CIFAR10", state)
        if max_steps and summary["steps"] >= max_steps:
            break
    summary["params"] = state.params
    return summary


def evaluate_cfg(
    config: CFGConfig,
    params=None,
    checkpoint_path: Optional[str] = None,
    save_png: bool = True,
) -> np.ndarray:
    """Sample an nrow-per-class label grid (TrainCondition.py:75-108).

    Returns the (10·nrow, H, W, 3) uint8 sample array; writes a PNG grid.
    """
    model = build_cfg_model(
        dataclasses.replace(config, dropout=0.0))
    if params is None:
        x = jnp.zeros((1, config.img_size, config.img_size, 3))
        params = jax.jit(model.init)(
            jax.random.PRNGKey(config.seed), x, jnp.zeros((1,), jnp.int32),
            jnp.zeros((1,), jnp.int32))
        if checkpoint_path:
            params = restore_params(checkpoint_path, params)

    schedule = linear_beta_schedule(config.beta_1, config.beta_T, config.T)
    # Label grid: nrow samples of each class 1..10 (labels are +1-shifted).
    labels = jnp.asarray(
        np.repeat(np.arange(1, config.num_labels + 1), config.nrow),
        jnp.int32)
    if config.unconditional:
        labels = jnp.zeros_like(labels)

    def denoise(x, t, l):
        return model.apply(params, x, t, l)

    sample = jax.jit(lambda l, r: cfg_ddpm_sample(
        denoise, schedule, l, r, image_size=config.img_size,
        w=0.0 if config.unconditional else config.w))
    out = sample(labels, jax.random.PRNGKey(config.seed + 1))
    imgs = np.asarray((out + 1.0) / 2.0 * 255.0).clip(0, 255).astype(np.uint8)

    if save_png:
        os.makedirs(config.sampled_dir, exist_ok=True)
        grid = _image_grid(imgs, config.nrow)
        path = os.path.join(config.sampled_dir, "SampledGuidenceImgs.png")
        _write_png(path, grid)
        print(f"[cfg] wrote {path}")
    return imgs


def _image_grid(imgs: np.ndarray, nrow: int) -> np.ndarray:
    n, h, w, c = imgs.shape
    rows = (n + nrow - 1) // nrow
    pad = rows * nrow - n
    if pad:
        imgs = np.concatenate([imgs, np.zeros((pad, h, w, c), imgs.dtype)])
    return (imgs.reshape(rows, nrow, h, w, c)
                .transpose(0, 2, 1, 3, 4)
                .reshape(rows * h, nrow * w, c))


def _write_png(path: str, img: np.ndarray) -> None:
    try:
        import cv2

        cv2.imwrite(path, cv2.cvtColor(img, cv2.COLOR_RGB2BGR))
    except ImportError:  # minimal uncompressed PNG fallback
        import struct
        import zlib

        h, w, _ = img.shape
        raw = b"".join(b"\x00" + img[i].tobytes() for i in range(h))
        def chunk(tag, data):
            c = tag + data
            return (struct.pack(">I", len(data)) + c
                    + struct.pack(">I", zlib.crc32(c)))
        png = (b"\x89PNG\r\n\x1a\n"
               + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
               + chunk(b"IDAT", zlib.compress(raw))
               + chunk(b"IEND", b""))
        with open(path, "wb") as f:
            f.write(png)
