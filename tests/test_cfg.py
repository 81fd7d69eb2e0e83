"""CFG CIFAR-10 subsystem tests (models/cfg_unet.py + cfg/*).

Mirrors the reference test strategy (inline smoke harnesses,
ModelCondition.py:378-392) plus golden checks of the CFG mixing math.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hybrid_diffusion_tpu.cfg import (
    CFGConfig,
    SyntheticLabeledDataset,
    cfg_ddpm_sample,
    evaluate_cfg,
    make_cfg_train_step,
    make_labeled_dataset,
    train_cfg,
)
from hybrid_diffusion_tpu.cfg.sampler import _guided_eps
from hybrid_diffusion_tpu.cfg.train import cfg_train_step, normalize_cifar
from hybrid_diffusion_tpu.diffusion import linear_beta_schedule
from hybrid_diffusion_tpu.train.train_state import create_train_state

TINY = dict(T=8, num_labels=10, ch=32, ch_mult=(1, 2), num_res_blocks=1,
            dropout=0.0)


def tiny_config(**overrides) -> CFGConfig:
    return CFGConfig(
        epochs=1, batch_size=8, T=8, channel=32, channel_mult=(1, 2),
        num_res_blocks=1, dropout=0.0, img_size=16, nrow=2,
        synthetic_length=16, bf16=False, save_every=1000, **overrides)


def test_synthetic_labeled_dataset():
    ds = SyntheticLabeledDataset(length=20, image_size=16)
    item = ds[3]
    assert item["image"].shape == (16, 16, 3)
    assert item["image"].dtype == np.uint8
    assert item["label"] == 3
    # deterministic
    assert np.array_equal(ds[3]["image"], ds[3]["image"])
    assert ds[13]["label"] == 3


def test_make_labeled_dataset_falls_back_to_synthetic(tmp_path):
    ds = make_labeled_dataset(str(tmp_path), synthetic_length=10)
    assert isinstance(ds, SyntheticLabeledDataset)


def test_guided_eps_mixing_formula():
    """eps = (1+w)·eps_cond − w·eps_uncond (DiffusionCondition.py:78)."""
    calls = []

    def denoise(x, t, labels):
        calls.append(labels)
        # eps depends linearly on label so the mix is checkable.
        return jnp.ones_like(x) * labels[:, None, None, None].astype(jnp.float32)

    x = jnp.zeros((2, 4, 4, 3))
    t = jnp.zeros((2,), jnp.int32)
    labels = jnp.asarray([3, 5], jnp.int32)
    w = 1.8
    eps = _guided_eps(denoise, x, t, labels, w)
    # cond eps = label, uncond eps = 0 → mix = (1+w)·label
    np.testing.assert_allclose(
        np.asarray(eps[:, 0, 0, 0]), (1 + w) * np.asarray([3.0, 5.0]),
        rtol=1e-6)
    # single batched 2B call
    assert len(calls) == 1 and calls[0].shape == (4,)


def test_guided_eps_w0_single_call():
    calls = []

    def denoise(x, t, labels):
        calls.append(1)
        return jnp.zeros_like(x)

    _guided_eps(denoise, jnp.zeros((2, 4, 4, 3)), jnp.zeros((2,), jnp.int32),
                jnp.ones((2,), jnp.int32), 0.0)
    assert len(calls) == 1


def test_cfg_sampler_shapes_and_range():
    schedule = linear_beta_schedule(1e-4, 0.028, 8)

    def dummy(x, t, labels):
        return x * 0.1

    out = cfg_ddpm_sample(dummy, schedule, jnp.ones((4,), jnp.int32),
                          jax.random.PRNGKey(0), image_size=16, w=1.8)
    assert out.shape == (4, 16, 16, 3)
    assert float(jnp.max(out)) <= 1.0 and float(jnp.min(out)) >= -1.0


def test_cfg_sampler_traced_w_sweep_single_compile():
    """A jitted sampler with w as a *traced* argument (one compile for a
    guidance-scale sweep, scripts/demo_cfg.py) matches per-w concrete
    sampling — including w=0, whose concrete path skips the 2B call."""
    schedule = linear_beta_schedule(1e-4, 0.028, 8)

    def dummy(x, t, labels):
        # Label-dependent so guided and unguided eps genuinely differ.
        return x * 0.1 + 0.01 * labels[:, None, None, None].astype(jnp.float32)

    labels = jnp.asarray([1, 2, 3, 4], jnp.int32)
    compiles = []

    @jax.jit
    def sample(w, rng):
        compiles.append(1)
        return cfg_ddpm_sample(dummy, schedule, labels, rng,
                               image_size=16, w=w)

    rng = jax.random.PRNGKey(7)
    for w in (0.0, 0.5, 1.8):
        traced = sample(jnp.float32(w), rng)
        concrete = cfg_ddpm_sample(dummy, schedule, labels, rng,
                                   image_size=16, w=w)
        np.testing.assert_allclose(np.asarray(traced), np.asarray(concrete),
                                   atol=1e-6)
    assert len(compiles) == 1  # traced once, reused across the sweep


def test_cfg_train_step_decreases_loss():
    from hybrid_diffusion_tpu.models.cfg_unet import CFGUNet

    model = CFGUNet(**TINY)
    x = jnp.zeros((1, 16, 16, 3))
    params = model.init(jax.random.PRNGKey(0), x, jnp.zeros((1,), jnp.int32),
                        jnp.zeros((1,), jnp.int32))
    state = create_train_state(params, model.apply, lr=2e-3,
                               total_epochs=10, steps_per_epoch=10)
    schedule = linear_beta_schedule(1e-4, 0.028, 8)
    step = make_cfg_train_step(schedule, jit=True)

    rng = np.random.RandomState(0)
    batch = {
        "image": jnp.asarray(rng.randint(0, 255, (8, 16, 16, 3), np.uint8)),
        "label": jnp.asarray(rng.randint(0, 10, (8,), np.int64)),
    }
    key = jax.random.PRNGKey(1)
    losses = []
    for i in range(25):
        state, m = step(state, batch, key)  # same batch+key → pure descent
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0], losses


def test_cfg_train_step_sum_div_b2_scaling():
    """sum/b² == mean · (H·W·C/B) for equal shapes (TrainCondition.py:59)."""
    schedule = linear_beta_schedule(1e-4, 0.028, 8)
    from hybrid_diffusion_tpu.models.cfg_unet import CFGUNet

    model = CFGUNet(**TINY)
    x = jnp.zeros((1, 16, 16, 3))
    params = model.init(jax.random.PRNGKey(0), x, jnp.zeros((1,), jnp.int32),
                        jnp.zeros((1,), jnp.int32))
    state = create_train_state(params, model.apply, lr=0.0,
                               total_epochs=1, steps_per_epoch=1)
    rng = np.random.RandomState(0)
    B = 4
    batch = {
        "image": jnp.asarray(rng.randint(0, 255, (B, 16, 16, 3), np.uint8)),
        "label": jnp.asarray(rng.randint(0, 10, (B,), np.int64)),
    }
    key = jax.random.PRNGKey(3)
    _, m_mean = cfg_train_step(state, batch, key, schedule)
    _, m_ref = cfg_train_step(state, batch, key, schedule, sum_div_b2=True)
    scale = 16 * 16 * 3 / B
    np.testing.assert_allclose(float(m_ref["loss"]),
                               float(m_mean["loss"]) * scale, rtol=1e-5)


def test_train_cfg_end_to_end(tmp_path):
    cfg = tiny_config(save_dir=str(tmp_path / "ckpt"),
                      sampled_dir=str(tmp_path / "samples"))
    summary = train_cfg(cfg, max_steps=2)
    assert summary["steps"] == 2
    imgs = evaluate_cfg(cfg, params=summary["params"], save_png=True)
    assert imgs.shape == (10 * cfg.nrow, 16, 16, 3)
    assert (tmp_path / "samples" / "SampledGuidenceImgs.png").exists()


def test_train_cfg_unconditional_mode(tmp_path):
    """Fixed diffusion/Train.py intent: all labels null, w=0 sampling."""
    cfg = tiny_config(unconditional=True, save_dir=str(tmp_path / "c"),
                      sampled_dir=str(tmp_path / "s"))
    summary = train_cfg(cfg, max_steps=1)
    imgs = evaluate_cfg(cfg, params=summary["params"], save_png=False)
    assert imgs.shape == (10 * cfg.nrow, 16, 16, 3)


def test_sum_div_b2_plumbed_through_config(tmp_path):
    """CFGConfig(sum_div_b2=True) must reach the train step: one step with
    the flag produces the reference's sum/b² loss = mean-MSE × (3·H·W/B)
    (TrainCondition.py:59), i.e. exactly 3·16²/8 = 96× the mean loss here."""
    base = dict(save_dir=str(tmp_path / "c"),
                sampled_dir=str(tmp_path / "s"))
    mean_loss = train_cfg(tiny_config(**base), max_steps=1)["losses"][0]
    scaled = train_cfg(tiny_config(sum_div_b2=True, **base),
                       max_steps=1)["losses"][0]
    expected = 3 * 16 * 16 / 8
    assert abs(scaled / mean_loss - expected) / expected < 1e-4
