"""Loss-library tests: analytic properties and golden values."""

import jax
import jax.numpy as jnp
import numpy as np

from hybrid_diffusion_tpu.losses import (
    CompositeLossConfig,
    DinoPerceptualLoss,
    VGGPerceptualLoss,
    angular_color_loss,
    charbonnier_loss,
    composite_enhancement_loss,
    ms_ssim,
    ms_ssim_loss,
    ssim,
)
from hybrid_diffusion_tpu.losses.perceptual import center_crop_to_multiple


def _img(key, shape=(2, 32, 32, 3)):
    return jax.random.uniform(jax.random.PRNGKey(key), shape)


# --- angular color ---

def test_color_identical_is_zero():
    x = _img(0)
    assert float(angular_color_loss(x, x)) < 1e-6


def test_color_scale_invariant():
    x = _img(1)
    assert float(angular_color_loss(x, 2.5 * x)) < 1e-6


def test_color_orthogonal_is_one():
    a = jnp.zeros((1, 4, 4, 3)).at[..., 0].set(1.0)
    b = jnp.zeros((1, 4, 4, 3)).at[..., 1].set(1.0)
    assert np.isclose(float(angular_color_loss(a, b)), 1.0, atol=1e-6)


def test_color_dark_pixel_gradient_bounded():
    # Regression (round 4): the per-pixel *unweighted* mean cosine has
    # ~1/√eps ≈ 1e4 gradients at pixels where both color vectors are near
    # zero — dark pixels in otherwise-normal images spiked flagship
    # fine-tune gradient norms 24→1200. The norm-weighted form must keep
    # per-pixel gradients O(1/n_pixels) there.
    x = _img(3, (1, 8, 8, 3))
    y = _img(4, (1, 8, 8, 3))
    x = x.at[0, :4, :4].set(1e-4)  # a dark patch in both images
    y = y.at[0, :4, :4].set(2e-4)
    g = jax.grad(lambda a: angular_color_loss(a, y))(x)
    assert float(jnp.max(jnp.abs(g[0, :4, :4]))) < 1.0
    assert np.isfinite(float(jnp.max(jnp.abs(g))))


def test_color_discriminates_hue_shift():
    # The weighted mean must still behave as a color-angle penalty:
    # channel-swapped images score much worse than identical ones.
    x = _img(5)
    swapped = x[..., ::-1]
    assert float(angular_color_loss(x, swapped)) > 0.05
    assert float(angular_color_loss(x, x)) < 1e-6


# --- charbonnier ---

def test_charbonnier_zero_and_l1_limit():
    x = _img(2)
    assert float(charbonnier_loss(x, x)) < 1e-7
    # For |d| >> eps, charbonnier ≈ |d|.
    y = x + 0.5
    assert np.isclose(float(charbonnier_loss(x, y)), 0.5, atol=1e-3)


# --- ssim / ms-ssim ---

def test_ssim_identical_is_one():
    x = _img(3, (1, 32, 32, 3))
    assert np.isclose(float(ssim(x, x)), 1.0, atol=1e-5)


def test_ssim_decreases_with_noise():
    x = _img(4, (1, 64, 64, 3))
    n1 = x + 0.05 * jax.random.normal(jax.random.PRNGKey(10), x.shape)
    n2 = x + 0.3 * jax.random.normal(jax.random.PRNGKey(10), x.shape)
    s0, s1, s2 = float(ssim(x, x)), float(ssim(x, n1)), float(ssim(x, n2))
    assert s0 > s1 > s2


def test_ssim_matches_independent_reference():
    """Cross-check against a direct (non-convolutional) uniform-window SSIM
    on a constant-shifted image, where SSIM has a closed form."""
    x = jnp.full((1, 32, 32, 1), 0.5)
    y = jnp.full((1, 32, 32, 1), 0.6)
    # Constant images: sigma=0, so SSIM = (2 μx μy + c1)/(μx²+μy²+c1).
    c1 = 0.01**2
    expected = (2 * 0.5 * 0.6 + c1) / (0.25 + 0.36 + c1)
    assert np.isclose(float(ssim(x, y)), expected, atol=1e-3)


def test_ms_ssim_range_and_identity():
    x = _img(5, (1, 176, 176, 3))
    assert np.isclose(float(ms_ssim(x, x)), 1.0, atol=1e-4)
    y = _img(6, (1, 176, 176, 3))
    v = float(ms_ssim(x, y))
    assert 0.0 <= v < 1.0
    assert np.isclose(float(ms_ssim_loss(x, y)), 1.0 - v, atol=1e-6)


# --- perceptual ---

def test_center_crop_256_to_252():
    x = jnp.zeros((1, 256, 256, 3))
    out = center_crop_to_multiple(x, 14)
    assert out.shape == (1, 252, 252, 3)


def test_dino_loss_zero_on_identical_and_positive_otherwise():
    loss_fn = DinoPerceptualLoss(jax.random.PRNGKey(0), image_size=56)
    x = _img(7, (1, 56, 56, 3)) * 2 - 1
    y = _img(8, (1, 56, 56, 3)) * 2 - 1
    assert float(loss_fn(x, x)) < 1e-5
    assert float(loss_fn(x, y)) > 0.0
    assert not loss_fn.pretrained  # no weights file in this environment


def test_vgg_loss_basic():
    loss_fn = VGGPerceptualLoss(jax.random.PRNGKey(0))
    x = _img(9, (1, 32, 32, 3)) * 2 - 1
    y = _img(10, (1, 32, 32, 3)) * 2 - 1
    assert float(loss_fn(x, x)) < 1e-6
    assert float(loss_fn(x, y)) > 0.0


# --- composite ---

def test_composite_default_weights():
    pred_noise = _img(11, (1, 176, 176, 3))
    noise = _img(12, (1, 176, 176, 3))
    x0 = _img(13, (1, 176, 176, 3)) * 2 - 1
    gt = _img(14, (1, 176, 176, 3)) * 2 - 1
    cfg = CompositeLossConfig()
    loss, parts = composite_enhancement_loss(
        pred_noise, noise, x0, gt, cfg, dino_loss_fn=lambda a, b: jnp.float32(2.0)
    )
    expected = (
        parts["mse"]
        + 0.5 * 2.0
        + 0.0045 * parts["ms_ssim"]
        + 1.0 * parts["color"]
    )
    assert np.isclose(float(loss), float(expected), rtol=1e-6)
    assert "charbonnier" not in parts  # zero weight ⇒ not computed


def test_composite_is_differentiable():
    x0 = _img(15, (1, 176, 176, 3)) * 2 - 1
    gt = _img(16, (1, 176, 176, 3)) * 2 - 1

    def f(x0):
        loss, _ = composite_enhancement_loss(
            jnp.zeros_like(x0), jnp.zeros_like(x0), x0, gt
        )
        return loss

    g = jax.grad(f)(x0)
    assert np.all(np.isfinite(np.asarray(g)))


def test_vgg_variants_tap_semantics():
    """Reference backbone selection (Loss/loss.py:159-204): tap indices
    address the torchvision features-Sequential exactly — vgg19 yields 5
    features; vgg11's out-of-range index 22 silently yields only 3 (the
    reference loop just ends); unsupported names raise with the list."""
    import pytest as _pytest

    x = jnp.asarray(np.random.RandomState(0).rand(1, 64, 64, 3), jnp.float32)

    v16 = VGGPerceptualLoss(jax.random.PRNGKey(0), model="vgg16")
    f16 = v16.model.apply(v16.params, x)
    assert [f.shape[1] for f in f16] == [64, 32, 16, 8]  # post-ReLU taps

    v19 = VGGPerceptualLoss(jax.random.PRNGKey(0), model="vgg19")
    assert len(v19.model.apply(v19.params, x)) == 5

    v11 = VGGPerceptualLoss(jax.random.PRNGKey(0), model="vgg11")
    assert len(v11.model.apply(v11.params, x)) == 3

    custom = VGGPerceptualLoss(jax.random.PRNGKey(0), model="vgg16",
                               layer_indices=[3, 8])
    assert len(custom.model.apply(custom.params, x)) == 2

    bn = VGGPerceptualLoss(jax.random.PRNGKey(0), model="vgg16_bn")
    # BN shifts every slot index: [3,8,15,22] land differently but still
    # produce 4 finite feature maps.
    fbn = bn.model.apply(bn.params, x)
    assert len(fbn) == 4 and all(np.isfinite(np.asarray(f)).all()
                                 for f in fbn)

    # squeeze/alex complete the reference's selectable list
    # (Loss/loss.py:180-183). squeeze taps [3,7,12] are Fire-module
    # outputs (one Sequential slot per Fire); alex taps [3,6,8,10,12]
    # land on pre-ReLU conv outputs and the final pool.
    sq = VGGPerceptualLoss(jax.random.PRNGKey(0), model="squeeze")
    fsq = sq.model.apply(sq.params, x)
    assert [f.shape[-1] for f in fsq] == [128, 256, 512]
    assert [f.shape[1] for f in fsq] == [15, 7, 3]  # ceil-mode pools

    al = VGGPerceptualLoss(jax.random.PRNGKey(0), model="alex")
    fal = al.model.apply(al.params, x)
    assert [f.shape[-1] for f in fal] == [192, 384, 256, 256, 256]
    assert float(al(x * 2 - 1, x * 2 - 1)) == 0.0

    with _pytest.raises(ValueError):
        VGGPerceptualLoss(jax.random.PRNGKey(0), model="resnet50")


def test_aux_snr_weighting():
    """Per-example aux weighting: all-equal weights reproduce the unweighted
    loss; zeroing an example removes exactly its contribution."""
    from hybrid_diffusion_tpu.losses.composite import (
        CompositeLossConfig,
        composite_enhancement_loss,
    )

    rng = np.random.RandomState(0)
    B = 4
    noise = jnp.asarray(rng.randn(B, 16, 16, 3), jnp.float32)
    pred = noise + 0.1
    x0 = jnp.asarray(rng.uniform(-1, 1, (B, 16, 16, 3)), jnp.float32)
    gt = jnp.asarray(rng.uniform(-1, 1, (B, 16, 16, 3)), jnp.float32)
    cfg = CompositeLossConfig(dino_weight=0, ms_ssim_weight=0,
                              color_weight=1.0, charbonnier_weight=0.5)

    base, parts0 = composite_enhancement_loss(pred, noise, x0, gt, cfg)
    eq, _ = composite_enhancement_loss(pred, noise, x0, gt, cfg,
                                       aux_weights=jnp.full((B,), 0.3))
    np.testing.assert_allclose(float(eq), float(base), rtol=1e-5)

    # Zero out example 0: result equals the unweighted loss on examples 1:.
    w = jnp.asarray([0.0, 1.0, 1.0, 1.0])
    masked, parts_m = composite_enhancement_loss(pred, noise, x0, gt, cfg,
                                                 aux_weights=w)
    sub, parts_s = composite_enhancement_loss(
        pred[1:], noise[1:], x0[1:], gt[1:], cfg)
    np.testing.assert_allclose(float(parts_m["color"]),
                               float(parts_s["color"]), rtol=1e-5)
    np.testing.assert_allclose(float(parts_m["charbonnier"]),
                               float(parts_s["charbonnier"]), rtol=1e-5)
