"""Loss tests: formula parity with the reference definitions + gradient flow."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fs_uae_image_enhancer_project_tpu.losses import (
    PerceptualConfig,
    build_criterion,
    charbonnier_loss,
    l1_loss,
    laplacian_hf_loss,
    luminance_loss,
    make_perceptual_loss,
    rgb_to_ycbcr,
    ssim,
    ssim_loss,
)
from fs_uae_image_enhancer_project_tpu.losses import vgg as vgg_mod
from fs_uae_image_enhancer_project_tpu.models import get_model

RNG = np.random.default_rng(7)


def test_charbonnier_formula():
    o = jnp.array(RNG.normal(size=(2, 4, 4, 3)).astype(np.float32))
    t = jnp.array(RNG.normal(size=(2, 4, 4, 3)).astype(np.float32))
    expected = np.mean(np.sqrt((np.asarray(o) - np.asarray(t)) ** 2 + 1e-12))
    np.testing.assert_allclose(charbonnier_loss(o, t), expected, rtol=1e-6)
    with pytest.raises(ValueError):
        charbonnier_loss(o, t[:1])


def test_ycbcr_matches_kornia_convention():
    x = jnp.array(RNG.uniform(0, 1, (1, 4, 4, 3)).astype(np.float32))
    y = rgb_to_ycbcr(x)
    r, g, b = [np.asarray(x[..., i]) for i in range(3)]
    np.testing.assert_allclose(y[..., 0], 0.299 * r + 0.587 * g + 0.114 * b, atol=1e-6)
    np.testing.assert_allclose(
        y[..., 1], (b - (0.299 * r + 0.587 * g + 0.114 * b)) * 0.564 + 0.5, atol=1e-6
    )


def test_laplacian_hf_loss_zero_for_identical():
    x = jnp.array(RNG.uniform(0, 1, (1, 8, 8, 3)).astype(np.float32))
    assert float(laplacian_hf_loss(x, x)) == 0.0
    assert float(laplacian_hf_loss(x, x * 0.5)) > 0.0


def test_ssim_properties():
    x = jnp.array(RNG.uniform(0, 1, (1, 32, 32, 3)).astype(np.float32))
    assert float(ssim(x, x)) == pytest.approx(1.0, abs=1e-4)
    noisy = jnp.clip(x + 0.3 * RNG.normal(size=x.shape).astype(np.float32), 0, 1)
    s = float(ssim(x, noisy))
    assert 0.0 < s < 0.95


def test_ssim_loss_reconstruction():
    # conv5's criterion: 0.99*L1 + 0.01*(1-SSIM) (model_conv5.py:68)
    x = jnp.array(RNG.uniform(0, 1, (1, 32, 32, 3)).astype(np.float32))
    y = jnp.clip(x + 0.05, 0, 1)
    loss = float(ssim_loss(x, y))
    manual = 0.99 * float(l1_loss(x, y)) + 0.01 * (1 - float(ssim(x, y)))
    assert loss == pytest.approx(manual, rel=1e-5)
    with pytest.raises(ValueError):
        ssim_loss(x, y, pixel_loss_type="nope")


def test_vgg_extractor_shapes():
    params = vgg_mod.init_vgg16()
    x = jnp.array(RNG.uniform(0, 1, (1, 64, 64, 3)).astype(np.float32))
    feats = vgg_mod.extract_features(params, vgg_mod.normalize(x))
    assert len(feats) == 4
    # taps 3, 8, 17, 26: resolutions /1, /2, /8, /16; channels 64,128,512,512
    assert feats[0].shape == (1, 64, 64, 64)
    assert feats[1].shape == (1, 32, 32, 128)
    assert feats[2].shape == (1, 8, 8, 512)
    assert feats[3].shape == (1, 4, 4, 512)


def test_perceptual_loss_full_and_grad():
    cfg = PerceptualConfig(
        pixel_loss_weight=0.990, vgg_weight=0.007, pixel_loss_type="charbonnier",
        high_frequency_weight=0.003, input_is_linear=True,
    )
    crit = make_perceptual_loss(cfg)
    o = jnp.array(RNG.uniform(0, 1, (1, 32, 32, 3)).astype(np.float32))
    t = jnp.array(RNG.uniform(0, 1, (1, 32, 32, 3)).astype(np.float32))
    loss = float(crit(o, t))
    assert np.isfinite(loss) and loss > 0
    g = jax.grad(lambda o_: crit(o_, t))(o)
    assert np.all(np.isfinite(np.asarray(g)))
    assert float(crit(t, t)) < loss  # identical pair scores lower


def test_build_criterion_from_model_specs():
    for name in ("pix_shuffle", "conv5"):
        m = get_model(name)
        crit = build_criterion(m.loss)
        o = jnp.array(RNG.uniform(0, 1, (1, 32, 32, 3)).astype(np.float32))
        assert np.isfinite(float(crit(o, o * 0.9)))
