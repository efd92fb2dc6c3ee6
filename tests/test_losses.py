"""Loss tests: formula parity with the reference definitions + gradient flow."""
import os

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
    ms_ssim,
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


def test_ms_ssim_properties():
    # 5-scale MS-SSIM with floor pooling needs min side >= 11*2^4 = 176
    x = jnp.array(RNG.uniform(0, 1, (1, 192, 176, 3)).astype(np.float32))
    assert float(ms_ssim(x, x)) == pytest.approx(1.0, abs=1e-4)
    noisy = jnp.clip(x + 0.2 * RNG.normal(size=x.shape).astype(np.float32), 0, 1)
    m = float(ms_ssim(x, noisy))
    assert 0.0 < m < 0.97
    # a distortion ordering MS-SSIM must respect: small noise > big noise
    small = jnp.clip(x + 0.02 * RNG.normal(size=x.shape).astype(np.float32), 0, 1)
    assert float(ms_ssim(x, small)) > m
    # too-small inputs are a loud error, not a silent wrong number
    with pytest.raises(ValueError):
        ms_ssim(x[:, :64, :64, :], x[:, :64, :64, :])
    # the 161..175 window: passes pytorch_msssim's assert bound but would
    # reach an empty VALID conv (silent NaN) under floor pooling — must be
    # a loud error here too (advisor-verified failure at 168x168)
    big = jnp.array(RNG.uniform(0, 1, (1, 168, 168, 3)).astype(np.float32))
    with pytest.raises(ValueError):
        ms_ssim(big, big)
    # 176 is the exact floor-pool feasibility boundary: finite, == 1 on self
    edge = jnp.array(RNG.uniform(0, 1, (1, 176, 176, 3)).astype(np.float32))
    assert float(ms_ssim(edge, edge)) == pytest.approx(1.0, abs=1e-4)


def test_ms_ssim_single_scale_reduces_to_ssim():
    # with one scale weighted 1.0 MS-SSIM is exactly SSIM
    x = jnp.array(RNG.uniform(0, 1, (1, 48, 48, 3)).astype(np.float32))
    y = jnp.clip(x + 0.1 * RNG.normal(size=x.shape).astype(np.float32), 0, 1)
    np.testing.assert_allclose(
        float(ms_ssim(x, y, weights=(1.0,))), float(ssim(x, y)), rtol=1e-6
    )


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


def _regen_torch_vgg_state():
    """Bit-identical regeneration of the golden's He-normal OIHW weights
    (tests/golden_gen/gen_vgg_goldens.py WEIGHT_SEED) — numpy is the RNG
    shared across the torch and jax processes, so ~59 MB of weights never
    hits the goldens npz."""
    rng = np.random.default_rng(20260818)
    state = {}
    cin = 3
    layout_convs = [(i, cout) for i, kind, cout in vgg_mod.VGG16_LAYOUT
                    if kind == "conv"]
    for i, cout in layout_convs:
        std = np.sqrt(2.0 / (cin * 9))
        state[f"features.{i}.weight"] = rng.normal(
            0.0, std, (cout, cin, 3, 3)).astype(np.float32)
        state[f"features.{i}.bias"] = rng.normal(
            0.0, 0.01, (cout,)).astype(np.float32)
        cin = cout
    return state


def test_vgg_perceptual_matches_reference_golden(tmp_path):
    """End-to-end torch-golden parity for the perceptual pipeline
    (golden_gen/gen_vgg_goldens.py replays loss_vgg.py's exact math):
    tap activations at {3,8,17,26} through the OIHW->HWIO converter +
    loader + extractor, and the total loss for three configs covering
    l1/charbonnier, the HF and luminance branches, and the
    input_is_linear clamp asymmetry."""
    from fs_uae_image_enhancer_project_tpu.losses.perceptual import (
        make_perceptual_loss,
    )

    g = np.load(os.path.join(os.path.dirname(__file__), "goldens",
                             "vgg_goldens.npz"))
    asset = tmp_path / "vgg16_features.npz"
    vgg_mod.convert_torchvision_state_dict(_regen_torch_vgg_state(),
                                           str(asset))
    params = vgg_mod._load_asset(str(asset))

    o = jnp.asarray(np.transpose(g["input_o"], (0, 2, 3, 1)))  # NCHW->NHWC
    t = jnp.asarray(np.transpose(g["input_t"], (0, 2, 3, 1)))

    feats = vgg_mod.extract_features(params, vgg_mod.normalize(o))
    for tap, got in zip(vgg_mod.TAP_INDICES, feats):
        want = np.transpose(g[f"tap_{tap}"], (0, 2, 3, 1))
        scale = float(np.abs(want).max())
        # measured max rel-to-scale err (CPU fp32 vs torch fp32):
        # 4.8e-7 (tap3) .. 8.4e-7 (tap26) — bar ~50x
        np.testing.assert_allclose(np.asarray(got), want,
                                   atol=5e-5 * max(scale, 1.0), rtol=0,
                                   err_msg=f"tap {tap}")

    configs = {
        "loss_srgb_l1_vgg": PerceptualConfig(
            pixel_loss_weight=0.990, vgg_weight=0.007, pixel_loss_type="l1",
            high_frequency_weight=0.003),
        "loss_srgb_charb_lum": PerceptualConfig(
            pixel_loss_weight=1.0, vgg_weight=0.006,
            pixel_loss_type="charbonnier", lambda_lum=0.05),
        "loss_linear_all": PerceptualConfig(
            pixel_loss_weight=0.990, vgg_weight=0.007,
            pixel_loss_type="charbonnier", high_frequency_weight=0.003,
            lambda_lum=0.02, input_is_linear=True),
    }
    for name, cfg in configs.items():
        crit = make_perceptual_loss(cfg, vgg_params=params)
        got = float(crit(o, t))
        assert got == pytest.approx(float(g[name]), rel=1e-4), name


def test_build_criterion_from_model_specs():
    for name in ("pix_shuffle", "conv5"):
        m = get_model(name)
        crit = build_criterion(m.loss)
        o = jnp.array(RNG.uniform(0, 1, (1, 32, 32, 3)).astype(np.float32))
        assert np.isfinite(float(crit(o, o * 0.9)))
