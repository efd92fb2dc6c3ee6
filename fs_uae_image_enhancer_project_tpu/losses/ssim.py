"""SSIM and the reconstructed ``loss_ssim.SSIMLoss`` module.

The reference imports ``loss_ssim`` (model_conv5.py:4) but the file is absent;
its constructor signature survives at the call site (model_conv5.py:68):
``SSIMLoss(pixel_loss_type='L1', convert_to_linear_for_ssim=False,
ssim_weight=0.01, pixel_loss_weight=0.99)``, and the training CSV describes
the conv5 objective as 0.99*L1 + 0.01*SSIM-loss (BASELINE.md). This module
reconstructs it: standard single-scale SSIM (Wang et al. 2004; 11x11 Gaussian
window, sigma=1.5, K1=0.01, K2=0.03, data_range=1) with
loss = pixel_w * pixel + ssim_w * (1 - SSIM).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.gamma import srgb_to_linear_approx
from .functional import charbonnier_loss, l1_loss


def _gaussian_kernel(size: int = 11, sigma: float = 1.5) -> jnp.ndarray:
    half = (size - 1) / 2.0
    coords = np.arange(size) - half
    g = np.exp(-(coords**2) / (2 * sigma**2))
    g /= g.sum()
    return jnp.asarray(np.outer(g, g), jnp.float32)


def ssim(
    a: jnp.ndarray,
    b: jnp.ndarray,
    *,
    data_range: float = 1.0,
    window_size: int = 11,
    sigma: float = 1.5,
    k1: float = 0.01,
    k2: float = 0.03,
) -> jnp.ndarray:
    """Mean SSIM over NHWC batches (VALID windows, per torch pytorch_msssim)."""
    kern = _gaussian_kernel(window_size, sigma).astype(a.dtype)
    c = a.shape[-1]
    w = jnp.broadcast_to(
        kern.reshape(window_size, window_size, 1, 1), (window_size, window_size, 1, c)
    )

    def filt(x):
        return jax.lax.conv_general_dilated(
            x, w, (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=c,
            precision=jax.lax.Precision.HIGHEST,
        )

    c1 = (k1 * data_range) ** 2
    c2 = (k2 * data_range) ** 2
    mu_a, mu_b = filt(a), filt(b)
    mu_aa, mu_bb, mu_ab = mu_a * mu_a, mu_b * mu_b, mu_a * mu_b
    sigma_aa = filt(a * a) - mu_aa
    sigma_bb = filt(b * b) - mu_bb
    sigma_ab = filt(a * b) - mu_ab
    num = (2 * mu_ab + c1) * (2 * sigma_ab + c2)
    den = (mu_aa + mu_bb + c1) * (sigma_aa + sigma_bb + c2)
    return jnp.mean(num / den)


def ssim_loss(
    output: jnp.ndarray,
    target: jnp.ndarray,
    *,
    pixel_loss_type: str = "l1",
    pixel_loss_weight: float = 0.99,
    ssim_weight: float = 0.01,
    convert_to_linear_for_ssim: bool = False,
    charbonnier_epsilon: float = 1e-6,
) -> jnp.ndarray:
    """The reconstructed SSIMLoss criterion."""
    pl = pixel_loss_type.lower()
    if pl == "l1":
        pixel = l1_loss(output, target)
    elif pl == "charbonnier":
        pixel = charbonnier_loss(output, target, charbonnier_epsilon)
    else:
        raise ValueError(f"Invalid pixel_loss_type: {pixel_loss_type}")
    a, b = output, target
    if convert_to_linear_for_ssim:
        a = srgb_to_linear_approx(jnp.clip(a, 0.0, 1.0))
        b = srgb_to_linear_approx(jnp.clip(b, 0.0, 1.0))
    s = ssim(a, b)
    return pixel_loss_weight * pixel + ssim_weight * (1.0 - s)
