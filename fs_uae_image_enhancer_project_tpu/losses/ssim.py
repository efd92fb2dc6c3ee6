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


def _ssim_and_cs(
    a: jnp.ndarray,
    b: jnp.ndarray,
    *,
    data_range: float = 1.0,
    window_size: int = 11,
    sigma: float = 1.5,
    k1: float = 0.01,
    k2: float = 0.03,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Mean SSIM and contrast-structure (cs) terms over NHWC batches
    (VALID Gaussian windows, matching pytorch_msssim's _ssim)."""
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
    cs_map = (2 * sigma_ab + c2) / (sigma_aa + sigma_bb + c2)
    ssim_map = cs_map * (2 * mu_ab + c1) / (mu_aa + mu_bb + c1)
    return jnp.mean(ssim_map), jnp.mean(cs_map)


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
    s, _ = _ssim_and_cs(
        a, b, data_range=data_range, window_size=window_size, sigma=sigma,
        k1=k1, k2=k2,
    )
    return s


# Wang et al. 2003 (multi-scale SSIM) per-scale exponents — the same
# constants pytorch_msssim and the reference's optional pytorch_msssim
# dependency use (optuna_study_prune_act_r2.py:18-24 reaches for SSIM as
# its second metric; MS-SSIM is the perceptual-metric column VERDICT r4
# item 4 asks the eval harnesses to carry).
MS_SSIM_WEIGHTS = (0.0448, 0.2856, 0.3001, 0.2363, 0.1333)


def ms_ssim(
    a: jnp.ndarray,
    b: jnp.ndarray,
    *,
    data_range: float = 1.0,
    window_size: int = 11,
    sigma: float = 1.5,
    k1: float = 0.01,
    k2: float = 0.03,
    weights: tuple[float, ...] = MS_SSIM_WEIGHTS,
) -> jnp.ndarray:
    """Multi-scale SSIM over NHWC batches (Wang et al. 2003).

    Same structure as pytorch_msssim's ms_ssim: at each of the first
    len(weights)-1 scales take the contrast-structure term, 2x2-average-pool,
    and at the last scale take full SSIM; the result is
    prod(relu(term_i) ** weight_i). One DELIBERATE difference: the 2x2 pool
    here floors (drops a trailing odd row/col) where pytorch_msssim
    zero-pads odd dims (F.avg_pool2d(x, 2, padding=s % 2)), so values can
    deviate slightly from pytorch_msssim whenever an intermediate scale has
    an odd side (e.g. 376x288 -> 47 at scale 4). All ms_ssim numbers
    published by this repo are computed by THIS function and are
    self-consistent; do not compare them against pytorch_msssim outputs at
    the third decimal.

    The size guard is sized for floor pooling: after len(weights)-1 floor
    halvings the last scale must still fit a VALID window, so
    min(H, W) >= window_size * 2 ** (len(weights) - 1) (= 176 for the
    defaults; the weaker (window_size-1)*2**(scales-1)+1 bound pytorch_msssim
    asserts is only sufficient with its padded pooling and would let
    161..175-pixel sides reach an empty VALID conv -> silent NaN here).
    """
    min_side = min(a.shape[1], a.shape[2])
    need = window_size * 2 ** (len(weights) - 1)
    if min_side < need:
        raise ValueError(
            f"ms_ssim needs min(H,W) >= {need} for window_size="
            f"{window_size} and {len(weights)} scales with floor pooling; "
            f"got {min_side}"
        )
    terms = []
    for i in range(len(weights)):
        s, cs = _ssim_and_cs(
            a, b, data_range=data_range, window_size=window_size,
            sigma=sigma, k1=k1, k2=k2,
        )
        terms.append(s if i == len(weights) - 1 else cs)
        if i < len(weights) - 1:
            # floor 2x2 average pool (pytorch_msssim: F.avg_pool2d(x, 2))
            h = (a.shape[1] // 2) * 2
            w_ = (a.shape[2] // 2) * 2
            a = a[:, :h, :w_, :].reshape(
                a.shape[0], h // 2, 2, w_ // 2, 2, a.shape[3]
            ).mean(axis=(2, 4))
            b = b[:, :h, :w_, :].reshape(
                b.shape[0], h // 2, 2, w_ // 2, 2, b.shape[3]
            ).mean(axis=(2, 4))
    out = jnp.ones((), a.dtype)
    for wgt, t in zip(weights, terms):
        out = out * jnp.maximum(t, 0.0) ** wgt
    return out


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
