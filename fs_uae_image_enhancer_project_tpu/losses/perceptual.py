"""The combined perceptual criterion.

Functional counterpart of reference ``PerceptualLoss`` (loss_vgg.py:36-210):

    total = pixel_w * pixel(o, t)
          + vgg_w   * sum_l w_l * L1(VGG_l(norm(srgb(o))), VGG_l(norm(srgb(t))))
          + hf_w    * L1(laplacian(o), laplacian(t))
          + lum_w   * L1(Y(o'), Y(t'))

with the reference's exact quirks: when ``input_is_linear`` the output is
clamped to [0,1] AFTER linear->sRGB for the VGG branch (clamp of the pow's
result — loss_vgg.py:174) while the target is not clamped at all
(loss_vgg.py:171-177); the VGG normalization uses std=1/255
(loss_vgg.py:113-114); the luminance branch consumes the VGG-normalized
tensors (loss_vgg.py:192-194).
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Optional

import jax.numpy as jnp

from ..ops.gamma import linear_to_srgb_approx
from . import vgg as vgg_mod
from .functional import charbonnier_loss, l1_loss, laplacian_hf_loss, luminance_loss
from .ssim import ssim_loss


@dataclass(frozen=True)
class PerceptualConfig:
    pixel_loss_weight: float = 1.0
    vgg_weight: float = 0.006
    pixel_loss_type: str = "l1"  # 'l1' | 'charbonnier'
    charbonnier_epsilon: float = 1e-6
    high_frequency_weight: float = 0.0
    lambda_lum: float = 0.0
    input_is_linear: bool = False


def make_perceptual_loss(
    cfg: PerceptualConfig, vgg_params=None
) -> Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray]:
    """Build criterion(output, target) -> scalar. NHWC float inputs.

    ``vgg_params`` defaults to :func:`losses.vgg.init_vgg16` (pretrained asset
    when available). Pass None with cfg.vgg_weight == 0 to skip VGG entirely.
    """
    if cfg.pixel_loss_type not in ("l1", "charbonnier"):
        raise ValueError(f"Invalid pixel_loss_type: {cfg.pixel_loss_type}")
    if vgg_params is None and cfg.vgg_weight > 0:
        vgg_params = vgg_mod.init_vgg16()

    def criterion(output: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
        if cfg.input_is_linear:
            # clamp to a small epsilon before the pow: d/dx x**(1/2.2) -> inf
            # at x=0, and ReLU-output models produce exact zeros on black
            # regions. The reference survives the same singularity only
            # because torch GradScaler skips inf-gradient steps; bf16
            # training has no scaler, so one black pixel would NaN the run.
            eps = 1e-6
            out_srgb = vgg_mod.normalize(
                jnp.clip(linear_to_srgb_approx(jnp.clip(output, eps, None)), 0.0, 1.0)
            )
            # the TARGET is deliberately NOT eps-clamped: no gradient flows
            # through it, pow(0) is an exact 0, and clamping would shift
            # true-black pixels by (1e-6)**(1/2.2) ~= 1.9e-3 (~0.48 after
            # the x255 VGG normalization) away from the reference's values
            # (loss_vgg.py:173 applies no clamp to the target)
            tgt_srgb = vgg_mod.normalize(linear_to_srgb_approx(target))
        else:
            out_srgb = vgg_mod.normalize(jnp.clip(output, 0.0, 1.0))
            tgt_srgb = vgg_mod.normalize(target)

        if cfg.pixel_loss_type == "l1":
            pixel = l1_loss(output, target)
        else:
            pixel = charbonnier_loss(output, target, cfg.charbonnier_epsilon)

        total = cfg.pixel_loss_weight * pixel
        if cfg.vgg_weight > 0:
            fo = vgg_mod.extract_features(vgg_params, out_srgb)
            ft = vgg_mod.extract_features(vgg_params, tgt_srgb)
            vgg_loss = sum(
                w * l1_loss(a, b)
                for w, a, b in zip(vgg_mod.TAP_WEIGHTS, fo, ft)
            )
            total = total + cfg.vgg_weight * vgg_loss
        if cfg.high_frequency_weight > 0:
            total = total + cfg.high_frequency_weight * laplacian_hf_loss(output, target)
        if cfg.lambda_lum > 0:
            total = total + cfg.lambda_lum * luminance_loss(out_srgb, tgt_srgb)
        return total

    return criterion


def build_criterion(loss_spec, vgg_params=None):
    """Resolve a models.LossSpec into a criterion function."""
    if loss_spec.kind == "perceptual":
        cfg = PerceptualConfig(
            pixel_loss_weight=loss_spec.pixel_loss_weight,
            vgg_weight=loss_spec.vgg_weight,
            pixel_loss_type=loss_spec.pixel_loss_type,
            high_frequency_weight=loss_spec.high_frequency_weight,
            lambda_lum=loss_spec.lambda_lum,
            input_is_linear=loss_spec.input_is_linear,
        )
        return make_perceptual_loss(cfg, vgg_params)
    if loss_spec.kind == "ssim":
        def criterion(output, target):
            return ssim_loss(
                output, target,
                pixel_loss_type=loss_spec.pixel_loss_type,
                pixel_loss_weight=loss_spec.pixel_loss_weight,
                ssim_weight=loss_spec.ssim_weight,
            )
        return criterion
    raise ValueError(f"Unknown loss kind: {loss_spec.kind}")
