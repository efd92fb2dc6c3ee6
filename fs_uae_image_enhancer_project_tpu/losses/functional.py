"""Pixel-space loss primitives.

Counterparts of reference loss functions: charbonnier (loss_vgg.py:10-33),
Laplacian high-frequency L1 (loss_vgg.py:119-123, :150-167), YCbCr luminance
L1 (loss_vgg.py:192-197, kornia convention), plus plain L1.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..ops.conv import depthwise_conv2d

# numpy on purpose: a module-scope jnp.array would initialize the JAX
# backend at import time, pinning the platform before a CLI's
# honor_jax_platforms_env() can run (the platform cannot change after
# first backend use — CLAUDE.md). laplacian_hf_loss casts per call.
LAPLACIAN_KERNEL = np.array(
    [[0.0, 1.0, 0.0], [1.0, -4.0, 1.0], [0.0, 1.0, 0.0]], np.float32
)


def l1_loss(output: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean(jnp.abs(output - target))


def charbonnier_loss(
    output: jnp.ndarray, target: jnp.ndarray, epsilon: float = 1e-6
) -> jnp.ndarray:
    """sqrt((o-t)^2 + eps^2), mean reduction (loss_vgg.py:10-33)."""
    if output.shape != target.shape:
        raise ValueError(
            f"Output and target must share a shape: {output.shape} vs {target.shape}"
        )
    return jnp.mean(jnp.sqrt((output - target) ** 2 + epsilon**2))


def laplacian_hf_loss(output: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """L1 between depthwise-Laplacian-filtered output and target (NHWC)."""
    k = LAPLACIAN_KERNEL.astype(output.dtype)
    return l1_loss(depthwise_conv2d(k, output), depthwise_conv2d(k, target))


def rgb_to_ycbcr(x: jnp.ndarray) -> jnp.ndarray:
    """kornia.color.rgb_to_ycbcr convention on NHWC [0,1] input."""
    r, g, b = x[..., 0], x[..., 1], x[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = (b - y) * 0.564 + 0.5
    cr = (r - y) * 0.713 + 0.5
    return jnp.stack([y, cb, cr], axis=-1)


def luminance_loss(output: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """L1 over the Y channel only (loss_vgg.py:192-197)."""
    return l1_loss(rgb_to_ycbcr(output)[..., 0], rgb_to_ycbcr(target)[..., 0])
