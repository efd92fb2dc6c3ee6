"""Pixel (un)shuffle as NHWC reshape/transpose — free under XLA fusion.

The reference uses torch ``nn.PixelUnshuffle(2)`` / ``nn.PixelShuffle(2)``
around the pix_shuffle conv stack (model_pix_shuffle.py:118, :170) and in the
residual U-Net stages (model_residual_unet.py:59-61, :115). Torch operates on
NCHW with output channel blocks ordered (C, ry, rx); on TPU we are NHWC, where
the natural space_to_depth ordering would be (ry, rx, C). We deliberately keep
torch's (C, ry, rx) channel ordering so convolution weights imported from
reference checkpoints/ONNX apply without channel permutation. XLA lowers both
orderings to the same copy cost, so there is no performance penalty.
"""
from __future__ import annotations

import jax.numpy as jnp


def pixel_unshuffle(x: jnp.ndarray, factor: int = 2) -> jnp.ndarray:
    """NHWC pixel-unshuffle (space_to_depth with torch channel ordering).

    (N, H*r, W*r, C) -> (N, H, W, C*r*r), where output channel index
    ``c*r*r + ry*r + rx`` holds input ``[..., h*r+ry, w*r+rx, c]`` — identical
    to torch.nn.PixelUnshuffle on NCHW.
    """
    n, hr, wr, c = x.shape
    r = factor
    if hr % r or wr % r:
        raise ValueError(f"spatial dims {(hr, wr)} not divisible by factor {r}")
    h, w = hr // r, wr // r
    # (N, H, ry, W, rx, C) -> (N, H, W, C, ry, rx) -> (N, H, W, C*r*r)
    x = x.reshape(n, h, r, w, r, c)
    x = x.transpose(0, 1, 3, 5, 2, 4)
    return x.reshape(n, h, w, c * r * r)


def pixel_shuffle(x: jnp.ndarray, factor: int = 2) -> jnp.ndarray:
    """NHWC pixel-shuffle (depth_to_space with torch channel ordering).

    (N, H, W, C*r*r) -> (N, H*r, W*r, C). Inverse of :func:`pixel_unshuffle`.
    """
    n, h, w, crr = x.shape
    r = factor
    if crr % (r * r):
        raise ValueError(f"channels {crr} not divisible by factor^2 {r * r}")
    c = crr // (r * r)
    # (N, H, W, C, ry, rx) -> (N, H, ry, W, rx, C)
    x = x.reshape(n, h, w, c, r, r)
    x = x.transpose(0, 1, 4, 2, 5, 3)
    return x.reshape(n, h * r, w * r, c)
