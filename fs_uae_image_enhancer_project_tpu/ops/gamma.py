"""sRGB <-> linear transfer functions.

Mirrors the behaviour of the reference's ``model/gamma.py`` (exact piecewise,
gamma-2.2 approximation, cubic polynomial approximation) as pure jax functions.

TPU note: ``x ** 2.2`` lowers to exp/log transcendentals on the VPU. The
polynomial variants are 3 fused multiply-adds and are the fast path for the
deployed enhance function; the approx variants are kept for exact behavioural
parity with the reference training pipeline (srdataset.py:337-338 uses
``t**2.2``). All functions are dtype-preserving; compute in fp32 when parity
at >=50 dB PSNR matters (bf16 pow loses ~3 decimal digits).
"""
from __future__ import annotations

import jax.numpy as jnp


def srgb_to_linear(t):
    """Exact piecewise sRGB EOTF. t in [0, 1]. (reference gamma.py:3-11)."""
    return jnp.where(t <= 0.04045, t / 12.92, ((t + 0.055) / 1.055) ** 2.4)


def srgb_to_linear_approx(t):
    """Gamma-2.2 approximation (reference gamma.py:13-15)."""
    return t ** 2.2


def srgb_to_linear_poly(t):
    """Cubic polynomial approximation (reference gamma.py:17-19)."""
    return 0.012522878 * t**3 + 0.682171111 * t**2 + 0.305306011 * t


def linear_to_srgb(t):
    """Exact piecewise inverse sRGB EOTF. t in [0, 1]. (reference gamma.py:21-29)."""
    return jnp.where(t <= 0.0031308, t * 12.92, 1.055 * (t ** (1.0 / 2.4)) - 0.055)


def linear_to_srgb_approx(t):
    """Gamma-1/2.2 approximation (reference gamma.py:31-33)."""
    return t ** (1.0 / 2.2)


def linear_to_srgb_poly(t):
    """Cubic polynomial approximation (reference gamma.py:35-37)."""
    return 0.585122381 * t**3 - 0.164759123 * t**2 + 0.579636742 * t
