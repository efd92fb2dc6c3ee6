"""NHWC 2-D convolution primitives for the model zoo.

All convs in the reference are stride-1, SAME-padded, odd-kernel Conv2d
(model_pix_shuffle.py:121-165, model_conv3.py:41-51, model_conv5.py:42-62).
Here they are ``lax.conv_general_dilated`` with TPU-native
(NHWC, HWIO, NHWC) dimension numbers so XLA tiles them onto the MXU.

Parameter convention: ``{"w": (kh, kw, cin, cout) HWIO, "b": (cout,)}`` with
fp32 storage; compute dtype (bf16 for training/inference speed) is chosen by
the caller via ``x.dtype`` — weights are cast to match. bf16 accumulation
stays fp32 because that is what the TPU MXU lowering does natively — NOT via
``preferred_element_type``, which is deliberately omitted: specifying an
output dtype different from the input dtype breaks jax 0.9's conv transpose
rule under ``jax.grad`` (see conv2d's docstring and CLAUDE.md).

Weight init mirrors torch.nn.Conv2d defaults (kaiming_uniform with a=sqrt(5),
i.e. U(-1/sqrt(fan_in), 1/sqrt(fan_in)) for both weight and bias) so that
from-scratch training matches the reference's dynamics.
"""
from __future__ import annotations

import math
from typing import Dict, Optional

import jax
import jax.numpy as jnp
from jax import lax

Params = Dict[str, jnp.ndarray]

DIMENSION_NUMBERS = ("NHWC", "HWIO", "NHWC")


def init_conv(
    key: jax.Array,
    cin: int,
    cout: int,
    kernel_size: int = 3,
    use_bias: bool = True,
    dtype=jnp.float32,
) -> Params:
    """Initialize conv params with torch.nn.Conv2d's default scheme."""
    kw = key if not use_bias else jax.random.split(key, 2)
    fan_in = cin * kernel_size * kernel_size
    bound_w = math.sqrt(6.0 / ((1.0 + 5.0) * fan_in))  # kaiming_uniform a=sqrt(5)
    w_key = kw if not use_bias else kw[0]
    w = jax.random.uniform(
        w_key, (kernel_size, kernel_size, cin, cout), dtype, -bound_w, bound_w
    )
    params: Params = {"w": w}
    if use_bias:
        bound_b = 1.0 / math.sqrt(fan_in)
        params["b"] = jax.random.uniform(kw[1], (cout,), dtype, -bound_b, bound_b)
    return params


def conv2d(
    params: Params,
    x: jnp.ndarray,
    *,
    padding: str = "SAME",
) -> jnp.ndarray:
    """Stride-1 NHWC conv with optional bias.

    Output dtype matches input dtype. XLA's TPU lowering accumulates bf16
    convolutions in fp32 on the MXU regardless, so no explicit
    preferred_element_type is needed (and specifying one that differs from
    the input dtype breaks the conv transpose rule under jax.grad).
    """
    w = params["w"].astype(x.dtype)
    y = lax.conv_general_dilated(
        x,
        w,
        window_strides=(1, 1),
        padding=padding,
        dimension_numbers=DIMENSION_NUMBERS,
        # Full input precision: fp32 inputs multiply in fp32 (not split bf16);
        # bf16 inputs still take the fast MXU path with fp32 accumulation.
        precision=lax.Precision.HIGHEST,
    )
    b = params.get("b")
    if b is not None:
        y = y + b.astype(y.dtype)
    return y


def depthwise_conv2d(
    kernel: jnp.ndarray, x: jnp.ndarray, *, padding: str = "SAME"
) -> jnp.ndarray:
    """Depthwise conv with a single shared (kh, kw) kernel across channels.

    Used for the Laplacian high-frequency loss filter
    (reference loss_vgg.py:119-123, :150-167).
    """
    c = x.shape[-1]
    kh, kw = kernel.shape
    w = jnp.broadcast_to(kernel.reshape(kh, kw, 1, 1), (kh, kw, 1, c)).astype(x.dtype)
    return lax.conv_general_dilated(
        x,
        w,
        window_strides=(1, 1),
        padding=padding,
        dimension_numbers=DIMENSION_NUMBERS,
        feature_group_count=c,
        precision=lax.Precision.HIGHEST,
    )


def init_batchnorm(c: int, dtype=jnp.float32) -> Params:
    """BatchNorm2d params + running stats (torch defaults)."""
    return {
        "scale": jnp.ones((c,), dtype),
        "bias": jnp.zeros((c,), dtype),
        "mean": jnp.zeros((c,), dtype),
        "var": jnp.ones((c,), dtype),
    }


def batchnorm_inference(params: Params, x: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    """Inference-mode batchnorm over NHWC channel axis using running stats."""
    inv = lax.rsqrt(params["var"].astype(jnp.float32) + eps)
    scale = (params["scale"].astype(jnp.float32) * inv).astype(x.dtype)
    shift = (
        params["bias"].astype(jnp.float32)
        - params["mean"].astype(jnp.float32) * params["scale"].astype(jnp.float32) * inv
    ).astype(x.dtype)
    return x * scale + shift


def batchnorm_train(
    params: Params, x: jnp.ndarray, momentum: float = 0.1, eps: float = 1e-5
):
    """Training-mode batchnorm: returns (y, updated running stats).

    Batch statistics over (N, H, W); running stats updated with torch's
    convention ``running = (1 - momentum) * running + momentum * batch`` and
    unbiased variance for the running update.
    """
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=(0, 1, 2))
    var = jnp.var(xf, axis=(0, 1, 2))
    n = x.shape[0] * x.shape[1] * x.shape[2]
    unbiased = var * (n / max(n - 1, 1))
    inv = lax.rsqrt(var + eps)
    y = ((xf - mean) * inv * params["scale"] + params["bias"]).astype(x.dtype)
    new_stats = {
        "scale": params["scale"],
        "bias": params["bias"],
        "mean": (1 - momentum) * params["mean"] + momentum * mean,
        "var": (1 - momentum) * params["var"] + momentum * unbiased,
    }
    return y, new_stats


def fuse_conv_bn(conv: Params, bn: Params, eps: float = 1e-5) -> Params:
    """Fold batchnorm into conv weights for deployment.

    TPU-native analogue of the reference's ``fuse_layers`` /
    torch.ao.quantization.fuse_modules step (model_conv3.py:58-99): the
    deployed graph carries a single conv per layer.
    """
    w = conv["w"].astype(jnp.float32)
    b = conv.get("b")
    b = jnp.zeros((w.shape[-1],), jnp.float32) if b is None else b.astype(jnp.float32)
    inv = jax.lax.rsqrt(bn["var"].astype(jnp.float32) + eps)
    gamma = bn["scale"].astype(jnp.float32)
    beta = bn["bias"].astype(jnp.float32)
    mean = bn["mean"].astype(jnp.float32)
    w_f = w * (gamma * inv).reshape(1, 1, 1, -1)
    b_f = beta + (b - mean) * gamma * inv
    return {"w": w_f, "b": b_f}
