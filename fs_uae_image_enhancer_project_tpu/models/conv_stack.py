"""conv3 / conv5 family: Conv-BN-ReLU stacks, TPU-native.

Re-designed from reference ``model/model_conv3.py`` (3 bias-free convs + BN +
ReLU, no skips) and ``model/model_conv5.py`` (5 layers, residual adds at
layers 2 and 4 applied before the activation, Sigmoid output,
model_conv5.py:122-151).

Both models train on float RGB and deploy fused (conv+BN folded) — see
:func:`fuse` — mirroring the reference's fuse_layers step
(model_conv3.py:58-99). conv3 additionally carries the deployment-side uint8
RGBA contract (model_conv3.py:102-155): uint8 RGBA in, alpha stripped, /255,
model, x255, alpha=255 re-attached; exposed here as :func:`apply_uint8_rgba`.
"""
from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from ..ops.conv import (
    batchnorm_inference,
    batchnorm_train,
    conv2d,
    fuse_conv_bn,
    init_batchnorm,
    init_conv,
)
from .configs import ConvStackConfig

Params = Dict[str, dict]


def conv3_config(variant: str = "lightweight") -> ConvStackConfig:
    """model_conv3.py:206-211 — lightweight 32/64, heavyweight 192/256."""
    ch = (32, 64) if variant == "lightweight" else (192, 256)
    return ConvStackConfig(
        channels=(ch[0], ch[1], 3), kernel_size=3, residual_layers=(),
        final_act="none", uint8_rgba_contract=True,
    )


def conv5_config(variant: str = "lightweight") -> ConvStackConfig:
    """model_conv5.py:157-162 — lightweight 32/64, heavyweight 64/128.

    Channel plan per model_conv5.py:42-62: c1, c1, c2, c2, 3 with residual
    adds at layers 2 and 4 (0-based 1 and 3).
    """
    c1, c2 = (32, 64) if variant == "lightweight" else (64, 128)
    return ConvStackConfig(
        channels=(c1, c1, c2, c2, 3), kernel_size=3, residual_layers=(1, 3),
        final_act="sigmoid",
    )


def init(key: jax.Array, cfg: ConvStackConfig, in_channels: int = 3) -> Params:
    ks = jax.random.split(key, len(cfg.channels))
    params: Params = {}
    cin = in_channels
    for i, cout in enumerate(cfg.channels):
        params[f"conv{i + 1}"] = init_conv(
            ks[i], cin, cout, cfg.kernel_size, use_bias=False
        )
        params[f"bn{i + 1}"] = init_batchnorm(cout)
        cin = cout
    return params


def apply(
    params: Params,
    x: jnp.ndarray,
    cfg: ConvStackConfig,
    *,
    train: bool = False,
) -> jnp.ndarray | Tuple[jnp.ndarray, Params]:
    """Float RGB forward. NHWC in/out. If ``train``, also returns updated
    batchnorm running stats (functional counterpart of torch's in-place
    running-stat mutation)."""
    new_stats: Params = {}
    n_layers = len(cfg.channels)
    for i in range(n_layers):
        li = i + 1
        skip = x if i in cfg.residual_layers else None
        x = conv2d(params[f"conv{li}"], x)
        bn_key = f"bn{li}"
        if bn_key in params:
            if train:
                x, new_stats[bn_key] = batchnorm_train(params[bn_key], x)
            else:
                x = batchnorm_inference(params[bn_key], x)
        if skip is not None:
            x = skip + x  # residual add before activation (model_conv5.py:131)
        is_last = i == n_layers - 1
        if not is_last:
            x = jax.nn.relu(x)
        elif cfg.final_act == "sigmoid":
            x = jax.nn.sigmoid(x)
    if train:
        return x, new_stats
    return x


def fuse(params: Params, cfg: ConvStackConfig) -> Params:
    """Fold each BN into its conv: the deployment-form parameter pytree."""
    fused: Params = {}
    for i in range(len(cfg.channels)):
        li = i + 1
        conv = params[f"conv{li}"]
        bn = params.get(f"bn{li}")
        fused[f"conv{li}"] = fuse_conv_bn(conv, bn) if bn is not None else dict(conv)
    return fused


def apply_fused(
    params: Params,
    x: jnp.ndarray,
    cfg: ConvStackConfig,
    *,
    relu_before_residual_add: bool = False,
) -> jnp.ndarray:
    """Forward with BN already folded into the convs.

    ``relu_before_residual_add=True`` reproduces the reference's *deployed*
    conv5 semantics: torch fuse_modules merged conv+bn+relu into one unit, so
    the exported graph applies ReLU before the skip add instead of after
    (training order is add-then-relu, model_conv5.py:128-144; the shipped
    ONNX graphs are Conv->Relu->Add)."""
    n_layers = len(cfg.channels)
    for i in range(n_layers):
        skip = x if i in cfg.residual_layers else None
        x = conv2d(params[f"conv{i + 1}"], x)
        is_last = i == n_layers - 1
        if relu_before_residual_add:
            if not is_last:
                x = jax.nn.relu(x)
            elif cfg.final_act == "sigmoid":
                x = jax.nn.sigmoid(x)
            if skip is not None:
                x = skip + x
        else:
            if skip is not None:
                x = skip + x
            if not is_last:
                x = jax.nn.relu(x)
            elif cfg.final_act == "sigmoid":
                x = jax.nn.sigmoid(x)
    return x


def apply_uint8_rgba(params: Params, x_rgba: jnp.ndarray, cfg: ConvStackConfig) -> jnp.ndarray:
    """conv3's deployment forward contract (model_conv3.py:102-155).

    uint8 RGBA NHWC in -> float RGBA NHWC out scaled to [0, 255] with
    alpha=255. Raises at trace time if the input violates the contract.
    """
    if x_rgba.dtype != jnp.uint8 or x_rgba.shape[-1] != 4:
        raise ValueError("Input tensor must be uint8 with 4 channels (RGBA)")
    if any(k.startswith("bn") for k in params):
        # unfused training params: apply_fused would silently run bias-free
        # convs with BatchNorm never applied (garbage pixels, no error)
        raise ValueError(
            "apply_uint8_rgba expects FUSED deployment params; call "
            "conv_stack.fuse(params, cfg) first (the pytree still has bn* "
            "entries)"
        )
    rgb = x_rgba[..., :3].astype(jnp.float32) / 255.0
    y = apply_fused(params, rgb, cfg) * 255.0
    alpha = jnp.full(y.shape[:-1] + (1,), 255.0, y.dtype)
    return jnp.concatenate([y, alpha], axis=-1)
