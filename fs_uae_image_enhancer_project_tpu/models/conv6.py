"""Reconstruction of the reference's missing ``model_conv6`` module.

All three Optuna studies import it (optuna_study_opt_act.py:12) but the file
is absent from the reference repo. Its contract, recovered from call sites
(SURVEY §2 "Missing/phantom modules"; optuna_study_prune_act_r2.py:106-113):

- full-resolution float RGB in/out (no pixel shuffle),
- per-layer act1..4 slots with the same kwarg surface as model_pix_shuffle,
- default 36 channels, final layer outputs 3 channels,
- the NAS studies tune its activations per layer.

We realise it as the pix_shuffle topology minus the (un)shuffle pair: 7 convs,
residual adds after layers 2/4 with optional 1x1 projections, long skip from
layer 1 concatenated into layer 6, global identity residual + final ReLU.
"""
from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from ..ops.activations import apply_activation, init_activation
from ..ops.conv import conv2d, init_conv
from .configs import Conv6Config, ConvLayerSpec, act, act_config

Params = Dict[str, dict]


def default_config() -> Conv6Config:
    """Default 36-channel stack with the pix_shuffle default activations
    (model_pix_shuffle.py:20-69 defaults, which conv6 predates)."""
    return Conv6Config(
        layers=(
            ConvLayerSpec(36, 3, (act("identity"), act("relu"))),
            ConvLayerSpec(36, 3, (act("mish"), act("biased_relu"), act("tanh"), act("relu6"))),
            ConvLayerSpec(36, 3, (act("identity"), act("identity"))),
            ConvLayerSpec(36, 3, (act("telu"), act("leaky_relu"), act("tanh"), act("identity"))),
            ConvLayerSpec(36, 3, (act("identity"), act("identity"))),
            ConvLayerSpec(36, 3, (act("mish"), act("prelu"))),
            ConvLayerSpec(3, 3, (act("sinlu"), act("prelu"))),
        )
    )


def init(key: jax.Array, cfg: Conv6Config) -> Params:
    ks = jax.random.split(key, 32)
    L = cfg.layers
    chans = [l.out_channels for l in L]
    p: Params = {}
    p["conv1"] = init_conv(ks[0], cfg.in_channels, chans[0], L[0].kernel_size)
    p["conv2"] = init_conv(ks[1], chans[0], chans[1], L[1].kernel_size)
    p["conv3"] = init_conv(ks[2], chans[1], chans[2], L[2].kernel_size)
    p["conv4"] = init_conv(ks[3], chans[2], chans[3], L[3].kernel_size)
    p["conv5"] = init_conv(ks[4], chans[3], chans[4], L[4].kernel_size)
    p["conv6"] = init_conv(ks[5], chans[0] + chans[4], chans[5], L[5].kernel_size)
    p["conv7"] = init_conv(ks[6], chans[5], chans[6], L[6].kernel_size)
    if chans[0] != chans[1]:
        p["skip1_proj"] = init_conv(ks[7], chans[0], chans[1], 1, use_bias=False)
    if chans[2] != chans[3]:
        p["skip2_proj"] = init_conv(ks[8], chans[2], chans[3], 1, use_bias=False)
    k_idx = 9
    for li, layer in enumerate(L, start=1):
        for si, spec in enumerate(layer.acts, start=1):
            p[f"l{li}_act{si}"] = init_activation(ks[k_idx], spec[0], dict(spec[1]))
            k_idx += 1
    return p


def _acts(p: Params, cfg: Conv6Config, li: int, slots, x):
    for si in slots:
        spec = cfg.layers[li - 1].acts[si - 1]
        # .get: parameter-free slots may be absent from imported pytrees
        x = apply_activation(
            spec[0], p.get(f"l{li}_act{si}", {}), x, act_config(spec)
        )
    return x


def apply(p: Params, x: jnp.ndarray, cfg: Conv6Config) -> jnp.ndarray:
    identity = x
    x = conv2d(p["conv1"], x)
    x = _acts(p, cfg, 1, (1, 2), x)
    long_skip = x
    short = x
    x = conv2d(p["conv2"], x)
    x = _acts(p, cfg, 2, (1, 2), x)
    if "skip1_proj" in p:
        short = conv2d(p["skip1_proj"], short)
    x = short + x
    x = _acts(p, cfg, 2, (3, 4), x)
    x = conv2d(p["conv3"], x)
    x = _acts(p, cfg, 3, (1, 2), x)
    short = x
    x = conv2d(p["conv4"], x)
    x = _acts(p, cfg, 4, (1, 2), x)
    if "skip2_proj" in p:
        short = conv2d(p["skip2_proj"], short)
    x = short + x
    x = _acts(p, cfg, 4, (3, 4), x)
    x = conv2d(p["conv5"], x)
    x = _acts(p, cfg, 5, (1, 2), x)
    x = jnp.concatenate([long_skip, x], axis=-1)
    x = conv2d(p["conv6"], x)
    x = _acts(p, cfg, 6, (1, 2), x)
    x = conv2d(p["conv7"], x)
    x = _acts(p, cfg, 7, (1, 2), x)
    x = identity + x
    return jax.nn.relu(x)
