"""Residual U-Net, TPU-native.

Re-designed from reference ``model/model_residual_unet.py:10-243``:
PixelUnshuffle(2)/PixelShuffle(2) down/up stages, ResidualFeatureBlock stacks
per level with channels ``base * 2^d``, skip concatenation (original input at
the top level), final ReLU. Spatial pad-fix on odd sizes
(model_residual_unet.py:221-231) is unnecessary here because the framework
pins input sizes divisible by 2^depth (the deployed 736x576 frame divides
cleanly for depth <= 4); an assert enforces it.
"""
from __future__ import annotations

from typing import Dict, List

import jax
import jax.numpy as jnp

from ..ops.conv import conv2d, init_conv
from ..ops.pixel_shuffle import pixel_shuffle, pixel_unshuffle
from .blocks import apply_feature_block, init_feature_block
from .configs import ResidualUNetConfig

Params = Dict[str, dict]


def lightweight_config() -> ResidualUNetConfig:
    """model_residual_unet.py:277-279."""
    return ResidualUNetConfig(
        unet_depth=3, blocks_per_level=1, base_channels=36,
        internal_block_channels_ratio=1.50,
    )


def heavyweight_config() -> ResidualUNetConfig:
    """model_residual_unet.py:280-281."""
    return ResidualUNetConfig(
        unet_depth=4, blocks_per_level=4, base_channels=72,
        internal_block_channels_ratio=1.50,
    )


def _mid(cfg: ResidualUNetConfig, out_ch: int) -> int:
    return max(1, int(out_ch * cfg.internal_block_channels_ratio))


def _level_channels(cfg: ResidualUNetConfig) -> List[int]:
    """Encoder block output channels per level d=0..depth-1."""
    return [cfg.base_channels * (2 ** d) for d in range(cfg.unet_depth)]


def init(key: jax.Array, cfg: ResidualUNetConfig) -> Params:
    ks = iter(jax.random.split(key, 256))
    p: Params = {}
    lc = _level_channels(cfg)
    # stem: PixelUnshuffle(2) + 1x1 conv in*4 -> base (:59-61)
    p["stem"] = init_conv(next(ks), cfg.input_channels * 4, cfg.base_channels, 1)
    # encoder level 0
    cin = cfg.base_channels
    for i in range(cfg.blocks_per_level):
        p[f"enc0_block{i}"] = init_feature_block(
            next(ks), cin if i == 0 else lc[0], _mid(cfg, lc[0]), lc[0], 3, cfg.acts
        )
    # encoder levels 1..depth-1: unshuffle then blocks (:80-95)
    for d in range(1, cfg.unet_depth):
        cin = lc[d - 1] * 4
        for i in range(cfg.blocks_per_level):
            p[f"enc{d}_block{i}"] = init_feature_block(
                next(ks), cin if i == 0 else lc[d], _mid(cfg, lc[d]), lc[d], 3, cfg.acts
            )
    # bottleneck (:97-106)
    bc = lc[-1]
    for i in range(cfg.blocks_per_level):
        p[f"bottleneck_block{i}"] = init_feature_block(
            next(ks), bc, _mid(cfg, bc), bc, 3, cfg.acts
        )
    # decoder (:108-146); stage i corresponds to d_val = depth-1-i
    cur = bc
    for i in range(cfg.unet_depth):
        d_val = cfg.unet_depth - 1 - i
        up_ch = cur // 4
        skip_ch = cfg.input_channels if d_val == 0 else lc[d_val - 1]
        cin = up_ch + skip_ch
        if d_val == 0:
            p["dec_final"] = init_conv(next(ks), cin, cfg.output_channels, 1)
            cur = cfg.output_channels
        else:
            out_ch = cfg.base_channels * (2 ** d_val)
            for j in range(cfg.blocks_per_level):
                p[f"dec{i}_block{j}"] = init_feature_block(
                    next(ks), cin if j == 0 else out_ch, _mid(cfg, out_ch), out_ch, 3, cfg.acts
                )
            cur = out_ch
    return p


def apply(p: Params, x: jnp.ndarray, cfg: ResidualUNetConfig) -> jnp.ndarray:
    n, h, w, _ = x.shape
    factor = 2 ** cfg.unet_depth
    if h % factor or w % factor:
        raise ValueError(
            f"input {h}x{w} must be divisible by 2^depth={factor} "
            "(deployed frames are cropped to 736x576)"
        )
    lc = _level_channels(cfg)
    original = x
    x = pixel_unshuffle(x, 2)
    x = conv2d(p["stem"], x)
    enc_feats = []
    for i in range(cfg.blocks_per_level):
        x = apply_feature_block(p[f"enc0_block{i}"], x, cfg.acts, _mid(cfg, lc[0]), lc[0])
    enc_feats.append(x)
    for d in range(1, cfg.unet_depth):
        x = pixel_unshuffle(x, 2)
        for i in range(cfg.blocks_per_level):
            x = apply_feature_block(p[f"enc{d}_block{i}"], x, cfg.acts, _mid(cfg, lc[d]), lc[d])
        enc_feats.append(x)
    bc = lc[-1]
    for i in range(cfg.blocks_per_level):
        x = apply_feature_block(p[f"bottleneck_block{i}"], x, cfg.acts, _mid(cfg, bc), bc)
    for i in range(cfg.unet_depth):
        d_val = cfg.unet_depth - 1 - i
        x = pixel_shuffle(x, 2)
        skip = original if d_val == 0 else enc_feats[d_val - 1]
        x = jnp.concatenate([x, skip], axis=-1)
        if d_val == 0:
            x = conv2d(p["dec_final"], x)
        else:
            out_ch = cfg.base_channels * (2 ** d_val)
            for j in range(cfg.blocks_per_level):
                x = apply_feature_block(
                    p[f"dec{i}_block{j}"], x, cfg.acts, _mid(cfg, out_ch), out_ch
                )
    return jax.nn.relu(x)
