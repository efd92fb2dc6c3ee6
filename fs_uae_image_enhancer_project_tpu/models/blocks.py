"""Reusable residual blocks, TPU-native.

- ResidualFeatureBlock: 1x1 -> kxk -> 1x1 bottleneck with 4 activation slots
  and identity add w/ optional 1x1 projection
  (reference residual_feature_block.py:5-56). The 'channel'/'global'
  num_parameters resolution (residual_feature_block.py:24-35) is applied at
  config time via :func:`resolve_block_acts`.
- ResidualDenseBlock: ESRGAN-style dense-concat convs + 1x1 fusion + local
  residual (reference residual_dense_block.py:142-183; orphaned upstream but
  part of the published API surface).
- TripletAttention: reconstruction of the missing ``triplet_attention``
  module imported by residual_dense_block.py:5 — the standard
  rotate-to-interact triplet attention (arXiv:2010.03045): three branches of
  Z-pool (max+mean over an axis) -> 7x7 conv -> sigmoid gate, averaged.
"""
from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

from ..ops.activations import apply_activation, init_activation
from ..ops.conv import conv2d, init_conv
from .configs import ActSpec

Params = Dict[str, Any]

DEFAULT_BLOCK_ACTS: Tuple[ActSpec, ActSpec, ActSpec, ActSpec] = (
    ("identity", ()),
    ("relu", ()),
    ("identity", ()),
    ("relu", ()),
)


def resolve_block_acts(
    acts: Tuple[ActSpec, ActSpec, ActSpec, ActSpec],
    mid_channels: int,
    out_channels: int,
) -> Tuple[ActSpec, ...]:
    """Resolve 'channel'/'global' num_parameters placeholders per slot:
    slots 1-2 see mid_channels, slots 3-4 out_channels
    (reference residual_feature_block.py:24-35)."""
    chans = (mid_channels, mid_channels, out_channels, out_channels)
    resolved = []
    for spec, ch in zip(acts, chans):
        name, items = spec
        cfg = dict(items)
        num = cfg.get("num_parameters")
        if num == "global":
            cfg["num_parameters"] = 1
        elif num == "channel":
            cfg["num_parameters"] = ch
        resolved.append((name, tuple(sorted(cfg.items()))))
    return tuple(resolved)


# ---------------------------------------------------------------------------
# ResidualFeatureBlock
# ---------------------------------------------------------------------------

def init_feature_block(
    key: jax.Array,
    in_channels: int,
    mid_channels: int,
    out_channels: int,
    kernel_size: int,
    acts: Tuple[ActSpec, ...] = DEFAULT_BLOCK_ACTS,
) -> Params:
    if kernel_size % 2 == 0:
        raise ValueError("kernel_size must be odd for symmetric padding")
    acts = resolve_block_acts(acts, mid_channels, out_channels)
    ks = jax.random.split(key, 8)
    p: Params = {
        "conv1": init_conv(ks[0], in_channels, mid_channels, 1),
        "conv2": init_conv(ks[1], mid_channels, mid_channels, kernel_size),
        "conv3": init_conv(ks[2], mid_channels, out_channels, 1),
    }
    for i, spec in enumerate(acts, start=1):
        p[f"act{i}"] = init_activation(ks[2 + i], spec[0], dict(spec[1]))
    if in_channels != out_channels:
        p["proj"] = init_conv(ks[7], in_channels, out_channels, 1)
    return p


def apply_feature_block(
    p: Params,
    x: jnp.ndarray,
    acts: Tuple[ActSpec, ...],
    mid_channels: int,
    out_channels: int,
) -> jnp.ndarray:
    """Forward per reference residual_feature_block.py:44-56:
    conv1 -> conv2 -> act1 -> act2 -> conv3 -> act3 -> (+identity/proj) -> act4."""
    acts = resolve_block_acts(acts, mid_channels, out_channels)
    identity = x
    x = conv2d(p["conv1"], x)
    x = conv2d(p["conv2"], x)
    x = apply_activation(acts[0][0], p["act1"], x, dict(acts[0][1]))
    x = apply_activation(acts[1][0], p["act2"], x, dict(acts[1][1]))
    x = conv2d(p["conv3"], x)
    x = apply_activation(acts[2][0], p["act3"], x, dict(acts[2][1]))
    if "proj" in p:
        identity = conv2d(p["proj"], identity)
    x = identity + x
    return apply_activation(acts[3][0], p["act4"], x, dict(acts[3][1]))


# ---------------------------------------------------------------------------
# TripletAttention (reconstruction of the missing module)
# ---------------------------------------------------------------------------

def init_triplet_attention(key: jax.Array, kernel_size: int = 7) -> Params:
    ks = jax.random.split(key, 3)
    return {
        # each branch: Z-pool (2ch) -> conv -> sigmoid
        "conv_cw": init_conv(ks[0], 2, 1, kernel_size, use_bias=False),
        "conv_hc": init_conv(ks[1], 2, 1, kernel_size, use_bias=False),
        "conv_hw": init_conv(ks[2], 2, 1, kernel_size, use_bias=False),
    }


def _zpool(x: jnp.ndarray) -> jnp.ndarray:
    """Concat of max and mean over the channel axis -> (..., 2)."""
    return jnp.concatenate(
        [jnp.max(x, axis=-1, keepdims=True), jnp.mean(x, axis=-1, keepdims=True)],
        axis=-1,
    )


def apply_triplet_attention(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    """Rotate-to-interact triplet attention over NHWC input."""
    # Branch 1: interact C and W (rotate H<->C): NHWC -> NCWH' where attn over (C,W)
    b1 = jnp.transpose(x, (0, 3, 2, 1))  # N, C, W, H (treat H as 'channels')
    g1 = jax.nn.sigmoid(conv2d(p["conv_cw"], _zpool(b1)))
    b1 = jnp.transpose(b1 * g1, (0, 3, 2, 1))
    # Branch 2: interact H and C (rotate W<->C)
    b2 = jnp.transpose(x, (0, 1, 3, 2))  # N, H, C, W
    g2 = jax.nn.sigmoid(conv2d(p["conv_hc"], _zpool(b2)))
    b2 = jnp.transpose(b2 * g2, (0, 1, 3, 2))
    # Branch 3: plain spatial attention over H, W
    g3 = jax.nn.sigmoid(conv2d(p["conv_hw"], _zpool(x)))
    b3 = x * g3
    return (b1 + b2 + b3) / 3.0


# ---------------------------------------------------------------------------
# ResidualDenseBlock
# ---------------------------------------------------------------------------

def init_dense_block(
    key: jax.Array,
    channels: int,
    growth: int = 32,
    num_layers: int = 4,
    kernel_size: int = 3,
    use_attention: bool = False,
) -> Params:
    ks = jax.random.split(key, num_layers + 2)
    p: Params = {}
    cin = channels
    for i in range(num_layers):
        p[f"conv{i + 1}"] = init_conv(ks[i], cin, growth, kernel_size)
        cin += growth
    p["fusion"] = init_conv(ks[num_layers], cin, channels, 1)
    if use_attention:
        p["attn"] = init_triplet_attention(ks[num_layers + 1])
    return p


def apply_dense_block(
    p: Params, x: jnp.ndarray, num_layers: int = 4, res_scale: float = 0.2
) -> jnp.ndarray:
    """Dense concat convs + 1x1 fusion + scaled local residual
    (reference residual_dense_block.py:142-183)."""
    feats = [x]
    for i in range(num_layers):
        h = conv2d(p[f"conv{i + 1}"], jnp.concatenate(feats, axis=-1))
        h = jax.nn.leaky_relu(h, negative_slope=0.2)
        feats.append(h)
    out = conv2d(p["fusion"], jnp.concatenate(feats, axis=-1))
    if "attn" in p:
        out = apply_triplet_attention(p["attn"], out)
    return x + res_scale * out
