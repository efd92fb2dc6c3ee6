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

from typing import Any, Dict, Optional, Tuple

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

DENSE_DEFAULT_ACTS: Tuple[ActSpec, ActSpec] = (("relu", ()), ("identity", ()))


def resolve_dense_acts(
    acts: Tuple[ActSpec, ActSpec], growth: int
) -> Tuple[ActSpec, ...]:
    """'channel'/'global' num_parameters resolve against the growth rate —
    every dense conv outputs ``growth`` channels
    (residual_dense_block.py:94-103)."""
    resolved = []
    for name, items in acts:
        cfg = dict(items)
        num = cfg.get("num_parameters")
        if num == "global":
            cfg["num_parameters"] = 1
        elif num == "channel":
            cfg["num_parameters"] = growth
        resolved.append((name, tuple(sorted(cfg.items()))))
    return tuple(resolved)


def init_dense_block(
    key: jax.Array,
    in_channels: int,
    out_channels: Optional[int] = None,
    growth: int = 32,
    n_convs: int = 3,
    acts: Tuple[ActSpec, ActSpec] = DENSE_DEFAULT_ACTS,
    use_attention: bool = False,
    use_local_residual_learning: bool = True,
) -> Params:
    """ESRGAN-style RDB parameters (residual_dense_block.py:33-139):
    ``n_convs`` dense 3x3 convs (cin grows by ``growth`` each), two
    activation slots per conv (default relu+identity), 1x1 dense feature
    fusion to ``out_channels``, and — only when channel counts differ and
    local residual learning is on — a 1x1 residual adjustment conv."""
    out_channels = in_channels if out_channels is None else out_channels
    acts_r = resolve_dense_acts(acts, growth)
    ks = jax.random.split(key, 3 * n_convs + 3)
    p: Params = {}
    cin = in_channels
    for i in range(n_convs):
        p[f"conv{i + 1}"] = init_conv(ks[3 * i], cin, growth, 3)
        for j in (0, 1):
            spec = acts_r[j]
            p[f"l{i + 1}_act{j + 1}"] = init_activation(
                ks[3 * i + 1 + j], spec[0], dict(spec[1])
            )
        cin += growth
    p["fusion"] = init_conv(ks[3 * n_convs], cin, out_channels, 1)
    if use_attention:
        p["attn"] = init_triplet_attention(ks[3 * n_convs + 1])
    if use_local_residual_learning and in_channels != out_channels:
        p["adjust"] = init_conv(ks[3 * n_convs + 2], in_channels,
                                out_channels, 1)
    return p


def apply_dense_block(
    p: Params,
    x: jnp.ndarray,
    n_convs: int = 3,
    growth: Optional[int] = None,
    acts: Tuple[ActSpec, ActSpec] = DENSE_DEFAULT_ACTS,
) -> jnp.ndarray:
    """Dense-concat convs (two act slots each) -> triplet attention on the
    CONCATENATED features -> 1x1 fusion -> local residual through the 1x1
    adjustment conv (residual_dense_block.py:142-183).

    Residual quirk reproduced exactly: the reference adds the skip only via
    ``local_residual_adjustment`` (present when in!=out channels with local
    residual learning on); with matching channels the fusion output is
    returned with NO residual (residual_dense_block.py:129-137,:180-183).
    """
    if growth is None:
        growth = p["conv1"]["w"].shape[-1]
    acts_r = resolve_dense_acts(acts, growth)
    feats = [x]
    for i in range(n_convs):
        h = conv2d(p[f"conv{i + 1}"], jnp.concatenate(feats, axis=-1))
        for j in (0, 1):
            name, items = acts_r[j]
            h = apply_activation(name, p[f"l{i + 1}_act{j + 1}"], h,
                                 dict(items))
        feats.append(h)
    cat = jnp.concatenate(feats, axis=-1)
    if "attn" in p:
        cat = apply_triplet_attention(p["attn"], cat)
    out = conv2d(p["fusion"], cat)
    if "adjust" in p:
        out = out + conv2d(p["adjust"], x)
    return out
