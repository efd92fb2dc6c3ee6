"""The production pix_shuffle super-resolution model, TPU-native.

Re-designed from reference ``model/model_pix_shuffle.py`` (the current
production model, reference README.md:14): 7 SAME convs sandwiched between
PixelUnshuffle(2)/PixelShuffle(2) so the stack runs at half resolution on
4x channels (model_pix_shuffle.py:118, :170); per-layer dual/quad activation
slots; residual adds after conv2/conv4 with optional 1x1 bias-free projection
(:126-128, :143-145, :250-255, :268-274); long skip from layer 1 concatenated
into layer 6 (:241, :282); global identity residual + final ReLU (:295-296).

TPU-first realisation: NHWC layout, pure function over a parameter pytree,
fp32 params / caller-chosen compute dtype (bf16 for speed, fp32 for parity),
lax convs that XLA tiles onto the MXU, (un)shuffle as fused reshape/transpose.
"""
from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from ..ops.activations import apply_activation, init_activation
from ..ops.conv import conv2d, init_conv
from ..ops.pixel_shuffle import pixel_shuffle, pixel_unshuffle
from .configs import ActSpec, ConvLayerSpec, PixShuffleConfig, act, act_config

Params = Dict[str, dict]

# Activation slot counts per layer (model_pix_shuffle.py:122-167)
SLOTS = (2, 4, 2, 4, 2, 2, 2)


def lightweight_config() -> PixShuffleConfig:
    """The trained production config (model_pix_shuffle.py:304-311)."""
    return PixShuffleConfig(
        layers=(
            ConvLayerSpec(36, 3, (act("sinlu"), act("relu6"))),
            ConvLayerSpec(
                36, 3,
                (act("telu"), act("identity"), act("sinlu"),
                 act("biased_prelu", num_parameters=36)),
            ),
            ConvLayerSpec(72, 3, (act("identity"), act("identity"))),
            ConvLayerSpec(
                72, 3,
                (act("mish"), act("biased_prelu", num_parameters=72),
                 act("tanh"), act("relu")),
            ),
            ConvLayerSpec(36, 3, (act("identity"), act("identity"))),
            ConvLayerSpec(36, 3, (act("mish"), act("relu6"))),
            # layer 7 has no out_channels knob: always 3 * factor^2 = 12
            ConvLayerSpec(12, 3, (act("identity"), act("biased_prelu", num_parameters=1))),
        )
    )


def heavyweight_config() -> PixShuffleConfig:
    """Default-act heavy variant (model_pix_shuffle.py:312-313)."""
    return PixShuffleConfig(
        layers=(
            ConvLayerSpec(36, 3, (act("identity"), act("relu"))),
            ConvLayerSpec(
                36, 3,
                (act("mish"), act("biased_relu"), act("tanh"), act("relu6")),
            ),
            ConvLayerSpec(108, 3, (act("identity"), act("identity"))),
            ConvLayerSpec(
                108, 3,
                (act("telu"), act("leaky_relu"), act("tanh"), act("identity")),
            ),
            ConvLayerSpec(36, 3, (act("identity"), act("identity"))),
            ConvLayerSpec(36, 3, (act("mish"), act("prelu"))),
            ConvLayerSpec(12, 3, (act("sinlu"), act("prelu"))),
        )
    )


def init(key: jax.Array, cfg: PixShuffleConfig) -> Params:
    ks = jax.random.split(key, 32)
    L = cfg.layers
    c_in = cfg.unshuffled_channels  # 12
    chans = [l.out_channels for l in L]
    params: Params = {}
    params["conv1"] = init_conv(ks[0], c_in, chans[0], L[0].kernel_size)
    params["conv2"] = init_conv(ks[1], chans[0], chans[1], L[1].kernel_size)
    params["conv3"] = init_conv(ks[2], chans[1], chans[2], L[2].kernel_size)
    params["conv4"] = init_conv(ks[3], chans[2], chans[3], L[3].kernel_size)
    params["conv5"] = init_conv(ks[4], chans[3], chans[4], L[4].kernel_size)
    # layer 6 concatenates layer-1 features with layer-5 output (:160)
    params["conv6"] = init_conv(ks[5], chans[0] + chans[4], chans[5], L[5].kernel_size)
    params["conv7"] = init_conv(ks[6], chans[5], cfg.unshuffled_channels, L[6].kernel_size)
    # skip projections, 1x1 bias-free, only when channels differ (:126-128, :143-145)
    if chans[0] != chans[1]:
        params["skip1_proj"] = init_conv(ks[7], chans[0], chans[1], 1, use_bias=False)
    if chans[2] != chans[3]:
        params["skip2_proj"] = init_conv(ks[8], chans[2], chans[3], 1, use_bias=False)
    # activation slots
    k_idx = 9
    for li, layer in enumerate(L, start=1):
        for si, spec in enumerate(layer.acts, start=1):
            name, cfg_items = spec
            params[f"l{li}_act{si}"] = init_activation(
                ks[k_idx], name, dict(cfg_items)
            )
            k_idx += 1
    return params


def _acts(params: Params, cfg: PixShuffleConfig, li: int, slots, x):
    for si in slots:
        spec: ActSpec = cfg.layers[li - 1].acts[si - 1]
        # .get: parameter-free slots may be absent from imported pytrees
        x = apply_activation(
            spec[0], params.get(f"l{li}_act{si}", {}), x, act_config(spec)
        )
    return x


def apply_with_intermediates(
    params: Params, x: jnp.ndarray, cfg: PixShuffleConfig
):
    """Forward pass that also returns tagged per-layer activations.

    Counterpart of the reference's ``model.save`` internal-activation dump
    hook (train.py:278-301): the trainer renders these as images for
    debugging. Returns (y, {tag: tensor}).
    """
    captured = {}

    def tap(tag, t):
        captured[tag] = t
        return t

    y = _forward(params, x, cfg, tap)
    return y, captured


def apply(params: Params, x: jnp.ndarray, cfg: PixShuffleConfig) -> jnp.ndarray:
    """Forward pass. x: (N, H, W, 3) linear-light float in [0, 1]-ish range.

    Mirrors reference forward (model_pix_shuffle.py:227-298) exactly.
    """
    return _forward(params, x, cfg, lambda _tag, t: t)


def _forward(params: Params, x: jnp.ndarray, cfg: PixShuffleConfig, tap):
    identity = x
    x = pixel_unshuffle(x, cfg.shuffle_factor)
    # Layer 1
    x = conv2d(params["conv1"], x)
    x = tap("layer1", _acts(params, cfg, 1, (1, 2), x))
    long_skip = x
    # Layer 2 with residual add
    short = x
    x = conv2d(params["conv2"], x)
    x = _acts(params, cfg, 2, (1, 2), x)
    if "skip1_proj" in params:
        short = conv2d(params["skip1_proj"], short)
    x = short + x
    x = tap("layer2", _acts(params, cfg, 2, (3, 4), x))
    # Layer 3
    x = conv2d(params["conv3"], x)
    x = tap("layer3", _acts(params, cfg, 3, (1, 2), x))
    # Layer 4 with residual add
    short = x
    x = conv2d(params["conv4"], x)
    x = _acts(params, cfg, 4, (1, 2), x)
    if "skip2_proj" in params:
        short = conv2d(params["skip2_proj"], short)
    x = short + x
    x = tap("layer4", _acts(params, cfg, 4, (3, 4), x))
    # Layer 5
    x = conv2d(params["conv5"], x)
    x = tap("layer5", _acts(params, cfg, 5, (1, 2), x))
    # Layer 6 — concat long skip (channel axis is trailing in NHWC)
    x = jnp.concatenate([long_skip, x], axis=-1)
    x = conv2d(params["conv6"], x)
    x = tap("layer6", _acts(params, cfg, 6, (1, 2), x))
    # Layer 7
    x = conv2d(params["conv7"], x)
    x = tap("layer7", _acts(params, cfg, 7, (1, 2), x))
    # Back to full resolution; global residual; clamp negatives (:293-296)
    x = pixel_shuffle(x, cfg.shuffle_factor)
    x = identity + x
    return jax.nn.relu(x)
