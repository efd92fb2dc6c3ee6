"""Model zoo registry.

``get_model(name, variant)`` returns a :class:`ModelDef` — the functional
counterpart of the reference's per-file ``get_model`` factories
(model_pix_shuffle.py:304, model_conv3.py:206, model_conv5.py:157,
model_residual_unet.py:277) plus the reconstructed conv6.

Every ModelDef bundles: a frozen config, ``init(key) -> params``,
``apply(params, x) -> y`` (NHWC float, linear light unless noted) and the
model's training criterion spec (resolved by ``losses.build_criterion``).
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Callable, Dict, NamedTuple

import jax
import jax.numpy as jnp

from . import blocks, conv6, conv_stack, pix_shuffle, residual_unet  # noqa: F401
from .configs import (  # noqa: F401
    ActSpec,
    Conv6Config,
    ConvLayerSpec,
    ConvStackConfig,
    PixShuffleConfig,
    ResidualUNetConfig,
    act,
    config_from_json,
    config_to_json,
)


@dataclasses.dataclass(frozen=True)
class LossSpec:
    """Which criterion a model trains with (resolved in losses/)."""

    kind: str  # 'perceptual' | 'ssim'
    pixel_loss_weight: float = 1.0
    vgg_weight: float = 0.0
    pixel_loss_type: str = "l1"  # 'l1' | 'charbonnier'
    high_frequency_weight: float = 0.0
    lambda_lum: float = 0.0
    input_is_linear: bool = False
    ssim_weight: float = 0.0


class ModelDef(NamedTuple):
    name: str
    variant: str
    config: Any
    init: Callable[[jax.Array], Dict]
    apply: Callable[[Dict, jnp.ndarray], jnp.ndarray]
    loss: LossSpec
    # True if apply() expects/returns linear-light RGB (pix_shuffle family);
    # False for sRGB-domain models (conv3/conv5 train on [0,1] sRGB floats).
    linear_io: bool


# Loss specs per model (reference: model_pix_shuffle.py:174-182,
# model_conv3.py:55, model_conv5.py:68, model_residual_unet.py:33-41)
_PIX_SHUFFLE_LOSS = LossSpec(
    kind="perceptual", pixel_loss_weight=0.990, vgg_weight=0.007,
    pixel_loss_type="charbonnier", high_frequency_weight=0.003,
    input_is_linear=True,
)
_CONV3_LOSS = LossSpec(
    kind="perceptual", pixel_loss_weight=0.8, vgg_weight=0.2,
    pixel_loss_type="charbonnier",
)
_CONV5_LOSS = LossSpec(
    kind="ssim", pixel_loss_weight=0.99, ssim_weight=0.01, pixel_loss_type="l1",
)

MODEL_NAMES = (
    "pix_shuffle",
    "conv3",
    "conv5",
    "conv6",
    "residual_unet",
)


def get_model(name: str, variant: str = "lightweight") -> ModelDef:
    """Build a ModelDef. ``name`` accepts the reference train.py aliases
    ('conv3_heavy', 'pix_shuffle_heavy', ...) as well as (name, variant)."""
    # Accept reference-style '<name>_heavy' aliases (train.py:310)
    if name.endswith("_heavy"):
        name, variant = name[: -len("_heavy")], "heavyweight"
    if variant not in ("lightweight", "heavyweight", "heavy"):
        # a typo'd variant previously fell through every
        # 'if variant == "lightweight" else heavyweight' branch and silently
        # returned the heavyweight model
        raise ValueError(
            f"Unknown variant {variant!r} (lightweight|heavyweight)"
        )
    if variant == "heavy":
        variant = "heavyweight"
    if name == "conv6" and variant == "heavyweight":
        raise ValueError("conv6 has no heavyweight variant")

    if name == "pix_shuffle":
        cfg = (
            pix_shuffle.lightweight_config()
            if variant == "lightweight"
            else pix_shuffle.heavyweight_config()
        )
        return ModelDef(
            name, variant, cfg,
            partial(pix_shuffle.init, cfg=cfg),
            partial(pix_shuffle.apply, cfg=cfg),
            _PIX_SHUFFLE_LOSS, linear_io=True,
        )
    if name == "conv3":
        cfg = conv_stack.conv3_config(variant)
        return ModelDef(
            name, variant, cfg,
            partial(conv_stack.init, cfg=cfg),
            partial(conv_stack.apply, cfg=cfg),
            _CONV3_LOSS, linear_io=False,
        )
    if name == "conv5":
        cfg = conv_stack.conv5_config(variant)
        return ModelDef(
            name, variant, cfg,
            partial(conv_stack.init, cfg=cfg),
            partial(conv_stack.apply, cfg=cfg),
            _CONV5_LOSS, linear_io=False,
        )
    if name == "conv6":
        cfg = conv6.default_config()
        return ModelDef(
            name, variant, cfg,
            partial(conv6.init, cfg=cfg),
            partial(conv6.apply, cfg=cfg),
            _PIX_SHUFFLE_LOSS, linear_io=True,
        )
    if name == "residual_unet":
        cfg = (
            residual_unet.lightweight_config()
            if variant == "lightweight"
            else residual_unet.heavyweight_config()
        )
        return ModelDef(
            name, variant, cfg,
            partial(residual_unet.init, cfg=cfg),
            partial(residual_unet.apply, cfg=cfg),
            _PIX_SHUFFLE_LOSS, linear_io=True,
        )
    raise ValueError(f"Unknown model '{name}'. Known: {MODEL_NAMES}")


def count_params(params) -> int:
    return sum(int(x.size) for x in jax.tree.leaves(params))
