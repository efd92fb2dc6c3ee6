"""Structured model/activation configuration.

One dataclass-based config system replaces the reference's per-script kwargs
sprawl (SURVEY §5 "Config / flag system"): the same frozen, hashable configs
serve model construction, the NAS search space, CLI entry points and jit
static arguments.
"""
from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass, field
from typing import Any, Dict, Optional, Tuple

# An activation slot: (name, frozen config items). Hashable so whole model
# configs can be jit static args.
ActSpec = Tuple[str, Tuple[Tuple[str, Any], ...]]


def act(name: str = "identity", **config: Any) -> ActSpec:
    """Build an activation spec, e.g. ``act('biased_prelu', num_parameters=36)``."""
    return (name, tuple(sorted(config.items())))


def act_config(spec: ActSpec) -> Dict[str, Any]:
    return dict(spec[1])


IDENTITY = act("identity")


@dataclass(frozen=True)
class ConvLayerSpec:
    """One conv layer: output channels, odd kernel, up to 4 activation slots.

    Mirrors the reference's layerN_{out_channels, kernel_size, act1..4} kwarg
    surface (model_pix_shuffle.py:20-69).
    """

    out_channels: int
    kernel_size: int = 3
    acts: Tuple[ActSpec, ...] = ()

    def __post_init__(self):
        if self.kernel_size % 2 == 0:
            raise ValueError("kernel_size must be odd for symmetric padding")


@dataclass(frozen=True)
class PixShuffleConfig:
    """Config for the production pix_shuffle model (model_pix_shuffle.py).

    7 conv layers between PixelUnshuffle(2)/PixelShuffle(2); residual adds
    after layers 2 and 4 (with 1x1 projection when channels differ); long skip
    from layer 1 concatenated into layer 6; global identity residual + ReLU.
    """

    layers: Tuple[ConvLayerSpec, ...] = ()
    in_channels: int = 3
    shuffle_factor: int = 2

    def __post_init__(self):
        if len(self.layers) != 7:
            raise ValueError("pix_shuffle needs exactly 7 conv layer specs")

    @property
    def unshuffled_channels(self) -> int:
        return self.in_channels * self.shuffle_factor**2


@dataclass(frozen=True)
class ConvStackConfig:
    """Config for conv3/conv5-family models: Conv-BN-(act) stacks.

    conv3 (model_conv3.py): 3 layers, ReLU, no skips.
    conv5 (model_conv5.py): 5 layers, ReLU, residual adds at layers 2 and 4,
    Sigmoid output.
    """

    channels: Tuple[int, ...]  # per-layer output channels incl. final
    kernel_size: int = 3
    residual_layers: Tuple[int, ...] = ()  # 0-based indices with identity add
    final_act: str = "none"  # 'none' | 'sigmoid'
    uint8_rgba_contract: bool = False  # conv3's deployment forward contract

    def __post_init__(self):
        if self.kernel_size % 2 == 0:
            raise ValueError("kernel_size must be odd for symmetric padding")


@dataclass(frozen=True)
class Conv6Config:
    """Reconstruction of the reference's missing ``model_conv6`` module.

    Call-site contract (optuna_study_prune_act_r2.py:106-113 and
    optuna_study_opt_act.py:122-150): full-resolution float RGB in/out,
    default 36 channels, per-layer act1..4 slots, final layer outputs 3
    channels. We realise it as the pix_shuffle topology without the
    pixel-(un)shuffle pair: 7 convs with residual adds at 2/4, long-skip
    concat into layer 6, global identity residual + ReLU.
    """

    layers: Tuple[ConvLayerSpec, ...] = ()
    in_channels: int = 3

    def __post_init__(self):
        if len(self.layers) != 7:
            raise ValueError("conv6 needs exactly 7 conv layer specs")


@dataclass(frozen=True)
class ResidualUNetConfig:
    """Config for the residual U-Net (model_residual_unet.py:10-146)."""

    input_channels: int = 3
    output_channels: int = 3
    base_channels: int = 36
    unet_depth: int = 2
    blocks_per_level: int = 2
    acts: Tuple[ActSpec, ActSpec, ActSpec, ActSpec] = (
        IDENTITY,
        act("relu"),
        act("relu"),
        IDENTITY,
    )
    internal_block_channels_ratio: float = 1.0


# ---------------------------------------------------------------------------
# serialization (for NAS cache keys, CLI round trips)
# ---------------------------------------------------------------------------

def config_to_json(cfg: Any) -> str:
    """Canonical JSON of any config dataclass — doubles as the NAS cache key
    (mirrors the reference's sorted-params JSON FPS-cache key,
    optuna_study_opt_act.py:16-39)."""

    def enc(o):
        if dataclasses.is_dataclass(o):
            return {"__type__": type(o).__name__, **dataclasses.asdict(o)}
        raise TypeError(o)

    return json.dumps(cfg, default=enc, sort_keys=True)


_CONFIG_TYPES = {}


def _register(cls):
    _CONFIG_TYPES[cls.__name__] = cls
    return cls


for _cls in (ConvLayerSpec, PixShuffleConfig, ConvStackConfig, Conv6Config, ResidualUNetConfig):
    _register(_cls)


def _tupleize(v):
    if isinstance(v, list):
        return tuple(_tupleize(x) for x in v)
    return v


def config_from_json(s: str) -> Any:
    def dec(d: Dict[str, Any]) -> Any:
        t = d.pop("__type__", None)
        if t is None:
            return d
        cls = _CONFIG_TYPES[t]
        kwargs = {}
        for f in dataclasses.fields(cls):
            if f.name not in d:
                continue
            v = _tupleize(d[f.name])
            if f.name == "layers":
                v = tuple(
                    x if isinstance(x, ConvLayerSpec) else ConvLayerSpec(
                        out_channels=x["out_channels"] if isinstance(x, dict) else x[0],
                        kernel_size=x["kernel_size"] if isinstance(x, dict) else x[1],
                        acts=_tupleize(x["acts"]) if isinstance(x, dict) else _tupleize(x[2]),
                    )
                    for x in v
                )
            kwargs[f.name] = v
        return cls(**kwargs)

    raw = json.loads(s)

    def walk(o):
        if isinstance(o, dict):
            o = {k: walk(v) for k, v in o.items()}
            if "__type__" in o:
                return dec(o)
            return o
        if isinstance(o, list):
            return [walk(x) for x in o]
        return o

    return walk(raw)
