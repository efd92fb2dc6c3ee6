"""VGG16 feature extractor for the perceptual loss, in JAX (NHWC).

Reproduces torchvision ``vgg16().features[0..26]`` exactly — the slice the
reference's PerceptualLoss taps (loss_vgg.py:60-77). Note the reference's
numeric tap indices {3, 8, 17, 26} are labelled relu1_2/relu2_2/relu3_3/
relu4_3 but indices 17 and 26 actually fall on conv4_1 and conv5_2 *pre-relu*
in torchvision's layout — we reproduce the indices (the actual behaviour),
not the labels.

Weights: the environment has no torchvision and no network egress, so weights
load from ``assets/vgg16_features.npz`` when present (convert once from any
torchvision checkout via :func:`convert_torchvision_state_dict`); otherwise a
fixed-seed He-normal initialization is used. A randomly-initialized VGG still
yields a structured multi-scale feature loss (random-projection perceptual
metrics are a known-good fallback), and the swap to pretrained weights is a
file drop — no code change.
"""
from __future__ import annotations

import math
import os
from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.conv import DIMENSION_NUMBERS

# torchvision vgg16 features[0..30] layout (cfg D):
# index: op (out_channels for convs)
VGG16_LAYOUT: Tuple[Tuple[int, str, int], ...] = (
    (0, "conv", 64), (1, "relu", 0), (2, "conv", 64), (3, "relu", 0),
    (4, "pool", 0),
    (5, "conv", 128), (6, "relu", 0), (7, "conv", 128), (8, "relu", 0),
    (9, "pool", 0),
    (10, "conv", 256), (11, "relu", 0), (12, "conv", 256), (13, "relu", 0),
    (14, "conv", 256), (15, "relu", 0),
    (16, "pool", 0),
    (17, "conv", 512), (18, "relu", 0), (19, "conv", 512), (20, "relu", 0),
    (21, "conv", 512), (22, "relu", 0),
    (23, "pool", 0),
    (24, "conv", 512), (25, "relu", 0), (26, "conv", 512),
)

# Reference tap indices (loss_vgg.py:72-77) and their loss weights (:86-91)
TAP_INDICES = (3, 8, 17, 26)
TAP_WEIGHTS = (1.0 / 2.6, 1.0 / 4.8, 1.0 / 3.7, 1.0 / 5.6)

# VGG input normalization (loss_vgg.py:113-114): std = 1/255 per channel
VGG_MEAN = (0.48235, 0.45882, 0.40784)
VGG_STD = 1.0 / 255.0

_ASSET_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "..", "assets"
)
_ASSET = os.path.join(_ASSET_DIR, "vgg16_features.npz")
# In-domain self-trained fallback (losses/vgg_selftrain.py): same keys, same
# topology, trained on this environment's corpus. Used when the torchvision
# conversion is absent.
_ASSET_SELFTRAINED = os.path.join(_ASSET_DIR, "vgg16_features_selftrained.npz")

Params = List[Dict[str, jnp.ndarray]]


def conv_indices() -> List[int]:
    return [i for i, kind, _ in VGG16_LAYOUT if kind == "conv"]


def _load_asset(path: str) -> Params:
    data = np.load(path)
    params: Params = []
    for i in conv_indices():
        params.append(
            {"w": jnp.asarray(data[f"features.{i}.weight"]),
             "b": jnp.asarray(data[f"features.{i}.bias"])}
        )
    return params


def init_vgg16(key: jax.Array | None = None) -> Params:
    """Load feature weights by preference order: torchvision-converted
    pretrained asset > in-domain self-trained asset (losses/vgg_selftrain.py)
    > fixed-seed He init (with a loud warning)."""
    path = os.path.abspath(_ASSET)
    if os.path.exists(path):
        return _load_asset(path)
    self_path = os.path.abspath(_ASSET_SELFTRAINED)
    if os.path.exists(self_path):
        return _load_asset(self_path)
    import warnings

    warnings.warn(
        f"no vgg16 asset at {path} (pretrained) or {self_path} "
        "(self-trained): the perceptual loss is using FIXED-SEED RANDOM VGG "
        "features (random-projection loss), not pretrained VGG16. Loss "
        "values are not comparable to the reference's CSVs. See "
        "assets/README.md for the one-time torchvision conversion, or run "
        "scripts/train_vgg_features.py to self-train in-domain features.",
        stacklevel=2,
    )
    return _random_init(key)


def _random_init(key: jax.Array | None = None) -> Params:
    """The fixed-seed He-normal fallback (a structured random-projection
    perceptual metric — quantified in artifacts/training_parity)."""
    if key is None:
        key = jax.random.key(1234)
    params = []
    cin = 3
    for i, kind, cout in VGG16_LAYOUT:
        if kind != "conv":
            continue
        key, wk = jax.random.split(key)
        std = math.sqrt(2.0 / (cin * 9))
        params.append(
            {"w": jax.random.normal(wk, (3, 3, cin, cout), jnp.float32) * std,
             "b": jnp.zeros((cout,), jnp.float32)}
        )
        cin = cout
    return params


def convert_torchvision_state_dict(state: Dict[str, np.ndarray], out_path: str) -> None:
    """One-time converter: torchvision vgg16 state_dict -> NHWC npz asset.

    Accepts numpy arrays keyed 'features.{i}.weight' (OIHW) / '.bias'.
    """
    out = {}
    for i in conv_indices():
        w = np.asarray(state[f"features.{i}.weight"], np.float32)
        out[f"features.{i}.weight"] = np.transpose(w, (2, 3, 1, 0))  # -> HWIO
        out[f"features.{i}.bias"] = np.asarray(state[f"features.{i}.bias"], np.float32)
    out_path = os.path.abspath(out_path)  # bare filenames: dirname('') fails
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    np.savez_compressed(out_path, **out)


def normalize(x: jnp.ndarray) -> jnp.ndarray:
    """(x - mean) / (1/255) over NHWC sRGB input in [0, 1]."""
    mean = jnp.asarray(VGG_MEAN, x.dtype)
    return (x - mean) / VGG_STD


def extract_features(
    params: Params, x: jnp.ndarray, taps: Tuple[int, ...] = TAP_INDICES
) -> List[jnp.ndarray]:
    """Run features[0..max(taps)], returning activations at ``taps``.

    x: NHWC, already VGG-normalized.
    """
    out: List[jnp.ndarray] = []
    conv_i = 0
    max_tap = max(taps)
    for i, kind, _ in VGG16_LAYOUT:
        if kind == "conv":
            p = params[conv_i]
            conv_i += 1
            x = jax.lax.conv_general_dilated(
                x, p["w"].astype(x.dtype), (1, 1), "SAME",
                dimension_numbers=DIMENSION_NUMBERS,
                precision=jax.lax.Precision.HIGHEST,
            ) + p["b"].astype(x.dtype)
        elif kind == "relu":
            x = jax.nn.relu(x)
        elif kind == "pool":
            x = jax.lax.reduce_window(
                x, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
            )
        if i in taps:
            out.append(x)
        if i >= max_tap:
            break
    return out
