"""int8 quantized inference path for the production pix_shuffle model.

STATUS (round 4): measured negative, kept as study evidence — int8 conv on
this TPU slice runs at bf16 rate through XLA's lowering (+3% at the most
favorable shape) and the quantize epilogues make the end-to-end path
slower (3.88 vs 3.59 ms here; full table in docs/PERF.md "int8: measured
negative"). Nothing dispatches to this module; see also export/qat.py.

Scheme:

- weights: symmetric per-output-channel int8 (scale from max-abs),
- conv inputs: symmetric per-tensor int8 with static scales from a
  calibration pass over real frames (activations between convs stay bf16 —
  the elementwise work is VPU-bound and cheap),
- conv accumulates in int32 (preferred_element_type), dequantized by
  sx * sw[cout] and bias-added in fp32/bf16.

Quality gate: tests compare the quantized path to fp32 on real frames; the
headline bench stays bf16 unless int8 meets the >=50 dB parity bar.
"""
from __future__ import annotations

from typing import Dict, List

import jax
import jax.numpy as jnp
import numpy as np

from ..models.configs import PixShuffleConfig
from ..models.pix_shuffle import _acts
from ..ops.pixel_shuffle import pixel_shuffle, pixel_unshuffle

Params = Dict[str, dict]

CONV_ORDER = ["conv1", "conv2", "conv3", "conv4", "conv5", "conv6", "conv7"]


def quantize_weight(p: dict) -> dict:
    """Per-output-channel symmetric int8 quantization of ONE conv param dict
    — the single copy of the scheme (export/qat.py's conv-stack path and the
    pix_shuffle path below must stay numerically identical)."""
    w = np.asarray(p["w"], np.float32)  # HWIO
    scale = np.abs(w).max(axis=(0, 1, 2)) / 127.0  # per cout
    scale = np.maximum(scale, 1e-12)
    w_q = np.clip(np.round(w / scale), -127, 127).astype(np.int8)
    q = {
        "w_q": jnp.asarray(w_q),
        "w_scale": jnp.asarray(scale, jnp.float32),
    }
    if "b" in p:
        q["b"] = p["b"]
    return q


def quantize_weights(params: Params) -> Params:
    """Per-output-channel symmetric int8 quantization of all conv weights."""
    q: Params = dict(params)
    for name in CONV_ORDER + ["skip1_proj", "skip2_proj"]:
        if name in params:
            q[name] = quantize_weight(params[name])
    return q


def _qconv(qp: dict, x: jnp.ndarray, x_scale: float) -> jnp.ndarray:
    """int8 conv: quantize input with the static scale, int32 accumulate,
    dequantize per output channel."""
    xq = jnp.clip(jnp.round(x / x_scale), -127, 127).astype(jnp.int8)
    y = jax.lax.conv_general_dilated(
        xq,
        qp["w_q"],
        (1, 1),
        "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32,
    )
    y = y.astype(jnp.float32) * (qp["w_scale"] * x_scale)
    if "b" in qp:
        y = y + qp["b"].astype(jnp.float32)
    return y.astype(x.dtype)


def calibrate(
    params: Params, cfg: PixShuffleConfig, frames: List[np.ndarray]
) -> Dict[str, float]:
    """Collect per-conv-input max-abs over calibration frames (linear-light
    float inputs, as produced by the enhance wrapper).

    Derives every conv input from the model's own tap hook
    (models/pix_shuffle.apply_with_intermediates) instead of duplicating the
    topology: conv1 sees the unshuffled input, conv{k+1} sees layer k's
    output, and conv6 sees concat(layer1, layer5) whose max-abs is the max of
    the two."""
    from ..models.pix_shuffle import apply_with_intermediates

    maxes = {name: 0.0 for name in CONV_ORDER}

    @jax.jit
    def collect(x):
        _y, caps = apply_with_intermediates(params, x, cfg)
        u = pixel_unshuffle(x, cfg.shuffle_factor)
        return {
            "conv1": jnp.max(jnp.abs(u)),
            "conv2": jnp.max(jnp.abs(caps["layer1"])),
            "conv3": jnp.max(jnp.abs(caps["layer2"])),
            "conv4": jnp.max(jnp.abs(caps["layer3"])),
            "conv5": jnp.max(jnp.abs(caps["layer4"])),
            "conv6": jnp.maximum(
                jnp.max(jnp.abs(caps["layer1"])), jnp.max(jnp.abs(caps["layer5"]))
            ),
            "conv7": jnp.max(jnp.abs(caps["layer6"])),
        }

    for frame in frames:
        x = jnp.asarray(frame, jnp.float32)
        if x.ndim == 3:
            x = x[None]
        stats = collect(x)
        for k, v in stats.items():
            maxes[k] = max(maxes[k], float(v))
    return {k: max(v, 1e-6) / 127.0 for k, v in maxes.items()}


def apply_quantized(
    qparams: Params,
    x: jnp.ndarray,
    cfg: PixShuffleConfig,
    scales: Dict[str, float],
) -> jnp.ndarray:
    """Quantized forward mirroring models/pix_shuffle._forward."""
    identity = x
    t = pixel_unshuffle(x, cfg.shuffle_factor)
    t = _qconv(qparams["conv1"], t, scales["conv1"])
    t = _acts(qparams, cfg, 1, (1, 2), t)
    long_skip = t
    short = t
    t2 = _qconv(qparams["conv2"], t, scales["conv2"])
    t2 = _acts(qparams, cfg, 2, (1, 2), t2)
    if "skip1_proj" in qparams:
        short = _qconv(qparams["skip1_proj"], short, scales["conv2"])
    t = short + t2
    t = _acts(qparams, cfg, 2, (3, 4), t)
    t = _qconv(qparams["conv3"], t, scales["conv3"])
    t = _acts(qparams, cfg, 3, (1, 2), t)
    short = t
    t2 = _qconv(qparams["conv4"], t, scales["conv4"])
    t2 = _acts(qparams, cfg, 4, (1, 2), t2)
    if "skip2_proj" in qparams:
        short = _qconv(qparams["skip2_proj"], short, scales["conv4"])
    t = short + t2
    t = _acts(qparams, cfg, 4, (3, 4), t)
    t = _qconv(qparams["conv5"], t, scales["conv5"])
    t = _acts(qparams, cfg, 5, (1, 2), t)
    t = jnp.concatenate([long_skip, t], axis=-1)
    t = _qconv(qparams["conv6"], t, scales["conv6"])
    t = _acts(qparams, cfg, 6, (1, 2), t)
    t = _qconv(qparams["conv7"], t, scales["conv7"])
    t = _acts(qparams, cfg, 7, (1, 2), t)
    t = pixel_shuffle(t, cfg.shuffle_factor)
    t = identity + t
    return jax.nn.relu(t)


def make_quantized_enhance(
    params: Params,
    cfg: PixShuffleConfig,
    calibration_frames: List[np.ndarray],
    *,
    compute_dtype=jnp.bfloat16,
    crop_left: int = 0,
    srgb_to_linear_exponent: float = 2.2,
    linear_to_srgb_exponent: float = 0.4546,
    jit: bool = True,
):
    """Build the int8 uint8-RGBA enhance artifact.

    ``calibration_frames``: linear-light float (H, W, 3) arrays (use real
    Amiga frames through the same gamma the wrapper applies).
    """
    import functools

    from .enhance import make_enhance_fn

    scales = calibrate(params, cfg, calibration_frames)
    qparams = quantize_weights(params)
    # one uint8-RGBA deployment wrapper for the whole project: reuse
    # make_enhance_fn (input validation, fp32 gamma island, crop/alpha
    # plumbing) around the int8 forward instead of keeping a second copy
    # of the contract in sync
    return make_enhance_fn(
        functools.partial(apply_quantized, cfg=cfg, scales=scales),
        qparams,
        crop_left=crop_left,
        compute_dtype=compute_dtype,
        srgb_to_linear_exponent=srgb_to_linear_exponent,
        linear_to_srgb_exponent=linear_to_srgb_exponent,
        donate=False,
        jit=jit,
    )
