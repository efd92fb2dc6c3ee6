"""Self-supervised in-domain training of the VGG16-topology feature encoder.

The reference's perceptual loss taps a frozen *pretrained* torchvision VGG16
(/root/reference/model/loss_vgg.py:60-91). This environment has no
torchvision and no network egress, so the pretrained *file* cannot exist
here — but the *capability* (a pretrained, structured multi-scale feature
extractor) can: this module trains the exact same topology
(:data:`..losses.vgg.VGG16_LAYOUT`, same layer indices, same taps) in-domain,
as the encoder of a reconstruction autoencoder over the Amiga ground-truth
corpus and its palette-quantized/dithered variants.

Why reconstruction (not contrastive-across-degradations): the perceptual
term compares ``VGG(output)`` with ``VGG(target)`` — its features must stay
*sensitive* to residual dither, blur and color shifts, not invariant to
them. An autoencoder trained to reconstruct both clean and degraded patches
through the /16 bottleneck must encode exactly those local appearance
differences, while a degradation-invariance objective would teach the loss
to ignore them.

Magnitude calibration: after training, each tap's RMS is rescaled to match
the fixed-seed random-VGG baseline on a probe batch (exact under the
positive homogeneity of relu/maxpool — scaling a conv's weight AND bias by
c > 0 scales every downstream pre-bias activation by c), so the model zoo's
``vgg_weight`` values keep the same meaning they had in the quantified
random-VGG ablation (artifacts/training_parity/eval_summary.json).

The trained encoder ships as ``assets/vgg16_features_selftrained.npz`` with
torchvision-compatible keys (``features.{i}.weight`` HWIO / ``.bias``);
:func:`..losses.vgg.init_vgg16` picks it up automatically when the true
pretrained asset is absent.
"""
from __future__ import annotations

from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.conv import conv2d, init_conv
from ..ops.pixel_shuffle import pixel_shuffle
from .functional import charbonnier_loss
from . import vgg as vgg_mod

# decoder: tap-26 feature (H/16, W/16, 512) -> (H, W, 3), four x2
# pixel-shuffle stages (conv to 4*cout then depth-to-space).
_DECODER_STAGES: Tuple[Tuple[int, int], ...] = (
    (512, 256), (256, 128), (128, 64), (64, 32),
)
_DECODER_OUT = 32


def init_decoder(key: jax.Array) -> List[Dict[str, jnp.ndarray]]:
    keys = jax.random.split(key, len(_DECODER_STAGES) + 1)
    params = [
        init_conv(k, cin, cout * 4, 3)
        for k, (cin, cout) in zip(keys, _DECODER_STAGES)
    ]
    params.append(init_conv(keys[-1], _DECODER_OUT, 3, 3))
    return params


def decoder_apply(params: List[Dict], f: jnp.ndarray) -> jnp.ndarray:
    for p in params[:-1]:
        f = pixel_shuffle(conv2d(p, f), 2)
        f = jax.nn.relu(f)
    return conv2d(params[-1], f)


def autoencode(
    enc_params: vgg_mod.Params,
    dec_params: List[Dict],
    x_srgb: jnp.ndarray,
    *,
    compute_dtype=jnp.bfloat16,
) -> jnp.ndarray:
    """Reconstruct sRGB [0,1] patches through the tap-26 bottleneck."""
    xn = vgg_mod.normalize(x_srgb).astype(compute_dtype)
    (deep,) = vgg_mod.extract_features(enc_params, xn, taps=(26,))
    return decoder_apply(dec_params, deep).astype(jnp.float32)


def reconstruction_loss(
    enc_params: vgg_mod.Params,
    dec_params: List[Dict],
    x_srgb: jnp.ndarray,
) -> jnp.ndarray:
    recon = autoencode(enc_params, dec_params, x_srgb)
    return charbonnier_loss(recon, x_srgb, 1e-6)


def make_train_step(optimizer):
    """(opt_state, enc, dec, batch) -> (opt_state, enc, dec, loss)."""

    def loss_fn(both, x):
        return reconstruction_loss(both["enc"], both["dec"], x)

    def step(opt_state, enc_params, dec_params, x_srgb):
        both = {"enc": enc_params, "dec": dec_params}
        loss, grads = jax.value_and_grad(loss_fn)(both, x_srgb)
        updates, opt_state = optimizer.update(grads, opt_state, both)
        import optax

        both = optax.apply_updates(both, updates)
        return opt_state, both["enc"], both["dec"], loss

    return step


# ---------------------------------------------------------------------------
# tap-magnitude calibration
# ---------------------------------------------------------------------------

def measure_tap_rms(
    enc_params: vgg_mod.Params, probe_srgb: np.ndarray
) -> List[float]:
    """RMS of each perceptual tap on a probe batch (sRGB [0,1] NHWC)."""
    xn = vgg_mod.normalize(jnp.asarray(probe_srgb, jnp.float32))
    feats = vgg_mod.extract_features(enc_params, xn)
    return [float(jnp.sqrt(jnp.mean(f.astype(jnp.float32) ** 2))) for f in feats]


def _tap_last_conv(tap_index: int) -> int:
    """conv_indices() position of the conv layer that produces ``tap_index``
    (taps are either the conv output itself or its relu)."""
    convs = vgg_mod.conv_indices()
    last = [i for i in convs if i <= tap_index]
    return convs.index(last[-1])


def rescale_taps(
    enc_params: vgg_mod.Params,
    probe_srgb: np.ndarray,
    target_rms: List[float],
) -> vgg_mod.Params:
    """Scale each tap segment's final conv (weight AND bias) so tap RMS on
    the probe batch equals ``target_rms``; exact per tap under relu/pool
    positive homogeneity, applied sequentially shallow->deep with
    re-measurement so upstream scaling is accounted for."""
    params = [dict(p) for p in enc_params]
    for k, tap in enumerate(vgg_mod.TAP_INDICES):
        rms = measure_tap_rms(params, probe_srgb)[k]
        g = target_rms[k] / max(rms, 1e-12)
        ci = _tap_last_conv(tap)
        params[ci] = {
            "w": params[ci]["w"] * g,
            "b": params[ci]["b"] * g,
        }
    return params


def random_baseline_rms(probe_srgb: np.ndarray) -> List[float]:
    """Tap RMS of the fixed-seed random VGG (the quantified fallback) —
    the calibration target that keeps vgg_weight semantics unchanged."""
    rand = vgg_mod._random_init(jax.random.key(1234))
    return measure_tap_rms(rand, probe_srgb)


# ---------------------------------------------------------------------------
# asset I/O
# ---------------------------------------------------------------------------

def save_asset(enc_params: vgg_mod.Params, out_path: str) -> None:
    """Write the drop-in npz (torchvision-compatible keys, HWIO weights —
    the layout init_vgg16 loads directly)."""
    import os

    out = {}
    for ci, i in enumerate(vgg_mod.conv_indices()):
        out[f"features.{i}.weight"] = np.asarray(
            enc_params[ci]["w"], np.float32
        )
        out[f"features.{i}.bias"] = np.asarray(enc_params[ci]["b"], np.float32)
    os.makedirs(os.path.dirname(os.path.abspath(out_path)), exist_ok=True)
    np.savez_compressed(out_path, **out)
