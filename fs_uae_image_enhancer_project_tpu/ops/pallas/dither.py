"""Pallas TPU kernel: fused palette-distance dithering.

The dataset generator's per-crop hot math (SURVEY §3.2 HOT LOOP) is
nearest-palette search: for every pixel, squared-RGB distances to N palette
colours, the two nearest, then a dither rule (nearest-only mapping,
checkerboard alternation, or Bayer luminance thresholding —
reference quantize.py:136-331). This kernel fuses the whole thing in one
VMEM-resident pass:

- the distance matrix is an MXU matmul (dist = |x|^2 + |p|^2 - 2 x.p^T),
- the two-nearest search and the dither rule are VPU elementwise ops,
- the chosen colour is gathered with a one-hot matmul (again MXU),

so a (block_px, N<=1024) tile never touches HBM between steps. Batched over
crops with vmap. Error diffusion stays on the host C++ kernel — it is
serially dependent pixel-to-pixel and hostile to SIMD (SURVEY §7 hard part 2).

Precision caveat (ordered mode): the TPU compares ``frac > threshold`` in
fp32, while the host path (datagen/quantize.py:352-374, like the reference's
numba kernel) computes luminance interpolation in float64. A pixel whose
float64 ``frac`` sits within ~1e-7 (fp32 rounding) of its Bayer threshold
k/(m*m) can pick the other of the two nearest colours. With uint8 inputs the
frac values are rationals whose spacing from the thresholds is usually
>=~2e-4, so real corpora measure byte-identical across backends
(artifacts/generator_e2e_r4.json); the flip is possible for adversarial
palettes, not expected for image data. Regeneration with a different backend
is the only exposure — the generator's spec-diff idempotence never
re-compares pixels of files already on disk.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# luminance weights (quantize.py:301)
_LUMA = (0.2126, 0.7152, 0.0722)

MODE_MAP = 0  # nearest palette colour (dither='none' with palette)
MODE_CHECKER = 1  # two-nearest checkerboard (quantize.py:136-229)
MODE_ORDERED = 2  # Bayer luminance threshold (quantize.py:232-331)


def _dither_kernel(
    px_ref,  # (BLOCK, 4) f32: r, g, b, aux  (aux = checker parity or bayer threshold)
    pal_ref,  # (N, 4) f32: r, g, b, luminance
    out_ref,  # (BLOCK, 4) f32: chosen r, g, b, pad
    *,
    mode: int,
):
    px = px_ref[:, :3]
    aux = px_ref[:, 3]
    pal = pal_ref[:, :3]
    pal_lum = pal_ref[:, 3]

    # squared distances via MXU: |x|^2 - 2 x.p^T + |p|^2
    x2 = jnp.sum(px * px, axis=1, keepdims=True)
    p2 = jnp.sum(pal * pal, axis=1)[None, :]
    cross = jax.lax.dot_general(
        px, pal,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    dist = x2 - 2.0 * cross + p2  # (BLOCK, N)

    n = pal.shape[0]
    col_ids = jax.lax.broadcasted_iota(jnp.int32, dist.shape, 1)

    d1 = jnp.min(dist, axis=1)
    # first index attaining the minimum (ties -> lowest index, like the
    # reference's strict-< scan)
    is_min1 = dist <= d1[:, None]
    idx1 = jnp.min(jnp.where(is_min1, col_ids, n), axis=1)

    if mode == MODE_MAP:
        chosen = idx1
    else:
        masked = jnp.where(col_ids == idx1[:, None], jnp.inf, dist)
        d2 = jnp.min(masked, axis=1)
        is_min2 = masked <= d2[:, None]
        idx2 = jnp.min(jnp.where(is_min2, col_ids, n), axis=1)
        exact = d1 == 0.0
        if mode == MODE_CHECKER:
            # aux = (x+y) % 2: 0 -> nearest, 1 -> second nearest
            alt = jnp.where(aux < 0.5, idx1, idx2)
            chosen = jnp.where(exact, idx1, alt)
        else:  # MODE_ORDERED
            # order the pair dark->light, interpolate pixel luminance,
            # compare against the per-pixel Bayer threshold in aux
            lum_px = (
                px[:, 0] * _LUMA[0] + px[:, 1] * _LUMA[1] + px[:, 2] * _LUMA[2]
            )
            # 1D gathers are unsupported in Mosaic: read palette luminances
            # with masked reductions instead
            l1 = jnp.sum(
                jnp.where(col_ids == idx1[:, None], pal_lum[None, :], 0.0), axis=1
            )
            l2 = jnp.sum(
                jnp.where(col_ids == idx2[:, None], pal_lum[None, :], 0.0), axis=1
            )
            swap = l1 > l2
            lo_idx = jnp.where(swap, idx2, idx1)
            hi_idx = jnp.where(swap, idx1, idx2)
            lo = jnp.minimum(l1, l2)
            hi = jnp.maximum(l1, l2)
            denom = hi - lo
            frac = jnp.where(
                jnp.abs(denom) < 1e-6, 0.0, (lum_px - lo) / jnp.where(denom == 0, 1.0, denom)
            )
            frac = jnp.clip(frac, 0.0, 1.0)
            pick_hi = frac > aux
            chosen = jnp.where(exact, idx1, jnp.where(pick_hi, hi_idx, lo_idx))

    # gather chosen colours with a one-hot matmul (MXU-friendly gather)
    onehot = (col_ids == chosen[:, None]).astype(jnp.float32)
    rgb = jax.lax.dot_general(
        onehot, pal,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    out_ref[:, :3] = rgb
    out_ref[:, 3] = jnp.zeros_like(aux)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _bayer_threshold_map(bayer: np.ndarray, h: int, w: int) -> np.ndarray:
    m = bayer.shape[0]
    norm = bayer.astype(np.float32) / (m * m)
    yy, xx = np.mgrid[0:h, 0:w]
    return norm[yy % m, xx % m]


def _checker_map(h: int, w: int) -> np.ndarray:
    yy, xx = np.mgrid[0:h, 0:w]
    return ((xx + yy) % 2).astype(np.float32)


@functools.partial(jax.jit, static_argnames=("mode", "block", "interpret"))
def _run(px_aux: jnp.ndarray, pal4: jnp.ndarray, mode: int, block: int,
         interpret: bool):
    n_px = px_aux.shape[0]
    grid = (n_px // block,)
    kernel = functools.partial(_dither_kernel, mode=mode)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n_px, 4), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block, 4), lambda i: (i, 0), memory_space=pl.ANY
                         if interpret else pltpu.VMEM),
            pl.BlockSpec((pal4.shape[0], 4), lambda i: (0, 0),
                         memory_space=pl.ANY if interpret else pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block, 4), lambda i: (i, 0),
                               memory_space=pl.ANY if interpret else pltpu.VMEM),
        interpret=interpret,
    )(px_aux, pal4)


def pallas_palette_dither(
    image: np.ndarray,
    palette_u8: np.ndarray,
    method: str = "none",
    bayer: Optional[np.ndarray] = None,
    *,
    block: int = 512,
    interpret: Optional[bool] = None,
) -> np.ndarray:
    """Dither one (H, W, 3) image onto a palette with the fused TPU kernel.

    method: 'none' (nearest mapping) | 'checkerboard' | 'ordered' (needs
    ``bayer``). Returns uint8 (H, W, 3). Palettes of 2..1024 colours.
    """
    h, w, _ = image.shape
    n = palette_u8.shape[0]
    if n < 2 or n > 1024:
        raise ValueError("pallas dither supports palettes of 2..1024 colours")
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    mode = {"none": MODE_MAP, "checkerboard": MODE_CHECKER, "ordered": MODE_ORDERED}[
        method
    ]
    if mode == MODE_ORDERED:
        if bayer is None:
            raise ValueError("ordered dithering needs a bayer matrix")
        aux = _bayer_threshold_map(bayer, h, w)
    elif mode == MODE_CHECKER:
        aux = _checker_map(h, w)
    else:
        aux = np.zeros((h, w), np.float32)

    n_px = h * w
    n_pad = _round_up(n_px, block)
    px_aux = np.zeros((n_pad, 4), np.float32)
    px_aux[:n_px, :3] = image.reshape(-1, 3).astype(np.float32)
    px_aux[:n_px, 3] = aux.reshape(-1)

    pal_f = palette_u8.astype(np.float32)
    # pad palette rows to a multiple of 8 with +inf-distance sentinels
    n_pal_pad = max(_round_up(n, 8), 8)
    pal4 = np.full((n_pal_pad, 4), 1e6, np.float32)
    pal4[:n, :3] = pal_f
    pal4[:n, 3] = pal_f @ np.asarray(_LUMA, np.float32)

    out = np.asarray(
        _run(jnp.asarray(px_aux), jnp.asarray(pal4), mode, block, interpret)
    )
    rgb = out[:n_px, :3].reshape(h, w, 3)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


def pallas_palette_dither_batch(
    images: np.ndarray, palette_u8: np.ndarray, method: str = "none",
    bayer: Optional[np.ndarray] = None,
) -> np.ndarray:
    """Same palette applied to a stack of crops (one device call)."""
    b = images.shape[0]
    return pallas_palette_dither_batch_per_palette(
        images, np.broadcast_to(palette_u8, (b,) + palette_u8.shape), method,
        bayer,
    )


@functools.partial(jax.jit, static_argnames=("mode", "block", "interpret"))
def _run_batch(px_aux: jnp.ndarray, pal4: jnp.ndarray, mode: int, block: int,
               interpret: bool):
    return jax.vmap(
        lambda px, pal: _run(px, pal, mode, block, interpret)
    )(px_aux, pal4)


def pallas_palette_dither_batch_per_palette(
    images: np.ndarray,
    palettes_u8: np.ndarray,
    method: str = "none",
    bayer: Optional[np.ndarray] = None,
    *,
    block: int = 512,
    interpret: Optional[bool] = None,
) -> np.ndarray:
    """Dither a (B, H, W, 3) stack of crops, each onto its OWN palette
    ((B, N, 3) uint8), in ONE fused device call (vmap lifts the kernel's
    grid over the batch axis). With per-crop k-means palettes this is the
    generator's on-device batch path: one round trip per style group
    instead of one per crop. Per-crop results are identical to
    :func:`pallas_palette_dither` (same kernel, same padding)."""
    b, h, w, _ = images.shape
    n = palettes_u8.shape[1]
    if n < 2 or n > 1024:
        raise ValueError("pallas dither supports palettes of 2..1024 colours")
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    mode = {"none": MODE_MAP, "checkerboard": MODE_CHECKER, "ordered": MODE_ORDERED}[
        method
    ]
    if mode == MODE_ORDERED:
        if bayer is None:
            raise ValueError("ordered dithering needs a bayer matrix")
        aux = _bayer_threshold_map(bayer, h, w)
    elif mode == MODE_CHECKER:
        aux = _checker_map(h, w)
    else:
        aux = np.zeros((h, w), np.float32)

    n_px = h * w
    n_pad = _round_up(n_px, block)
    px_aux = np.zeros((b, n_pad, 4), np.float32)
    px_aux[:, :n_px, :3] = images.reshape(b, -1, 3).astype(np.float32)
    px_aux[:, :n_px, 3] = aux.reshape(-1)[None]

    pal_f = palettes_u8.astype(np.float32)
    n_pal_pad = max(_round_up(n, 8), 8)
    pal4 = np.full((b, n_pal_pad, 4), 1e6, np.float32)
    pal4[:, :n, :3] = pal_f
    pal4[:, :n, 3] = pal_f @ np.asarray(_LUMA, np.float32)

    out = np.asarray(
        _run_batch(jnp.asarray(px_aux), jnp.asarray(pal4), mode, block, interpret)
    )
    rgb = out[:, :n_px, :3].reshape(b, h, w, 3)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)
