"""Colour-depth reduction, palette generation and dithering.

Counterpart of reference ``dataset_generator/quantize.py`` with the same
algorithm surface and validation behaviour:

- palette algorithms: k-means (sklearn for exact reference parity,
  quantize.py:486-489; plus an on-device batched JAX Lloyd's variant),
  median-cut (quantize.py:8-39), octree (quantize.py:42-60);
- grid quantization for RGB444/555/565/666 (quantize.py:461-474, :509-522);
- dither kernels: checkerboard two-nearest-colour (quantize.py:136-229),
  Bayer 2x2/4x4/8x8 ordered via luminance interpolation (quantize.py:232-331)
  — both vectorized JAX (vmappable over crops, TPU-friendly); serpentine
  error diffusion with 6 diffusion maps (quantize.py:84-134, :362-390) —
  inherently sequential, implemented natively in C++ (runtime/dither.cc,
  the counterpart of the reference's Numba @njit kernels) with a pure-numpy
  fallback;
- entry point :func:`reduce_color_depth_and_dither` with the reference's
  exact argument validation and ValueError surface (quantize.py:395-450).
"""
from __future__ import annotations

from typing import Optional

import numpy as np

# ---------------------------------------------------------------------------
# Dither matrices and diffusion maps (public constants, quantize.py:334-390)
# ---------------------------------------------------------------------------

BAYER_MATRIX_2X2 = np.array([[0, 2], [3, 1]], dtype=np.int32)

BAYER_MATRIX_4X4 = np.array(
    [[0, 8, 2, 10], [12, 4, 14, 6], [3, 11, 1, 9], [15, 7, 13, 5]], dtype=np.int32
)

BAYER_MATRIX_8X8 = np.array(
    [
        [0, 32, 8, 40, 2, 34, 10, 42],
        [48, 16, 56, 24, 50, 18, 58, 26],
        [12, 44, 4, 36, 14, 46, 6, 38],
        [60, 28, 52, 20, 62, 30, 54, 22],
        [3, 35, 11, 43, 1, 33, 9, 41],
        [51, 19, 59, 27, 49, 17, 57, 25],
        [15, 47, 7, 39, 13, 45, 5, 37],
        [63, 31, 55, 23, 61, 29, 53, 21],
    ],
    dtype=np.int32,
)

DIFFUSION_MAPS = {
    "floyd-steinberg": [
        (1, 0, 7 / 16),
        (-1, 1, 3 / 16), (0, 1, 5 / 16), (1, 1, 1 / 16),
    ],
    "atkinson": [
        (1, 0, 1 / 8), (2, 0, 1 / 8),
        (-1, 1, 1 / 8), (0, 1, 1 / 8), (1, 1, 1 / 8),
        (0, 2, 1 / 8),
    ],
    "sierra2": [
        (1, 0, 4 / 16), (2, 0, 3 / 16),
        (-2, 1, 1 / 16), (-1, 1, 2 / 16), (0, 1, 3 / 16), (1, 1, 2 / 16),
        (2, 1, 1 / 16),
    ],
    "stucki": [
        (1, 0, 8 / 42), (2, 0, 4 / 42),
        (-2, 1, 2 / 42), (-1, 1, 4 / 42), (0, 1, 8 / 42), (1, 1, 4 / 42),
        (2, 1, 2 / 42),
        (-2, 2, 1 / 42), (-1, 2, 2 / 42), (0, 2, 4 / 42), (1, 2, 2 / 42),
        (2, 2, 1 / 42),
    ],
    "burkes": [
        (1, 0, 8 / 32), (2, 0, 4 / 32),
        (-2, 1, 2 / 32), (-1, 1, 4 / 32), (0, 1, 8 / 32), (1, 1, 4 / 32),
        (2, 1, 2 / 32),
    ],
    "sierra3": [
        (1, 0, 5 / 32), (2, 0, 3 / 32),
        (-2, 1, 2 / 32), (-1, 1, 4 / 32), (0, 1, 5 / 32), (1, 1, 4 / 32),
        (2, 1, 2 / 32),
        (-1, 2, 2 / 32), (0, 2, 3 / 32), (1, 2, 2 / 32),
    ],
}

VALID_COLOR_SPACES = ["RGB888", "RGB565", "RGB444", "RGB555", "RGB666"]
VALID_PALETTE_SIZES = [None, 2, 4, 8, 16, 32, 64, 128, 256, 512, 1024, 2048, 4096]
VALID_PALETTE_ALGORITHMS = ["kmeans", "kmeans_jax", "median_cut", "octree"]


def valid_dither_methods():
    return ["none", "checkerboard", "bayer2x2", "bayer4x4", "bayer8x8"] + list(
        DIFFUSION_MAPS.keys()
    )


# ---------------------------------------------------------------------------
# Grid quantization
# ---------------------------------------------------------------------------

def grid_quantize(image: np.ndarray, color_space: str) -> np.ndarray:
    """Quantize uint8 RGB to the target grid, returned as float64 values on
    the 0..255 grid (reference quantize.py:461-474 semantics: floor to the
    low-bits-cleared level)."""
    x = image.astype(np.float64)
    if color_space == "RGB888":
        return x
    if color_space == "RGB444":
        return np.floor(x / 16) * 16
    if color_space == "RGB666":
        return np.floor(x / 4) * 4
    if color_space == "RGB555":
        return np.floor(x / 8) * 8
    if color_space == "RGB565":
        out = x.copy()
        out[..., 0] = np.floor(x[..., 0] / 8) * 8
        out[..., 1] = np.floor(x[..., 1] / 4) * 4
        out[..., 2] = np.floor(x[..., 2] / 8) * 8
        return out
    raise ValueError(f"color_space must be one of {VALID_COLOR_SPACES}.")


# ---------------------------------------------------------------------------
# Palette generation
# ---------------------------------------------------------------------------

def generate_palette_median_cut(image_np: np.ndarray, num_colors: int) -> np.ndarray:
    """Median-cut: recursively split the box with the largest RGB volume at
    the median of its longest axis; palette = per-box mean colours.

    Pixels stay in the input's uint8 dtype (reference quantize.py:8-39): the
    unstable column argsort's tie order is dtype-dependent, and equal-valued
    pixels landing on either side of the median boundary change the per-box
    means — byte parity requires sorting the same dtype the reference sorts.
    """
    pixels = image_np.reshape(-1, 3)
    boxes = [pixels]

    def volume(box):
        return float(np.prod(box.max(axis=0) - box.min(axis=0)))

    while len(boxes) < num_colors:
        boxes.sort(key=volume, reverse=True)
        box = boxes.pop(0)
        if len(box) < 2:
            boxes.append(box)
            break
        axis = int(np.argmax(box.max(axis=0) - box.min(axis=0)))
        order = box[:, axis].argsort()
        half = len(box) // 2
        boxes.extend([box[order[:half]], box[order[half:]]])
    return np.array([b.mean(axis=0) for b in boxes if len(b)], dtype=np.uint8)


def generate_palette_octree(image_np: np.ndarray, num_colors: int) -> np.ndarray:
    """Octree-style palette: bucket by high bits, keep the most-populous
    buckets (reference quantize.py:42-60). The bucket colour is the shared
    bit-shifted QUANTIZED value — the reference accumulates quantized pixels,
    so every bucket member is identical and the mean IS that value. Ties
    between equal-count buckets break by first-seen order, matching the
    reference's stable sort over dict-insertion order."""
    pixels = image_np.reshape(-1, 3)
    shift = 8 - int(np.log2(num_colors) / 3)
    shift = max(0, min(6, shift))
    quantized = (pixels >> shift) << shift
    keys = (
        quantized[:, 0].astype(np.int64) << 16
    ) | (quantized[:, 1].astype(np.int64) << 8) | quantized[:, 2].astype(np.int64)
    uniq, first_idx, counts = np.unique(keys, return_index=True, return_counts=True)
    if len(uniq) > num_colors:
        keep = np.lexsort((first_idx, -counts))[:num_colors]
    else:
        keep = np.argsort(first_idx)
    return quantized[first_idx[keep]].astype(np.uint8)


def generate_palette_kmeans_sklearn(
    pixels: np.ndarray, num_colors: int, random_state: int = 42
) -> np.ndarray:
    """sklearn KMeans with the reference's exact settings
    (quantize.py:486-489: random_state=42, n_init='auto')."""
    from sklearn.cluster import KMeans

    km = KMeans(n_clusters=num_colors, random_state=random_state, n_init="auto")
    km.fit(pixels)
    return km.cluster_centers_.astype(np.uint8)


# jitted k-means executables, keyed by (num_colors, iters, batched) — one
# compile per palette size, reused across every crop in the process
_KMEANS_JAX_FNS: dict = {}


def _kmeans_jax_fn(num_colors: int, iters: int, batched: bool):
    import jax
    import jax.numpy as jnp

    cached = _KMEANS_JAX_FNS.get((num_colors, iters, batched))
    if cached is not None:
        return cached

    def core(pts, key):
        # greedy++ seeding: start from a random point, then repeatedly take
        # the point farthest from the current centre set (deterministic
        # given seed)
        def seed_step(carry, _):
            centers, dists = carry
            idx = jnp.argmax(dists)
            c = pts[idx]
            centers = jnp.roll(centers, 1, axis=0).at[0].set(c)
            d_new = jnp.sum((pts - c) ** 2, axis=1)
            return (centers, jnp.minimum(dists, d_new)), None

        first = pts[jax.random.randint(key, (), 0, pts.shape[0])]
        centers0 = jnp.tile(first, (num_colors, 1))
        d0 = jnp.sum((pts - first) ** 2, axis=1)
        (centers, _), _ = jax.lax.scan(
            seed_step, (centers0, d0), None, length=num_colors - 1
        )

        def lloyd(centers, _):
            d = jnp.sum((pts[:, None, :] - centers[None]) ** 2, axis=-1)
            assign = jnp.argmin(d, axis=1)
            one_hot = jax.nn.one_hot(assign, num_colors, dtype=jnp.float32)
            counts = one_hot.sum(axis=0)
            sums = jnp.matmul(one_hot.T, pts, precision=jax.lax.Precision.HIGHEST)
            new = jnp.where(
                counts[:, None] > 0, sums / jnp.maximum(counts[:, None], 1), centers
            )
            return new, None

        centers, _ = jax.lax.scan(lloyd, centers, None, length=iters)
        return centers

    fn = jax.vmap(core, in_axes=(0, None)) if batched else core
    fn = jax.jit(fn)
    _KMEANS_JAX_FNS[(num_colors, iters, batched)] = fn
    return fn


def generate_palette_kmeans_jax(
    pixels: np.ndarray, num_colors: int, iters: int = 25, seed: int = 42
) -> np.ndarray:
    """On-device Lloyd's k-means with k-means++-style greedy seeding — the
    TPU-native fast path for per-crop palettes (SURVEY §7 hard part 5).
    Jitted (one XLA program per palette size), persistent-cached."""
    from ..utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()  # fresh generator workers: reuse compiles

    import jax
    import jax.numpy as jnp

    fn = _kmeans_jax_fn(num_colors, iters, batched=False)
    centers = fn(jnp.asarray(pixels, jnp.float32), jax.random.key(seed))
    return np.clip(np.asarray(centers), 0, 255).astype(np.uint8)


def generate_palettes_kmeans_jax_batch(
    pixel_stacks: np.ndarray, num_colors: int, iters: int = 25, seed: int = 42
) -> np.ndarray:
    """Batched on-device k-means: (B, N, 3) pixel stacks -> (B, num_colors, 3)
    uint8 palettes in ONE device call (vmap of the scalar core, same seed per
    crop — bitwise-identical palettes to per-crop
    :func:`generate_palette_kmeans_jax`). This is what makes device-side
    palette generation pay through a high-RTT link: the per-crop path costs
    a round trip per crop; this costs one per batch."""
    from ..utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()

    import jax
    import jax.numpy as jnp

    fn = _kmeans_jax_fn(num_colors, iters, batched=True)
    centers = fn(jnp.asarray(pixel_stacks, jnp.float32), jax.random.key(seed))
    return np.clip(np.asarray(centers), 0, 255).astype(np.uint8)


# ---------------------------------------------------------------------------
# Vectorized dither kernels (numpy; jax variants in ops/pallas as they land)
# ---------------------------------------------------------------------------

# pixels per chunk in the palette distance search: bounds peak memory at
# ~CHUNK * N * 8 B (a full (H*W, 4096) float64 matrix would be gigabytes per
# generator worker — the reference's numba kernels are O(N) per pixel)
_DIST_CHUNK = 16384


def map_to_palette(image_float: np.ndarray, palette_u8: np.ndarray) -> np.ndarray:
    """Nearest-palette mapping, no dithering (quantize.py:523-530)."""
    pix = image_float.reshape(-1, 3)
    pal = palette_u8.astype(np.float64)
    labels = np.empty(len(pix), np.int64)
    for lo in range(0, len(pix), _DIST_CHUNK):
        chunk = pix[lo : lo + _DIST_CHUNK]
        d = ((chunk[:, None, :] - pal[None]) ** 2).sum(-1)
        labels[lo : lo + _DIST_CHUNK] = np.argmin(d, axis=1)
    return palette_u8[labels].reshape(image_float.shape).astype(np.uint8)


def _two_nearest(image_float: np.ndarray, palette_f: np.ndarray):
    """Indices + squared distances of the two nearest palette colours
    (chunked: memory stays bounded for 4096-colour palettes)."""
    pix = image_float.reshape(-1, 3)
    n = len(pix)
    idx1 = np.empty(n, np.int64)
    d1 = np.empty(n, np.float64)
    idx2 = np.empty(n, np.int64)
    d2 = np.empty(n, np.float64)
    for lo in range(0, n, _DIST_CHUNK):
        chunk = pix[lo : lo + _DIST_CHUNK]
        d = ((chunk[:, None, :] - palette_f[None]) ** 2).sum(-1)
        rows = np.arange(len(chunk))
        i1 = np.argmin(d, axis=1)
        idx1[lo : lo + _DIST_CHUNK] = i1
        d1[lo : lo + _DIST_CHUNK] = d[rows, i1]
        d[rows, i1] = np.inf
        i2 = np.argmin(d, axis=1)
        idx2[lo : lo + _DIST_CHUNK] = i2
        d2[lo : lo + _DIST_CHUNK] = d[rows, i2]
    return idx1, d1, idx2, d2


def checkerboard_dither(image_float: np.ndarray, palette_u8: np.ndarray) -> np.ndarray:
    """Two-nearest-colour checkerboard (quantize.py:136-229): alternate the
    two closest palette colours on a checker pattern; exact matches always
    take the nearest."""
    h, w, _ = image_float.shape
    n = palette_u8.shape[0]
    if n == 0:
        return np.zeros((h, w, 3), np.uint8)
    if n == 1:
        return np.broadcast_to(palette_u8[0], (h, w, 3)).astype(np.uint8).copy()
    pal_f = palette_u8.astype(np.float64)
    idx1, d1, idx2, _ = _two_nearest(image_float, pal_f)
    yy, xx = np.mgrid[0:h, 0:w]
    checker = ((xx + yy) % 2 == 0).reshape(-1)
    chosen = np.where(d1 == 0.0, idx1, np.where(checker, idx1, idx2))
    return palette_u8[chosen].reshape(h, w, 3).astype(np.uint8)


_LUMA = np.array([0.2126, 0.7152, 0.0722])


def ordered_dither(
    image_float: np.ndarray, palette_u8: np.ndarray, bayer: np.ndarray
) -> np.ndarray:
    """Bayer ordered dither via luminance interpolation between the two
    nearest palette colours (quantize.py:232-331)."""
    h, w, _ = image_float.shape
    n = palette_u8.shape[0]
    if n == 0:
        return np.zeros((h, w, 3), np.uint8)
    if n == 1:
        return np.broadcast_to(palette_u8[0], (h, w, 3)).astype(np.uint8).copy()
    pal_f = palette_u8.astype(np.float64)
    idx1, d1, idx2, _ = _two_nearest(image_float, pal_f)
    lum_pix = image_float.reshape(-1, 3) @ _LUMA
    pal_lum = pal_f @ _LUMA
    lum1, lum2 = pal_lum[idx1], pal_lum[idx2]
    # idx1 must be the darker of the pair (quantize.py:305-309)
    swap = lum1 > lum2
    lo_idx = np.where(swap, idx2, idx1)
    hi_idx = np.where(swap, idx1, idx2)
    lo, hi = np.where(swap, lum2, lum1), np.where(swap, lum1, lum2)
    denom = hi - lo
    frac = np.where(np.abs(denom) < 1e-6, 0.0, (lum_pix - lo) / np.where(denom == 0, 1, denom))
    frac = np.clip(frac, 0.0, 1.0)
    m = bayer.shape[0]
    thresh_map = bayer.astype(np.float64) / (m * m)
    yy, xx = np.mgrid[0:h, 0:w]
    thresh = thresh_map[yy % m, xx % m].reshape(-1)
    chosen = np.where(frac > thresh, hi_idx, lo_idx)
    chosen = np.where(d1 == 0.0, idx1, chosen)
    return palette_u8[chosen].reshape(h, w, 3).astype(np.uint8)


def error_diffusion_dither_numpy(
    image_float: np.ndarray, diff_map, palette_f: np.ndarray
) -> np.ndarray:
    """Serpentine error diffusion, pure-numpy reference implementation
    (quantize.py:84-134 semantics: snake rows, mirrored dx on odd rows,
    future-pixel-only diffusion, clamp to [0,255] after each deposit).
    Modifies and returns a float64 copy. Slow; the C++ kernel in
    runtime/dither.cc is the production path."""
    img = image_float.astype(np.float64).copy()
    h, w, _ = img.shape
    for y in range(h):
        forward = y % 2 == 0
        xs = range(w) if forward else range(w - 1, -1, -1)
        for x in xs:
            px = img[y, x]
            d = ((palette_f - px) ** 2).sum(1)
            ci = int(np.argmin(d))
            closest = palette_f[ci]
            err = px - closest
            img[y, x] = closest
            if not err.any():
                continue
            for dx, dy, wgt in diff_map:
                edx = dx if forward else -dx
                nx, ny = x + edx, y + dy
                if 0 <= ny < h and 0 <= nx < w:
                    if ny > y or (ny == y and ((forward and nx > x) or (not forward and nx < x))):
                        img[ny, nx] = np.clip(img[ny, nx] + err * wgt, 0.0, 255.0)
    return img


def error_diffusion_dither(
    image_float: np.ndarray, method: str, palette_f: np.ndarray
) -> np.ndarray:
    """Dispatch to the native C++ kernel when available, numpy otherwise."""
    from ..runtime import native

    diff_map = DIFFUSION_MAPS[method]
    if native.available():
        return native.error_diffusion(image_float, diff_map, palette_f)
    return error_diffusion_dither_numpy(image_float, diff_map, palette_f)


# ---------------------------------------------------------------------------
# Entry point
# ---------------------------------------------------------------------------

def reduce_color_depth_and_dither(
    image_np: np.ndarray,
    color_space: str,
    target_palette_size: Optional[int] = None,
    dithering_method: str = "none",
    palette_algorithm: str = "kmeans",
    verbose: int = 0,
    backend: str = "numpy",
) -> np.ndarray:
    """Reduce colour depth of an RGB888 image, optionally generate a palette,
    optionally dither. Same surface, validation and semantics as the
    reference entry point (quantize.py:395-600).

    ``backend='pallas'`` runs the vectorizable dither families (nearest
    mapping, checkerboard, Bayer ordered) through the fused TPU kernel
    (ops/pallas/dither.py) — for single-process on-device batch generation;
    the default host path suits the generator's multi-process workers.
    Error diffusion always runs on the host (native C++/numpy).
    """
    if image_np.ndim != 3 or image_np.shape[2] != 3 or image_np.dtype != np.uint8:
        raise ValueError(
            "Input image must be a 3-channel (RGB) NumPy array of type uint8."
        )
    if color_space not in VALID_COLOR_SPACES:
        raise ValueError(f"color_space must be one of {VALID_COLOR_SPACES}.")
    if target_palette_size not in VALID_PALETTE_SIZES:
        raise ValueError(f"target_palette_size must be one of {VALID_PALETTE_SIZES}.")
    methods = valid_dither_methods()
    if dithering_method not in methods:
        raise ValueError(f"dithering_method must be one of {methods}.")
    if palette_algorithm not in VALID_PALETTE_ALGORITHMS:
        raise ValueError(
            f"palette_algorithm must be one of {VALID_PALETTE_ALGORITHMS}."
        )
    if dithering_method != "none" and target_palette_size is None:
        raise ValueError(
            f"Dithering method '{dithering_method}' requires 'target_palette_size' "
            "to be specified."
        )

    palette_u8 = None
    palette_f = None
    if target_palette_size is not None:
        # palette source pixels come from the grid-quantized image
        # (quantize.py:458-474)
        pixels = grid_quantize(image_np, color_space).reshape(-1, 3)
        unique_colors = np.unique(pixels, axis=0)
        n_clusters = min(target_palette_size, len(unique_colors))
        if n_clusters == 0:
            palette_u8 = np.zeros((1, 3), np.uint8)
        elif n_clusters < target_palette_size:
            palette_u8 = unique_colors.astype(np.uint8)
        elif palette_algorithm == "kmeans":
            palette_u8 = generate_palette_kmeans_sklearn(pixels, n_clusters)
        elif palette_algorithm == "kmeans_jax":
            palette_u8 = generate_palette_kmeans_jax(pixels, n_clusters)
        elif palette_algorithm == "median_cut":
            palette_u8 = generate_palette_median_cut(image_np, n_clusters)
        elif palette_algorithm == "octree":
            palette_u8 = generate_palette_octree(image_np, n_clusters)
        palette_f = palette_u8.astype(np.float64)

    img_f = image_np.astype(np.float64)
    use_pallas = backend == "pallas" and palette_u8 is not None and (
        2 <= palette_u8.shape[0] <= 1024
    )
    if use_pallas:
        # generator workers are fresh processes: without the persistent
        # cache every child would recompile the fused kernel per
        # (shape, mode, palette-size) variant before its first crop.
        from ..utils.compile_cache import enable_persistent_cache

        enable_persistent_cache()

    if dithering_method == "none":
        if target_palette_size is None:
            if color_space == "RGB888":
                return image_np.copy()
            return np.clip(grid_quantize(image_np, color_space), 0, 255).astype(np.uint8)
        if use_pallas:
            from ..ops.pallas.dither import pallas_palette_dither

            return pallas_palette_dither(img_f.astype(np.float32), palette_u8, "none")
        return map_to_palette(img_f, palette_u8)

    if dithering_method == "checkerboard":
        if use_pallas:
            from ..ops.pallas.dither import pallas_palette_dither

            return pallas_palette_dither(
                img_f.astype(np.float32), palette_u8, "checkerboard"
            )
        # native C++ kernel when available (same dispatch pattern as error
        # diffusion; byte-identical to numpy — tests/test_quantize.py)
        from ..runtime import native

        if native.available() and palette_u8.shape[0] >= 2:
            return native.checkerboard(img_f, palette_u8)
        return checkerboard_dither(img_f, palette_u8)

    if dithering_method.startswith("bayer"):
        bayer = {
            "bayer2x2": BAYER_MATRIX_2X2,
            "bayer4x4": BAYER_MATRIX_4X4,
            "bayer8x8": BAYER_MATRIX_8X8,
        }[dithering_method]
        if use_pallas:
            from ..ops.pallas.dither import pallas_palette_dither

            return pallas_palette_dither(
                img_f.astype(np.float32), palette_u8, "ordered", bayer
            )
        return ordered_dither(img_f, palette_u8, bayer)

    # error diffusion
    out = error_diffusion_dither(img_f, dithering_method, palette_f)
    return np.clip(out, 0, 255).astype(np.uint8)
