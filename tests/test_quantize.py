"""Quantize/dither kernel tests.

Covers the reference's quantize.py self-test surface (quantize.py:604-693):
grid quantization, palette generation, all dither families, and the two
expected-ValueError cases. The native C++ error-diffusion kernel is
cross-validated against the independent pure-numpy implementation.
"""
import numpy as np
import pytest

from fs_uae_image_enhancer_project_tpu.datagen.quantize import (
    BAYER_MATRIX_4X4,
    DIFFUSION_MAPS,
    checkerboard_dither,
    error_diffusion_dither_numpy,
    generate_palette_kmeans_jax,
    generate_palette_median_cut,
    generate_palette_octree,
    grid_quantize,
    map_to_palette,
    ordered_dither,
    reduce_color_depth_and_dither,
)
from fs_uae_image_enhancer_project_tpu.runtime import native


def _gradient(h=24, w=32):
    img = np.zeros((h, w, 3), np.uint8)
    for y in range(h):
        for x in range(w):
            img[y, x] = (int(x / w * 255), int(y / h * 255), 128)
    return img


def test_grid_quantize_levels():
    img = _gradient()
    q444 = grid_quantize(img, "RGB444")
    assert np.all(q444 % 16 == 0)
    q666 = grid_quantize(img, "RGB666")
    assert np.all(q666 % 4 == 0)
    q565 = grid_quantize(img, "RGB565")
    assert np.all(q565[..., 0] % 8 == 0)
    assert np.all(q565[..., 1] % 4 == 0)
    assert np.all(q565[..., 2] % 8 == 0)
    np.testing.assert_array_equal(grid_quantize(img, "RGB888"), img.astype(np.float64))


def test_rgb444_none_case():
    # reference self-test case 1 (quantize.py:628)
    img = _gradient()
    out = reduce_color_depth_and_dither(img, "RGB444", dithering_method="none")
    assert out.dtype == np.uint8
    assert np.all(out % 16 == 0)
    np.testing.assert_array_equal(out, (img // 16) * 16)


@pytest.mark.parametrize("algo", ["median_cut", "octree", "kmeans_jax"])
def test_palette_generators(algo):
    img = _gradient()
    fn = {
        "median_cut": generate_palette_median_cut,
        "octree": generate_palette_octree,
        "kmeans_jax": lambda a, n: generate_palette_kmeans_jax(
            a.reshape(-1, 3).astype(np.float64), n
        ),
    }[algo]
    pal = fn(img, 16)
    assert pal.dtype == np.uint8 and pal.shape[1] == 3
    assert 1 <= pal.shape[0] <= 16


def test_octree_reference_semantics():
    """Octree buckets carry the QUANTIZED colour (reference averages the
    bit-shifted pixels, which are identical within a bucket) and break
    count ties by first-seen order (dict-insertion stable sort)."""
    from collections import defaultdict

    def ref_octree(image_np, num_colors):
        pixels = image_np.reshape(-1, 3)
        shift = max(0, min(6, 8 - int(np.log2(num_colors) / 3)))
        quantized = (pixels >> shift) << shift
        color_map = defaultdict(list)
        for pix in quantized:
            color_map[tuple(pix)].append(pix)
        merged = (
            sorted(color_map.items(), key=lambda kv: -len(kv[1]))[:num_colors]
            if len(color_map) > num_colors
            else color_map.items()
        )
        return np.array([np.mean(v, axis=0) for _, v in merged], dtype=np.uint8)

    rng = np.random.default_rng(7)
    for nc in (8, 32, 256):
        img = rng.integers(0, 256, (24, 31, 3), dtype=np.uint8)
        np.testing.assert_array_equal(
            generate_palette_octree(img, nc), ref_octree(img, nc)
        )
    # ties-heavy case: 16 distinct colours, all counts equal
    img = (
        np.repeat(np.arange(16, dtype=np.uint8).reshape(-1, 1), 3, 1)[
            rng.permutation(16)
        ].reshape(4, 4, 3)
        * 16
    )
    np.testing.assert_array_equal(
        generate_palette_octree(img, 8), ref_octree(img, 8)
    )


def test_small_unique_color_count_returns_unique_colors():
    # fewer unique colours than palette size: palette = the unique colours
    img = np.zeros((4, 4, 3), np.uint8)
    img[2:] = [100, 150, 200]
    out = reduce_color_depth_and_dither(
        img, "RGB888", target_palette_size=16, dithering_method="none"
    )
    np.testing.assert_array_equal(out, img)


def test_map_to_palette_exact():
    pal = np.array([[0, 0, 0], [255, 255, 255]], np.uint8)
    img = np.array([[[10, 10, 10], [250, 250, 250]]], np.float64)
    out = map_to_palette(img, pal)
    np.testing.assert_array_equal(out[0, 0], [0, 0, 0])
    np.testing.assert_array_equal(out[0, 1], [255, 255, 255])


def test_checkerboard_two_color():
    # reference self-test case 6 (quantize.py:652-664): mid-gray image over a
    # black/white palette must alternate in a checker pattern
    pal = np.array([[40, 40, 40], [200, 200, 200]], np.uint8)
    img = np.full((8, 8, 3), 120.0)
    out = checkerboard_dither(img, pal)
    assert set(np.unique(out)) <= {40, 200}
    assert not np.array_equal(out[0, 0], out[0, 1])  # alternation
    np.testing.assert_array_equal(out[0, 0], out[1, 1])
    # exact palette colour stays fixed regardless of parity
    img2 = np.full((2, 2, 3), 40.0)
    np.testing.assert_array_equal(checkerboard_dither(img2, pal), np.full((2, 2, 3), 40))


def test_checkerboard_native_matches_numpy():
    if not native.available():
        pytest.skip("native kernels unavailable")
    rng = np.random.default_rng(0)
    img = rng.uniform(0, 255, (16, 16, 3))
    pal = rng.integers(0, 256, (8, 3)).astype(np.uint8)
    np.testing.assert_array_equal(
        native.checkerboard(img, pal), checkerboard_dither(img, pal)
    )


def test_ordered_dither_single_and_multi():
    pal = np.array([[0, 0, 0], [255, 255, 255]], np.uint8)
    img = np.full((8, 8, 3), 128.0)
    out = ordered_dither(img, pal, BAYER_MATRIX_4X4)
    vals = set(np.unique(out))
    assert vals <= {0, 255} and len(vals) == 2  # dithers between both
    frac_white = (out == 255).mean()
    assert 0.3 < frac_white < 0.7  # 50% gray -> roughly half white


@pytest.mark.parametrize("method", sorted(DIFFUSION_MAPS))
def test_error_diffusion_native_matches_numpy(method):
    if not native.available():
        pytest.skip("native kernels unavailable")
    rng = np.random.default_rng(1)
    img = rng.uniform(0, 255, (12, 10, 3))
    pal = rng.integers(0, 256, (4, 3)).astype(np.float64)
    ref = error_diffusion_dither_numpy(img, DIFFUSION_MAPS[method], pal)
    out = native.error_diffusion(img, DIFFUSION_MAPS[method], pal)
    np.testing.assert_allclose(out, ref, atol=1e-9)


def test_error_diffusion_preserves_mean():
    # error diffusion conserves average intensity on a 2-colour palette
    pal = np.array([[0.0, 0.0, 0.0], [255.0, 255.0, 255.0]])
    img = np.full((32, 32, 3), 100.0)
    out = error_diffusion_dither_numpy(img, DIFFUSION_MAPS["floyd-steinberg"], pal)
    assert abs(out.mean() - 100.0) < 8.0


def test_full_entry_point_with_dither():
    # reference self-test case 2 (quantize.py:633): RGB444 + 32-colour
    # palette + floyd-steinberg
    img = _gradient(16, 16)
    out = reduce_color_depth_and_dither(
        img, "RGB444", target_palette_size=32,
        dithering_method="floyd-steinberg", palette_algorithm="median_cut",
    )
    assert out.dtype == np.uint8 and out.shape == img.shape
    assert len(np.unique(out.reshape(-1, 3), axis=0)) <= 32


def test_expected_value_errors():
    img = _gradient(8, 8)
    # reference self-test cases 10-11 (quantize.py:681-693)
    with pytest.raises(ValueError):
        reduce_color_depth_and_dither(img, "RGB444", dithering_method="checkerboard")
    with pytest.raises(ValueError):
        reduce_color_depth_and_dither(img, "RGB444", dithering_method="bayer4x4")
    with pytest.raises(ValueError):
        reduce_color_depth_and_dither(img, "RGB999")
    with pytest.raises(ValueError):
        reduce_color_depth_and_dither(img, "RGB444", target_palette_size=33)
    with pytest.raises(ValueError):
        reduce_color_depth_and_dither(img.astype(np.float32), "RGB444")


def test_entry_point_pallas_backend_matches_numpy():
    img = _gradient(16, 16)
    kwargs = dict(color_space="RGB444", target_palette_size=16,
                  dithering_method="bayer4x4", palette_algorithm="median_cut")
    ref = reduce_color_depth_and_dither(img, **kwargs)
    out = reduce_color_depth_and_dither(img, backend="pallas", **kwargs)
    assert (out == ref).all(axis=-1).mean() >= 0.98  # fp32/fp64 ties only
