"""Byte-level parity of our dither kernels against goldens captured from the
REFERENCE's own kernels (dataset_generator/quantize.py:64-331).

Goldens come from tests/golden_gen/gen_dither_goldens.py, which runs the
actual reference module. CAVEAT: this image has no numba, so the committed
npz was captured through an interpreted no-op ``@njit`` shim. The shim is
argued (not proven) IEEE-equivalent to numba-compiled output: the kernels
are straight-line float64 arithmetic with no fastmath/parallel flags, so
LLVM may not reassociate. To verify on any numba-capable machine, run
``python tests/golden_gen/gen_dither_goldens.py`` there (numba auto-detected,
kernels JIT-compiled) and diff the resulting npz byte-for-byte against the
committed one. Until that run exists, these tests certify parity with the
reference's *interpreted* kernels. Skips if the npz is absent.
"""
import os

import numpy as np
import pytest

from fs_uae_image_enhancer_project_tpu.datagen.quantize import (
    BAYER_MATRIX_2X2,
    BAYER_MATRIX_4X4,
    BAYER_MATRIX_8X8,
    DIFFUSION_MAPS,
    checkerboard_dither,
    error_diffusion_dither_numpy,
    ordered_dither,
    reduce_color_depth_and_dither,
)

GOLDENS = os.path.join(os.path.dirname(__file__), "goldens", "dither_goldens.npz")

pytestmark = pytest.mark.skipif(
    not os.path.exists(GOLDENS), reason="dither goldens not generated"
)


@pytest.fixture(scope="module")
def g():
    return np.load(GOLDENS)


@pytest.mark.parametrize("n", [2, 16, 64])
@pytest.mark.parametrize("method", sorted(DIFFUSION_MAPS))
def test_error_diffusion_numpy_matches_reference(g, n, method):
    img = g["img"].astype(np.float64)
    pal_f = g[f"pal{n}"].astype(np.float64)
    ours = error_diffusion_dither_numpy(img, DIFFUSION_MAPS[method], pal_f)
    np.testing.assert_array_equal(ours, g[f"ed_{method}_pal{n}"])


@pytest.mark.parametrize("n", [2, 16, 64])
def test_error_diffusion_native_matches_reference(g, n):
    from fs_uae_image_enhancer_project_tpu.runtime import native

    if not native.available():
        pytest.skip("C++ dither kernel not built")
    img = g["img"].astype(np.float64)
    pal_f = g[f"pal{n}"].astype(np.float64)
    ours = native.error_diffusion(
        img, DIFFUSION_MAPS["floyd-steinberg"], pal_f
    )
    np.testing.assert_array_equal(ours, g[f"ed_floyd-steinberg_pal{n}"])


@pytest.mark.parametrize("n", [2, 16, 64])
def test_checkerboard_matches_reference(g, n):
    img = g["img"].astype(np.float64)
    ours = checkerboard_dither(img, g[f"pal{n}"])
    np.testing.assert_array_equal(ours, g[f"cb_pal{n}"])


@pytest.mark.parametrize("n", [2, 16, 64])
@pytest.mark.parametrize("m,mat", [(2, BAYER_MATRIX_2X2), (4, BAYER_MATRIX_4X4),
                                   (8, BAYER_MATRIX_8X8)])
def test_ordered_matches_reference(g, n, m, mat):
    img = g["img"].astype(np.float64)
    ours = ordered_dither(img, g[f"pal{n}"], mat)
    np.testing.assert_array_equal(ours, g[f"od_bayer{m}_pal{n}"])


@pytest.mark.parametrize(
    "cs,pal,alg,method",
    [
        ("RGB444", 16, "median_cut", "floyd-steinberg"),
        ("RGB444", 32, "octree", "bayer4x4"),
        ("RGB565", 16, "median_cut", "checkerboard"),
        ("RGB888", 64, "median_cut", "atkinson"),
        ("RGB666", None, None, "none"),
    ],
)
def test_end_to_end_matches_reference(g, cs, pal, alg, method):
    kwargs = dict(dithering_method=method)
    if pal is not None:
        kwargs.update(target_palette_size=pal, palette_algorithm=alg)
    ours = reduce_color_depth_and_dither(g["img"], cs, **kwargs)
    np.testing.assert_array_equal(ours, g[f"e2e_{cs}_{pal}_{alg}_{method}"])
