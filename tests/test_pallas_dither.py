"""Pallas fused dither kernel vs the numpy reference implementations.

Runs in interpret mode on CPU (the driver/test environment); the same kernel
compiles through Mosaic on real TPU (verified on hardware). Small mismatch
fractions are fp32-vs-fp64 distance ties, bounded explicitly.
"""
import numpy as np
import pytest

from fs_uae_image_enhancer_project_tpu.datagen.quantize import (
    BAYER_MATRIX_2X2,
    BAYER_MATRIX_4X4,
    checkerboard_dither,
    map_to_palette,
    ordered_dither,
)
from fs_uae_image_enhancer_project_tpu.ops.pallas.dither import (
    pallas_palette_dither,
)

RNG = np.random.default_rng(0)
IMG = RNG.uniform(0, 255, (24, 32, 3)).astype(np.float64)
PAL = RNG.integers(0, 256, (16, 3)).astype(np.uint8)


def _match_fraction(a, b):
    return float((a == b).all(axis=-1).mean())


def test_pallas_map_matches_numpy():
    out = pallas_palette_dither(IMG.astype(np.float32), PAL, "none")
    ref = map_to_palette(IMG, PAL)
    assert _match_fraction(out, ref) >= 0.98
    # every output colour is a palette colour (all pixels)
    flat = out.reshape(-1, 3)
    matches = (flat[:, None, :] == PAL[None]).all(-1).any(-1)
    assert matches.all()


def test_pallas_checkerboard_matches_numpy():
    out = pallas_palette_dither(IMG.astype(np.float32), PAL, "checkerboard")
    ref = checkerboard_dither(IMG, PAL)
    assert _match_fraction(out, ref) >= 0.98


@pytest.mark.parametrize("bayer", [BAYER_MATRIX_2X2, BAYER_MATRIX_4X4])
def test_pallas_ordered_matches_numpy(bayer):
    out = pallas_palette_dither(IMG.astype(np.float32), PAL, "ordered", bayer)
    ref = ordered_dither(IMG, PAL, bayer)
    assert _match_fraction(out, ref) >= 0.98


def test_pallas_exact_palette_colors_stay_fixed():
    img = np.zeros((8, 8, 3), np.float32)
    img[:] = PAL[3].astype(np.float32)
    out = pallas_palette_dither(img, PAL, "checkerboard")
    np.testing.assert_array_equal(out, np.broadcast_to(PAL[3], out.shape))


def test_pallas_palette_size_validation():
    with pytest.raises(ValueError):
        pallas_palette_dither(IMG.astype(np.float32), PAL[:1], "none")
    with pytest.raises(ValueError):
        pallas_palette_dither(IMG.astype(np.float32), PAL, "ordered")  # no bayer
