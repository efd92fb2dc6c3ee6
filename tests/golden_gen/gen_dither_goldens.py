"""Capture byte-level goldens from the REFERENCE's quantize/dither kernels.

Runs the actual reference module (``dataset_generator/quantize.py`` from
cminnoy/fs_uae_image_enhancer_project). When numba is installed the kernels
run JIT-compiled; when it is not, a shim runs the identical Python bodies
interpreted. Equivalence argument (unverified — no numba in this image):
@njit without fastmath should be IEEE-semantics-preserving for these
straight-line float64 kernels (no parallelism, no reassociation flags).
To settle it, run this script once on a numba-capable machine and diff the
produced npz byte-for-byte against the committed one:

    REF_DATASET_GENERATOR=/path/to/reference/dataset_generator \
        python tests/golden_gen/gen_dither_goldens.py
    cmp tests/goldens/dither_goldens.npz <committed copy>  # or np.load-diff

    REF_DATASET_GENERATOR=/path/to/reference/dataset_generator \
        python tests/golden_gen/gen_dither_goldens.py

Writes tests/goldens/dither_goldens.npz, consumed by
tests/test_dither_goldens.py. Keys:

    img                      (32, 48, 3) uint8 test image (fixed seed)
    pal<N>                   (N, 3) uint8 fixed random palettes, N in {2,16,64}
    ed_<method>_pal<N>       error-diffusion kernel output, float64
    cb_pal<N>                checkerboard kernel output, uint8
    od_bayer<M>_pal<N>       ordered-dither kernel output, uint8
    e2e_<cs>_<pal>_<alg>_<method>  full reduce_color_depth_and_dither, uint8

Never imports jax (golden-gen processes are torch/numba-side only).
"""
import os
import sys
import types

import numpy as np

REF_DIR = os.environ.get(
    "REF_DATASET_GENERATOR", "/root/reference/dataset_generator"
)
OUT = os.path.join(os.path.dirname(__file__), "..", "goldens", "dither_goldens.npz")


def _load_reference_quantize():
    try:
        import numba  # noqa: F401
    except ImportError:
        shim = types.ModuleType("numba")

        def njit(*args, **kwargs):
            if args and callable(args[0]):
                return args[0]
            return lambda fn: fn

        shim.njit = njit
        sys.modules["numba"] = shim
    sys.path.insert(0, REF_DIR)
    import quantize as ref_quantize

    return ref_quantize


def main() -> None:
    rq = _load_reference_quantize()
    rng = np.random.default_rng(42)
    g = {}

    img = rng.integers(0, 256, (32, 48, 3), dtype=np.uint8)
    g["img"] = img
    palettes = {n: rng.integers(0, 256, (n, 3), dtype=np.uint8) for n in (2, 16, 64)}
    for n, p in palettes.items():
        g[f"pal{n}"] = p

    # --- kernel-level goldens --------------------------------------------
    for n, pal_u8 in palettes.items():
        pal_f = pal_u8.astype(np.float64)

        for method, diff_map in rq.DIFFUSION_MAPS.items():
            buf = img.astype(np.float64).copy()
            rq._apply_palette_dithering_numba(buf, list(diff_map), pal_f)
            g[f"ed_{method}_pal{n}"] = buf

        out = np.zeros_like(img)
        rq._apply_checkerboard_dithering_numba_optimized(
            img.astype(np.float64), pal_f, pal_u8, out
        )
        g[f"cb_pal{n}"] = out.copy()

        for m, mat in ((2, rq.BAYER_MATRIX_2X2), (4, rq.BAYER_MATRIX_4X4),
                       (8, rq.BAYER_MATRIX_8X8)):
            out = np.zeros_like(img)
            rq._apply_ordered_dithering_numba_optimized(
                img.astype(np.float64), pal_f, pal_u8, out,
                mat.astype(np.float64) / (m * m),
            )
            g[f"od_bayer{m}_pal{n}"] = out.copy()

    # --- end-to-end goldens (deterministic palette algorithms only) ------
    cases = [
        ("RGB444", 16, "median_cut", "floyd-steinberg"),
        ("RGB444", 32, "octree", "bayer4x4"),
        ("RGB565", 16, "median_cut", "checkerboard"),
        ("RGB888", 64, "median_cut", "atkinson"),
        ("RGB666", None, None, "none"),
    ]
    for cs, pal, alg, method in cases:
        kwargs = dict(dithering_method=method, verbose=0)
        if pal is not None:
            kwargs.update(target_palette_size=pal, palette_algorithm=alg)
        out = rq.reduce_color_depth_and_dither(img, cs, **kwargs)
        g[f"e2e_{cs}_{pal}_{alg}_{method}"] = out

    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    np.savez_compressed(OUT, **g)
    print(f"wrote {os.path.abspath(OUT)} ({len(g)} arrays)")


if __name__ == "__main__":
    main()
