"""Generate reference-behavior goldens for the datagen geometry functions.

Runs the ACTUAL reference ``dataset_generator/util.py`` (PIL/numpy only —
its quantize import fails gracefully without numba) over a deterministic
synthetic image and records byte-level outputs for:

- should_discard_by_black_ratio at/below the 75% threshold,
- get_crop_and_pad incl. negative coords and out-of-bounds crops,
- apply_rotation (2x supersampled) at several angles,
- apply_downscaling (LANCZOS) at several percentages,
- pre/post_apply_resolution_style for all four Amiga styles.

    python tests/golden_gen/gen_geometry_goldens.py

Writes tests/goldens/geometry_goldens.npz, consumed by
tests/test_generator.py::test_geometry_matches_reference_golden.
"""
import os
import sys

import numpy as np
from PIL import Image

REF_DG_DIR = os.environ.get(
    "REF_DATASET_GENERATOR", "/root/reference/dataset_generator"
)
OUT = os.path.join(
    os.path.dirname(__file__), "..", "goldens", "geometry_goldens.npz"
)


def synthetic_image(w=64, h=48, seed=3) -> Image.Image:
    rng = np.random.default_rng(seed)
    arr = rng.integers(0, 256, (h, w, 3), np.uint8)
    # structured gradient so resampling has smooth content too
    gx = np.linspace(0, 255, w, dtype=np.uint8)[None, :, None]
    arr = ((arr.astype(np.int32) + gx.astype(np.int32)) // 2).astype(np.uint8)
    return Image.fromarray(arr, "RGB")


CROPS = [(0, 0, 32, 24), (-8, -4, 32, 24), (48, 40, 32, 24), (60, 44, 8, 8)]
ANGLES = [0, 20, 45, 80]
SCALES = [40, 75, 100]
STYLES = ["lores", "hires", "lores_laced", "hires_laced"]


def main() -> int:
    sys.path.insert(0, REF_DG_DIR)
    import util as ref_util

    img = synthetic_image()
    g = {"src": np.asarray(img)}

    # black-ratio threshold behavior: exactly-75% black is not >, 76% is
    base = np.full((10, 10, 3), 200, np.uint8)
    b75 = base.copy(); b75.reshape(-1, 3)[:75] = 0
    b76 = base.copy(); b76.reshape(-1, 3)[:76] = 0
    g["black75"] = b75
    g["black76"] = b76
    g["black75_discard"] = np.array(
        ref_util.should_discard_by_black_ratio(Image.fromarray(b75)))
    g["black76_discard"] = np.array(
        ref_util.should_discard_by_black_ratio(Image.fromarray(b76)))

    for i, (x, y, w, h) in enumerate(CROPS):
        g[f"crop{i}"] = np.asarray(
            ref_util.get_crop_and_pad(img, x, y, w, h))
    for a in ANGLES:
        g[f"rot{a}"] = np.asarray(ref_util.apply_rotation(img, a))
    for s in SCALES:
        g[f"scale{s}"] = np.asarray(ref_util.apply_downscaling(img, s))
    for st in STYLES:
        low = ref_util.pre_apply_resolution_style(img, st)
        g[f"pre_{st}"] = np.asarray(low)
        g[f"post_{st}"] = np.asarray(
            ref_util.post_apply_resolution_style(low, st))

    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    np.savez_compressed(OUT, **g)
    print(f"wrote {OUT} with {len(g)} arrays; "
          f"75%->{g['black75_discard']}, 76%->{g['black76_discard']}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
