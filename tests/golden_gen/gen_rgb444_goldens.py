"""Generate reference-behavior goldens for the RGB444 swatch generator.

Runs the ACTUAL reference ``dataset_generator/rgb444_flat_image_generator.py``
(PIL-only) at a tiny swatch size and records:

- the full 4096-filename set (the reference spells lowercase hex with a
  trailing '0': ``rgb444_fff0.png`` — rgb444_flat_image_generator.py:17-22),
- pixel bytes for a sample of swatches (4-bit -> 8-bit scaling is
  ``v*16 + v``, :27-30).

    python tests/golden_gen/gen_rgb444_goldens.py

Writes tests/goldens/rgb444_goldens.npz, consumed by
tests/test_generator.py::test_rgb444_matches_reference_golden.
"""
import contextlib
import io
import os
import sys
import tempfile

import numpy as np
from PIL import Image

REF_DG_DIR = os.environ.get(
    "REF_DATASET_GENERATOR", "/root/reference/dataset_generator"
)
OUT = os.path.join(
    os.path.dirname(__file__), "..", "goldens", "rgb444_goldens.npz"
)

SAMPLES = ["rgb444_0000.png", "rgb444_08f0.png", "rgb444_fff0.png",
           "rgb444_1a70.png"]


def main() -> int:
    sys.path.insert(0, REF_DG_DIR)
    import rgb444_flat_image_generator as ref_mod

    g = {}
    with tempfile.TemporaryDirectory() as td:
        gen = ref_mod.Rgb444Generator(width=4, height=3, output_dir=td)
        with contextlib.redirect_stdout(io.StringIO()):  # 4096 print lines
            gen.generate_all_rgb444()
        names = sorted(os.listdir(td))
        g["names"] = np.array(names)
        for s in SAMPLES:
            with Image.open(os.path.join(td, s)) as im:
                g[f"px::{s}"] = np.asarray(im)

    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    np.savez_compressed(OUT, **g)
    print(f"wrote {OUT}: {len(names)} names, first={names[0]} last={names[-1]}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
