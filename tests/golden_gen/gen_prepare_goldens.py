"""Generate reference-behavior goldens for ground-truth preparation.

Runs the ACTUAL reference ``dataset_generator/prepare_groundtruth.py``
(PIL-only) over a synthetic input tree and records byte-level outputs for:

- the ICC->sRGB path (an embedded XYZ profile, a real LCMS transform —
  prepare_groundtruth.py:16-29),
- palette-GIF and RGBA and grayscale mode conversion (:26-29),
- the --max_crop_size thumbnail semantics: PIL ``thumbnail`` rounding and
  reducing_gap resampling, triggered by ``w > W or h > H`` (:32-35),
- extension coverage (.gif is in the reference's IMAGE_EXTS).

The INPUT files' exact bytes are stored too, so the consuming test can
materialize the identical tree and run our ``datagen.prepare_groundtruth``
against it.

    python tests/golden_gen/gen_prepare_goldens.py

Writes tests/goldens/prepare_goldens.npz, consumed by
tests/test_generator.py::test_prepare_groundtruth_matches_reference_golden.
"""
import io
import os
import sys
import tempfile
from pathlib import Path

import numpy as np
from PIL import Image, ImageCms

REF_DG_DIR = os.environ.get(
    "REF_DATASET_GENERATOR", "/root/reference/dataset_generator"
)
OUT = os.path.join(
    os.path.dirname(__file__), "..", "goldens", "prepare_goldens.npz"
)


def build_inputs(root: Path) -> dict:
    """Create the synthetic source tree; return {relpath: file bytes}."""
    rng = np.random.default_rng(11)
    files = {}

    def put(rel: str, img: Image.Image, fmt: str, **save_kw) -> None:
        p = root / rel
        p.parent.mkdir(parents=True, exist_ok=True)
        img.save(p, format=fmt, **save_kw)
        files[rel] = p.read_bytes()

    # 1. RGB PNG with an embedded XYZ ICC profile -> real LCMS transform
    arr = rng.integers(0, 256, (40, 56, 3), np.uint8)
    xyz_bytes = ImageCms.ImageCmsProfile(ImageCms.createProfile("XYZ")).tobytes()
    put("icc/xyz.png", Image.fromarray(arr, "RGB"), "PNG", icc_profile=xyz_bytes)

    # 1b. RGB PNG with an embedded sRGB profile -> the transform SUCCEEDS
    # (a genuine LCMS profileToProfile run, pinning its rounding), while
    # the XYZ case above pins the cannot-build-transform fallback (:22-25)
    arr2 = rng.integers(0, 256, (33, 47, 3), np.uint8)
    srgb_bytes = ImageCms.ImageCmsProfile(
        ImageCms.createProfile("sRGB")).tobytes()
    put("icc/srgb.png", Image.fromarray(arr2, "RGB"), "PNG",
        icc_profile=srgb_bytes)

    # 2. palette GIF (mode P) -> RGB; also covers the .gif extension
    garr = rng.integers(0, 256, (24, 32, 3), np.uint8)
    put("sub/pal.gif",
        Image.fromarray(garr, "RGB").quantize(colors=31), "GIF")

    # 3. RGBA PNG -> RGB
    aarr = rng.integers(0, 256, (20, 28, 4), np.uint8)
    put("alpha.png", Image.fromarray(aarr, "RGBA"), "PNG")

    # 4. grayscale PNG -> RGB
    larr = rng.integers(0, 256, (16, 22), np.uint8)
    put("gray.png", Image.fromarray(larr, "L"), "PNG")

    # 5. odd-size large image: exercises thumbnail rounding + reducing_gap
    barr = rng.integers(0, 256, (643, 1001, 3), np.uint8)
    # smooth gradient so LANCZOS/reduce differences would show
    gx = np.linspace(0, 255, 1001, dtype=np.float32)[None, :, None]
    barr = ((barr.astype(np.float32) + 3 * gx) / 4).astype(np.uint8)
    put("big/odd.png", Image.fromarray(barr, "RGB"), "PNG")

    # 6. one side over, one side under the box (reference triggers on OR)
    warr = rng.integers(0, 256, (100, 500, 3), np.uint8)
    put("big/wide.png", Image.fromarray(warr, "RGB"), "PNG")

    # 7. small image: must pass through unresized
    sarr = rng.integers(0, 256, (30, 40, 3), np.uint8)
    put("small.png", Image.fromarray(sarr, "RGB"), "PNG")
    return files


def main() -> int:
    sys.path.insert(0, REF_DG_DIR)
    import prepare_groundtruth as ref_prep

    g = {}
    with tempfile.TemporaryDirectory() as td:
        src = Path(td) / "src"
        src.mkdir()
        files = build_inputs(src)
        for rel, raw in files.items():
            g[f"in::{rel}"] = np.frombuffer(raw, np.uint8)

        for tag, max_crop in (("plain", None), ("boxed", (376, 288))):
            dst = Path(td) / f"out_{tag}"
            dst.mkdir()
            for rel in files:
                msg = ref_prep.process_image(src / rel, src, dst, max_crop)
                assert msg.startswith("OK"), (rel, msg)
            for p in sorted(dst.rglob("*.png")):
                rel = p.relative_to(dst).as_posix()
                with Image.open(p) as im:
                    g[f"{tag}::{rel}"] = np.asarray(im)

    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    np.savez_compressed(OUT, **g)
    names = [k for k in g if not k.startswith("in::")]
    print(f"wrote {OUT}: {len(files := [k for k in g if k.startswith('in::')])} "
          f"inputs, {len(names)} outputs")
    for k in sorted(names):
        print(f"  {k}: {g[k].shape}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
