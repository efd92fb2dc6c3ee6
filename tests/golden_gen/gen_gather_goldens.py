"""Generate reference-behavior goldens for the sample gatherer.

Runs the ACTUAL reference ``gather_all_samples_from_directory``
(model/srdataset.py:141-244 — torch-importing module, so this is a
torch-only process) over a synthetic generator-output tree exercising:

- styled/target pairing per (dir, crop_x, crop_y, s<scale>, r<rot>) group,
- negative crop coordinates and negative rotations,
- pal 'None' styled names and hyphenated dither names,
- a wrong-size target (whole group dropped),
- a styled file with no target (dropped),
- unparseable filenames and root-level files (ignored),
- the styles_to_include substring filter.

Writes tests/goldens/gather_goldens.json: the tree spec (file name,
subdir, pixel size) plus the reference's sorted relative pair lists for
the unfiltered and rgb444-filtered runs. The consuming test
(tests/test_data.py::test_gather_matches_reference_golden) recreates the
tree and compares our gatherer's output.

    python tests/golden_gen/gen_gather_goldens.py
"""
import json
import os
import sys
import tempfile

from PIL import Image

REF_MODEL_DIR = os.environ.get("REF_MODEL_DIR", "/root/reference/model")
OUT = os.path.join(
    os.path.dirname(__file__), "..", "goldens", "gather_goldens.json"
)

CROP = (16, 16)  # (W, H)

# (subdir, filename, (w, h)); subdir "" = the split root (must be skipped)
TREE = [
    ("image_a", "target_0_0_s100_r0.png", CROP),
    ("image_a", "lores_0_0_s100_r0_rgb444_p32_datkinson.png", CROP),
    ("image_a", "lores_0_0_s100_r0_rgb666_pNone_dnone.png", CROP),
    ("image_a", "target_-8_4_s75_r-20.png", CROP),
    ("image_a", "hires_-8_4_s75_r-20_rgb555_p64_dfloyd-steinberg.png", CROP),
    # wrong-size target: the whole (image_a, 32, 0, s100, r0) group drops
    ("image_a", "target_32_0_s100_r0.png", (8, 8)),
    ("image_a", "lores_32_0_s100_r0_rgb444_p16_dbayer4x4.png", CROP),
    # styled with no target at its location: dropped
    ("image_b", "lores_0_0_s100_r0_rgb444_p32_datkinson.png", CROP),
    # second scene with a valid pair
    ("image_b", "target_0_16_s50_r40.png", CROP),
    ("image_b", "lores_laced_0_16_s50_r40_rgb565_p256_dsierra3.png", CROP),
    # noise: unparseable name, non-png, root-level target
    ("image_b", "garbage.png", CROP),
    ("image_b", "lores_0_0_s100_r0_rgb444_p32_datkinson.txt", CROP),
    ("", "target_0_0_s100_r0.png", CROP),
]


def build_tree(base: str) -> None:
    for subdir, name, size in TREE:
        d = os.path.join(base, subdir) if subdir else base
        os.makedirs(d, exist_ok=True)
        path = os.path.join(d, name)
        if name.endswith(".png"):
            Image.new("RGB", size, (1, 2, 3)).save(path)
        else:  # non-png noise entry: any bytes will do
            with open(path, "wb") as f:
                f.write(b"not an image")


def main() -> int:
    sys.path.insert(0, REF_MODEL_DIR)
    # srdataset imports torchvision (absent in this image) at module level;
    # the gatherer itself never touches it — stub just enough to import
    import types

    tv = types.ModuleType("torchvision")
    tvt = types.ModuleType("torchvision.transforms")
    tvf = types.ModuleType("torchvision.transforms.functional")
    tvt.ToTensor = type("ToTensor", (), {})
    tv.transforms = tvt
    tvt.functional = tvf
    sys.modules.setdefault("torchvision", tv)
    sys.modules.setdefault("torchvision.transforms", tvt)
    sys.modules.setdefault("torchvision.transforms.functional", tvf)
    from srdataset import gather_all_samples_from_directory

    with tempfile.TemporaryDirectory() as base:
        build_tree(base)

        def rel_pairs(styles):
            pairs = gather_all_samples_from_directory(
                base, CROP, styles_to_include=styles, verbose=0)
            return sorted(
                (os.path.relpath(s, base), os.path.relpath(t, base))
                for s, t in pairs
            )

        golden = {
            "crop": list(CROP),
            "tree": [[sub, name, list(size)] for sub, name, size in TREE],
            "pairs_all": rel_pairs(None),
            "pairs_rgb444": rel_pairs({"rgb444"}),
        }

    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with open(OUT, "w") as f:
        json.dump(golden, f, indent=1)
    print(f"wrote {OUT}: {len(golden['pairs_all'])} pairs unfiltered, "
          f"{len(golden['pairs_rgb444'])} rgb444-filtered")
    return 0


if __name__ == "__main__":
    sys.exit(main())
