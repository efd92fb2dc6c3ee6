"""Run the ACTUAL reference dataset generator end-to-end on a tiny corpus
and record its output tree (relative paths + sha256 per file).

This is the L0 parity capstone: the reference's 1687-LoC orchestrator
(dataset_generator/generator.py) executed for real — numba shimmed to
interpreted kernels (same bodies), diskcache shimmed to a dict — over a
deterministic 2-image corpus with a deterministic spec space (grid-only
RGB444 quantization, no palettes: k-means would not be cross-library
reproducible). The consuming test
(tests/test_generator.py::test_generator_output_matches_reference_golden)
runs OUR generator CLI on the same corpus/spec and compares the file set
and bytes.

Quota note: the reference's --train_num_crops is an exact target count
(0 keeps zero targets!); passing a quota larger than the full valid grid
selects ALL crops, making the spec SET deterministic despite the
random.shuffle in the selection.

    python tests/golden_gen/gen_generator_goldens.py
"""
import hashlib
import json
import os
import runpy
import sys
import tempfile
import types

import numpy as np
from PIL import Image

REF_DG_DIR = os.environ.get(
    "REF_DATASET_GENERATOR", "/root/reference/dataset_generator"
)
OUT = os.path.join(
    os.path.dirname(__file__), "..", "goldens", "generator_goldens.npz"
)

CROP_W, CROP_H = 64, 48


def install_shims() -> None:
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
    try:
        import diskcache  # noqa: F401
    except ImportError:
        dc = types.ModuleType("diskcache")

        class Cache(dict):
            def __init__(self, *a, **k):
                super().__init__()

            def get(self, k, default=None):
                return dict.get(self, k, default)

            def close(self):
                pass

        dc.Cache = Cache
        sys.modules["diskcache"] = dc


def make_corpus(d: str) -> list:
    """Two deterministic 128x96 images (gradient + structured noise)."""
    specs = []
    for i, seed in enumerate((11, 22)):
        rng = np.random.default_rng(seed)
        arr = rng.integers(0, 256, (96, 128, 3), np.uint8)
        gy = np.linspace(0, 255, 96, dtype=np.uint8)[:, None, None]
        arr = ((arr.astype(np.int32) + gy.astype(np.int32)) // 2).astype(
            np.uint8)
        name = f"scene{i}.png"
        Image.fromarray(arr, "RGB").save(os.path.join(d, name))
        specs.append([name, arr.tolist()])
    return specs


def hash_tree(base: str) -> dict:
    out = {}
    for root, _dirs, files in os.walk(base):
        for f in files:
            p = os.path.join(root, f)
            rel = os.path.relpath(p, base)
            out[rel] = hashlib.sha256(open(p, "rb").read()).hexdigest()
    return out


def main() -> int:
    install_shims()
    sys.path.insert(0, REF_DG_DIR)

    def run_reference(dest, cache, extra):
        argv = [
            "generator.py",
            "--train_images", corpus,
            "--destination_dir", dest,
            "--crop_size", str(CROP_W), str(CROP_H),
            "--train_num_crops", "999",
            "--rotate", "0",
            "--resolution", "lores",
            "--max_workers", "1",
            "--verbose", "0",
            "--train_cache_file", cache,
        ] + extra
        old_argv = sys.argv
        sys.argv = argv
        try:
            runpy.run_path(
                os.path.join(REF_DG_DIR, "generator.py"),
                run_name="__main__",
            )
        finally:
            sys.argv = old_argv
        return hash_tree(dest)

    with tempfile.TemporaryDirectory() as work:
        corpus = os.path.join(work, "gt")
        os.makedirs(corpus)
        corpus_spec = make_corpus(corpus)

        # run A: non-palette grid quantization — byte-parity target.
        # Reference quirk: without --palette only 'None'/'checkerboard'
        # dithers are valid (bayer2x2 here is deliberately DROPPED by the
        # reference's style-combination rules; we request it to pin that).
        tree_grid = run_reference(
            os.path.join(work, "out_a"), os.path.join(work, "cache_a"),
            ["--rgb", "444", "--dither", "None", "bayer2x2"])

        # run B: palette spec space (median_cut) — FILENAME-SET parity only
        # (palette numerics are not reproducible across implementations).
        tree_pal = run_reference(
            os.path.join(work, "out_b"), os.path.join(work, "cache_b"),
            ["--rgb", "444", "--palette", "16",
             "--dither", "None", "atkinson", "bayer2x2",
             "--palette_algorithm", "median_cut"])

        # run C: checkerboard WITHOUT 'None' on a non-palette spec — the
        # reference's if/elif quirk generates checkerboard-on-grid ONLY
        # when 'None' is not also requested. Deterministic kernel -> byte
        # parity through the whole generator path.
        tree_checker = run_reference(
            os.path.join(work, "out_c"), os.path.join(work, "cache_c"),
            ["--rgb", "444", "--dither", "checkerboard"])

    golden = {
        "crop": [CROP_W, CROP_H],
        "corpus_names": [c[0] for c in corpus_spec],
        "spec_grid": {"rgb": [444], "dither": ["none", "bayer2x2"],
                      "rotate": [0], "resolution": ["lores"]},
        "spec_palette": {"rgb": [444], "palette": [16],
                         "dither": ["none", "atkinson", "bayer2x2"],
                         "rotate": [0], "resolution": ["lores"],
                         "palette_algorithm": "median_cut"},
        "spec_checker": {"rgb": [444], "dither": ["checkerboard"],
                         "rotate": [0], "resolution": ["lores"]},
        "files": tree_grid,
        "files_palette": tree_pal,
        "files_checker": tree_checker,
    }
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    # compact container: JSON metadata + uint8 corpus arrays (a plain JSON
    # with pixel lists was ~1.1 MB; this npz is ~70 KB)
    arrays = {f"corpus_{i}": np.asarray(c[1], np.uint8)
              for i, c in enumerate(corpus_spec)}
    np.savez_compressed(
        OUT,
        meta=np.frombuffer(json.dumps(golden, sort_keys=True).encode(),
                           np.uint8),
        **arrays,
    )
    print(f"wrote {OUT}: {len(tree_grid)} grid, {len(tree_pal)} palette, "
          f"{len(tree_checker)} checkerboard files")
    return 0


if __name__ == "__main__":
    sys.exit(main())
