"""Dataset generator end-to-end tests: idempotence, spec-diff resume, orphan
cleanup, geometry utilities, scan cache."""
import os

import numpy as np
import pytest
from PIL import Image

from fs_uae_image_enhancer_project_tpu.datagen.cache import ScanCache
from fs_uae_image_enhancer_project_tpu.datagen.generator import (
    DatasetGenerator,
    GeneratorConfig,
)
from fs_uae_image_enhancer_project_tpu.datagen.util_img import (
    apply_downscaling,
    apply_rotation,
    calculate_grid_coords,
    get_crop_and_pad,
    post_apply_resolution_style,
    pre_apply_resolution_style,
    should_discard_by_black_ratio,
)


def _write_source(path, w=64, h=48):
    rng = np.random.default_rng(5)
    arr = rng.integers(30, 256, (h, w, 3), dtype=np.uint8)  # non-black
    Image.fromarray(arr).save(path)


@pytest.fixture
def source_tree(tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    _write_source(str(src / "img_a.png"))
    return tmp_path


def _cfg(tmp_path, **kw):
    defaults = dict(
        train_images=[str(tmp_path / "src")],
        dest_dir=str(tmp_path / "out"),
        crop_w=32, crop_h=24,
        resolutions=("lores",),
        colorspaces=("RGB444",),
        palettes=(8,),
        dithers=("bayer2x2",),
        rotations=(0,),
        downscales=(100,),
        palette_algorithm="median_cut",
        workers=1,
        cache_dir=str(tmp_path / "cache"),
        verbose=0,
    )
    defaults.update(kw)
    return GeneratorConfig(**defaults)


def test_generator_end_to_end_and_idempotence(source_tree):
    cfg = _cfg(source_tree)
    gen = DatasetGenerator(cfg)
    stats = gen.run()
    assert stats["missing"] == 0
    assert stats["generated_this_run"] > 0
    first_total = stats["expected"]

    # second run: nothing new to generate (idempotence)
    stats2 = DatasetGenerator(cfg).run()
    assert stats2["generated_this_run"] == 0
    assert stats2["expected"] == first_total

    # filenames parse and pair: gatherer finds styled/target pairs
    from fs_uae_image_enhancer_project_tpu.data import gather_all_samples_from_directory

    pairs = gather_all_samples_from_directory(
        os.path.join(cfg.dest_dir, "train"), (32, 24), verbose=0
    )
    assert len(pairs) > 0


def test_generator_resumes_after_deletion(source_tree):
    cfg = _cfg(source_tree)
    DatasetGenerator(cfg).run()
    # delete one generated file: next run regenerates exactly it
    train_dir = os.path.join(cfg.dest_dir, "train", "img_a")
    victim = sorted(os.listdir(train_dir))[0]
    os.remove(os.path.join(train_dir, victim))
    stats = DatasetGenerator(cfg).run()
    assert stats["generated_this_run"] == 1
    assert stats["missing"] == 0


def test_generator_removes_orphans(source_tree):
    cfg = _cfg(source_tree)
    DatasetGenerator(cfg).run()
    train_dir = os.path.join(cfg.dest_dir, "train", "img_a")
    # plant an orphan with a valid-looking spec not in the active space
    orphan = os.path.join(train_dir, "hires_0_0_s100_r0_rgb565_p64_dnone.png")
    Image.new("RGB", (32, 24)).save(orphan)
    DatasetGenerator(cfg).run()
    assert not os.path.exists(orphan)


def test_scan_cache_mtime_invalidation(tmp_path):
    src = tmp_path / "img.png"
    _write_source(str(src))
    cache = ScanCache(str(tmp_path / "c"))
    key = ScanCache.make_key(str(src), 0, 100)
    assert cache.get(key, str(src)) is None
    cache.put(key, str(src), [[1, 2]])
    assert cache.get(key, str(src)) == [[1, 2]]
    os.utime(str(src), (1, 1))  # mtime change invalidates
    assert cache.get(key, str(src)) is None


def test_scan_cache_key_covers_every_scan_parameter():
    """Regression: rerunning with a different --crop_size/--grid/threshold
    against the same cache dir must never serve the other run's coordinate
    list (the reference keys only path/rot/ds and has exactly that bug)."""
    keys = {
        ScanCache.make_key("img.png", 0, 0, "tile", 376, 288, 0.75),
        ScanCache.make_key("img.png", 0, 0, "overlap", 376, 288, 0.75),
        ScanCache.make_key("img.png", 0, 0, "tile", 64, 48, 0.75),
        ScanCache.make_key("img.png", 0, 0, "tile", 376, 288, 0.5),
        ScanCache.make_key("img.png", 20, 0, "tile", 376, 288, 0.75),
        ScanCache.make_key("img.png", 0, 50, "tile", 376, 288, 0.75),
    }
    assert len(keys) == 6


def test_dither_list_normalized_like_reference(tmp_path):
    """Reference generator.py:743-768: dither names are case-insensitive,
    invalid entries warn and are skipped, and an empty/all-invalid list
    defaults to no-dither instead of erroring."""
    import warnings

    cfg = GeneratorConfig(dest_dir=str(tmp_path / "d"), dithers=())
    assert cfg.dithers == ("none",)
    assert [c.dither for c in cfg.style_combos()] == ["none"]

    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        cfg = GeneratorConfig(dest_dir=str(tmp_path / "d"),
                              dithers=("Bayer4x4", "sponge", "NONE"))
    assert cfg.dithers == ("bayer4x4", "none")
    assert any("sponge" in str(x.message) for x in w)


# --- geometry utilities -----------------------------------------------------

def test_crop_and_pad_negative_coords():
    img = Image.new("RGB", (10, 10), (200, 100, 50))
    out = get_crop_and_pad(img, -4, -4, 8, 8)
    arr = np.asarray(out)
    assert arr.shape == (8, 8, 3)
    np.testing.assert_array_equal(arr[0, 0], [0, 0, 0])  # padded corner
    np.testing.assert_array_equal(arr[7, 7], [200, 100, 50])


def test_black_ratio():
    img = Image.new("RGB", (10, 10), (0, 0, 0))
    assert should_discard_by_black_ratio(img)
    arr = np.zeros((10, 10, 3), np.uint8)
    arr[:5] = 255  # 50% black < 75% threshold
    assert not should_discard_by_black_ratio(Image.fromarray(arr))


def test_rotation_and_downscale():
    img = Image.new("RGB", (20, 20), (10, 20, 30))
    assert apply_rotation(img, 0).size == (20, 20)
    assert apply_rotation(img, 45).size == (20, 20)
    assert apply_downscaling(img, 50).size == (10, 10)
    with pytest.warns(UserWarning):
        assert apply_downscaling(img, 100).size == (20, 20)


@pytest.mark.parametrize(
    "style,pre_size",
    [
        ("lores", (16, 12)),
        ("lores_laced", (16, 24)),
        ("hires", (32, 12)),
        ("hires_laced", (32, 24)),
    ],
)
def test_resolution_styles(style, pre_size):
    img = Image.new("RGB", (32, 24))
    low = pre_apply_resolution_style(img, style)
    assert low.size == pre_size
    restored = post_apply_resolution_style(low, style)
    assert restored.size == (32, 24)


def test_grid_coords_cover_image():
    coords = calculate_grid_coords(100, 80, 32, 24)
    assert len(coords) >= 4 * 4
    xs = [c[0] for c in coords]
    ys = [c[1] for c in coords]
    assert min(xs) <= 0 and max(xs) + 32 >= 100
    assert min(ys) <= 0 and max(ys) + 24 >= 80


def test_split_crop_quota_and_shrink(source_tree):
    # no quota: all crops
    full = DatasetGenerator(_cfg(source_tree)).run()
    full_expected = full["expected"]
    # quota of 2 train crops: shrink deletes the excess targets+styled
    cfg_q = _cfg(source_tree, train_num_crops=2)
    stats = DatasetGenerator(cfg_q).run()
    assert stats["missing"] == 0
    assert stats["expected"] < full_expected
    # targets on disk == quota
    import glob

    targets = glob.glob(
        os.path.join(cfg_q.dest_dir, "train", "*", "target_*.png")
    )
    assert len(targets) == 2
    # deterministic: rerun keeps the same selection, generates nothing
    stats2 = DatasetGenerator(cfg_q).run()
    assert stats2["generated_this_run"] == 0


def test_quota_anchored_to_existing_targets(source_tree):
    """Adding a new source image must not churn an already-built quota'd
    dataset: existing targets are kept first, only the shortfall fills."""
    import glob

    cfg_q = _cfg(source_tree, train_num_crops=2)
    DatasetGenerator(cfg_q).run()
    before = set(
        glob.glob(os.path.join(cfg_q.dest_dir, "train", "*", "target_*.png"))
    )
    assert len(before) == 2
    # add a second source image -> spec space changes
    _write_source(str(source_tree / "src" / "img_b.png"))
    stats = DatasetGenerator(cfg_q).run()
    after = set(
        glob.glob(os.path.join(cfg_q.dest_dir, "train", "*", "target_*.png"))
    )
    assert after == before  # no churn: the on-disk selection is kept
    assert stats["generated_this_run"] == 0


def test_quota_validation_and_warning(source_tree):
    with pytest.raises(ValueError):
        DatasetGenerator(_cfg(source_tree, train_num_crops=-1)).run()
    with pytest.warns(UserWarning, match="Cannot meet requested quota"):
        stats = DatasetGenerator(_cfg(source_tree, train_num_crops=9999)).run()
    assert stats["missing"] == 0


def test_sigint_during_scan_never_deletes(source_tree, monkeypatch):
    """A stop request that interrupts the scan must not classify the
    unscanned remainder as orphans (data-loss guard)."""
    from fs_uae_image_enhancer_project_tpu.datagen import generator as gen_mod

    cfg = _cfg(source_tree)
    DatasetGenerator(cfg).run()
    import glob

    n_before = len(glob.glob(os.path.join(cfg.dest_dir, "train", "*", "*.png")))
    assert n_before > 0
    monkeypatch.setattr(gen_mod, "_stop_requested", True)

    # run() resets the flag; re-set it via the scan path instead
    g = DatasetGenerator(cfg)

    def interrupted_scan(images):
        gen_mod._stop_requested = True
        return []  # partial scan: nothing collected

    g._scan_ground_truth = interrupted_scan
    stats = g.run()
    assert stats["stopped"]
    n_after = len(glob.glob(os.path.join(cfg.dest_dir, "train", "*", "*.png")))
    assert n_after == n_before  # nothing deleted


def test_prepare_groundtruth_max_crop_size(tmp_path):
    """--max_crop_size W H fits within the box (reference
    prepare_groundtruth.py:31-35 thumbnail semantics); mirrored tree and
    idempotent re-run."""
    from fs_uae_image_enhancer_project_tpu.datagen import prepare_groundtruth

    src = tmp_path / "orig" / "sub"
    src.mkdir(parents=True)
    _write_source(str(src / "wide.png"), w=200, h=50)
    _write_source(str(src / "small.png"), w=40, h=30)
    dst = tmp_path / "gt"
    rc = prepare_groundtruth.main([
        "--src", str(tmp_path / "orig"), "--dst", str(dst),
        "--max_crop_size", "100", "40",
    ])
    assert rc == 0
    with Image.open(dst / "sub" / "wide.png") as im:
        assert im.size == (100, 25)  # scale = min(100/200, 40/50) = 0.5
    with Image.open(dst / "sub" / "small.png") as im:
        assert im.size == (40, 30)  # already fits: untouched
    # idempotent: second run skips existing outputs
    assert prepare_groundtruth.main(
        ["--src", str(tmp_path / "orig"), "--dst", str(dst)]) == 0


def test_prepare_groundtruth_matches_reference_golden(tmp_path):
    """Byte-level parity with the reference's ACTUAL prepare_groundtruth
    (dataset_generator/prepare_groundtruth.py via
    golden_gen/gen_prepare_goldens.py): the successful ICC->sRGB LCMS
    transform (embedded sRGB), the cannot-build-transform fallback
    (embedded XYZ), palette-GIF/RGBA/grayscale RGB conversion, .gif
    extension coverage, and --max_crop_size ``thumbnail`` semantics
    (round-half-up sizing + reducing_gap resampling — a plain LANCZOS
    resize diverges on both)."""
    from fs_uae_image_enhancer_project_tpu.datagen import prepare_groundtruth

    g = np.load(os.path.join(os.path.dirname(__file__), "goldens",
                             "prepare_goldens.npz"))
    src = tmp_path / "src"
    for key in g.files:
        if not key.startswith("in::"):
            continue
        p = src / key[len("in::"):]
        p.parent.mkdir(parents=True, exist_ok=True)
        p.write_bytes(g[key].tobytes())

    for tag, box in (("plain", None), ("boxed", (376, 288))):
        dst = tmp_path / f"out_{tag}"
        results = prepare_groundtruth.prepare_tree(
            str(src), str(dst), max_dim=box, workers=2, verbose=0)
        assert all(err is None for _p, err in results), results
        expected = {k[len(tag) + 2:] for k in g.files
                    if k.startswith(f"{tag}::")}
        produced = {p.relative_to(dst).as_posix()
                    for p in dst.rglob("*.png")}
        assert produced == expected, (tag, produced ^ expected)
        for rel in sorted(expected):
            with Image.open(dst / rel) as im:
                np.testing.assert_array_equal(
                    np.asarray(im), g[f"{tag}::{rel}"],
                    err_msg=f"{tag}::{rel}")


def test_rgb444_matches_reference_golden(tmp_path):
    """Filename-set and pixel parity with the reference's ACTUAL RGB444
    swatch generator (rgb444_flat_image_generator.py via
    golden_gen/gen_rgb444_goldens.py): lowercase hex + trailing '0'
    spelling, v*17 4-bit->8-bit scaling."""
    from fs_uae_image_enhancer_project_tpu.datagen import rgb444_flat

    g = np.load(os.path.join(os.path.dirname(__file__), "goldens",
                             "rgb444_goldens.npz"))
    dest = tmp_path / "swatches"
    n = rgb444_flat.generate(str(dest), width=4, height=3, verbose=0)
    assert n == 4096
    assert sorted(os.listdir(dest)) == list(g["names"])
    for key in g.files:
        if not key.startswith("px::"):
            continue
        with Image.open(dest / key[len("px::"):]) as im:
            np.testing.assert_array_equal(np.asarray(im), g[key],
                                          err_msg=key)
    # idempotent: re-run writes nothing new
    assert rgb444_flat.generate(str(dest), width=4, height=3, verbose=0) == 0


def test_same_named_sources_in_subdirs_do_not_collide(tmp_path):
    """Two source images with the same filename in different subdirectories
    must each get their own output location (regression: basename-keyed
    output dirs dict-overwrote one image's crops with the other's)."""
    src = tmp_path / "src"
    (src / "setA").mkdir(parents=True)
    (src / "setB").mkdir()
    rng = np.random.default_rng(9)
    for sub in ("setA", "setB"):
        arr = rng.integers(30, 256, (48, 64, 3), dtype=np.uint8)
        Image.fromarray(arr).save(str(src / sub / "img1.png"))

    cfg = _cfg(tmp_path)
    res = DatasetGenerator(cfg).run()
    out_train = tmp_path / "out" / "train"
    dirs = sorted(os.listdir(out_train))
    assert len(dirs) == 2, dirs  # one output dir per SOURCE image
    assert any(d == "img1" or d.startswith("img1_") for d in dirs)
    # each dir's target must come from its own source (distinct content)
    targets = []
    for d in dirs:
        files = [f for f in os.listdir(out_train / d)
                 if f.startswith("target")]
        assert files
        targets.append(np.asarray(Image.open(out_train / d / files[0])))
    assert not np.array_equal(targets[0], targets[1])
    # re-run is a no-op (diff idempotence preserved with hashed bases)
    res2 = DatasetGenerator(cfg).run()
    assert res2["generated_this_run"] == 0


def test_geometry_matches_reference_golden():
    """Byte-level parity with the reference's actual geometry functions
    (dataset_generator/util.py via tests/golden_gen/gen_geometry_goldens.py):
    black-ratio threshold boundary (exactly 75% black IS discarded),
    crop+pad incl. negative/out-of-bounds coords, supersampled rotation,
    LANCZOS downscaling (100% returns a copy), and all four resolution
    styles pre+post."""
    import os

    import numpy as np

    g = np.load(os.path.join(os.path.dirname(__file__), "goldens",
                             "geometry_goldens.npz"))
    img = Image.fromarray(g["src"], "RGB")

    assert should_discard_by_black_ratio(
        Image.fromarray(g["black75"])) == bool(g["black75_discard"])
    assert should_discard_by_black_ratio(
        Image.fromarray(g["black76"])) == bool(g["black76_discard"])

    crops = [(0, 0, 32, 24), (-8, -4, 32, 24), (48, 40, 32, 24),
             (60, 44, 8, 8)]
    for i, (x, y, w, h) in enumerate(crops):
        np.testing.assert_array_equal(
            np.asarray(get_crop_and_pad(img, x, y, w, h)), g[f"crop{i}"],
            err_msg=f"crop{i}")
    for a in (0, 20, 45, 80):
        np.testing.assert_array_equal(
            np.asarray(apply_rotation(img, a)), g[f"rot{a}"],
            err_msg=f"rot{a}")
    for s in (40, 75, 100):
        np.testing.assert_array_equal(
            np.asarray(apply_downscaling(img, s)), g[f"scale{s}"],
            err_msg=f"scale{s}")
    for st in ("lores", "hires", "lores_laced", "hires_laced"):
        low = pre_apply_resolution_style(img, st)
        np.testing.assert_array_equal(
            np.asarray(low), g[f"pre_{st}"], err_msg=f"pre_{st}")
        np.testing.assert_array_equal(
            np.asarray(post_apply_resolution_style(low, st)),
            g[f"post_{st}"], err_msg=f"post_{st}")


def test_generator_output_matches_reference_golden(tmp_path):
    """End-to-end parity with the reference's ACTUAL generator
    (dataset_generator/generator.py run by golden_gen/gen_generator_goldens
    with numba/diskcache shims) on a deterministic 2-image corpus:

    - run A (rgb444, dithers none+bayer2x2, no palettes): identical file
      SET and identical BYTES — pins the reference's quirk that bayer on
      grid quantization is silently dropped from the spec space.
    - run B (palette 16, median_cut, three dithers): identical file set
      (palette numerics are not cross-library reproducible; target bytes
      still compared).
    - run C (checkerboard only, no palettes): the reference CREATES the
      checkerboard-on-grid spec but its own quantizer rejects it
      ('requires target_palette_size' — upstream FIXME), so only targets
      appear; ours raises the same error per-crop and must converge to
      the same file set.
    """
    import hashlib
    import json

    import numpy as np

    from fs_uae_image_enhancer_project_tpu.datagen import generator as gen

    blob = np.load(os.path.join(
        os.path.dirname(__file__), "goldens", "generator_goldens.npz"))
    golden = json.loads(bytes(blob["meta"]).decode())
    corpus = tmp_path / "gt"
    corpus.mkdir()
    for i, name in enumerate(golden["corpus_names"]):
        Image.fromarray(blob[f"corpus_{i}"], "RGB").save(corpus / name)
    w, h = golden["crop"]

    def run_ours(tag, extra, expect_rc=0):
        dest = tmp_path / f"out_{tag}"
        rc = gen.main([
            "--train_images", str(corpus),
            "--dest_dir", str(dest),
            "--crop_size", str(w), str(h),
            "--rotation", "0",
            "--resolution", "lores",
            "--workers", "1",
            "--cache_dir", str(tmp_path / f"cache_{tag}"),
            "--verbose", "0",
        ] + extra)
        assert rc == expect_rc
        out = {}
        for root, _dirs, files in os.walk(dest):
            for f in files:
                p = os.path.join(root, f)
                out[os.path.relpath(p, dest)] = hashlib.sha256(
                    open(p, "rb").read()).hexdigest()
        return out

    ours_a = run_ours("a", ["--rgb", "444", "--dither", "none", "bayer2x2"])
    assert ours_a == golden["files"]  # names AND bytes

    ours_b = run_ours("b", ["--rgb", "444", "--palette", "16",
                            "--dither", "none", "atkinson", "bayer2x2",
                            "--palette_algorithm", "median_cut"])
    assert sorted(ours_b) == sorted(golden["files_palette"])
    for rel, sha in golden["files_palette"].items():
        if os.path.basename(rel).startswith("target_"):
            assert ours_b[rel] == sha, rel

    # deliberate divergence: the reference exits 0 when every styled spec
    # fails; ours exits nonzero (loud failure) while converging to the
    # same on-disk file set
    ours_c = run_ours("c", ["--rgb", "444", "--dither", "checkerboard"],
                      expect_rc=1)
    assert ours_c == golden["files_checker"]  # targets only, same bytes


def test_empty_style_space_raises_before_touching_disk(source_tree):
    """A dither list with no valid non-palette combo must fail like the
    reference ('No valid style characteristics combinations...') instead
    of proceeding with a target-only spec space that would orphan-delete
    every styled file in the destination."""
    cfg = _cfg(source_tree, palettes=(), dithers=("atkinson",))
    with pytest.raises(ValueError, match="No valid style characteristics"):
        DatasetGenerator(cfg).run()


def test_mass_orphan_deletion_requires_opt_in(source_tree):
    """Changing the spec space so most of an existing corpus becomes
    orphaned must refuse to delete without force_delete_orphans."""
    import glob

    # build a corpus large enough to trip the >50-file guard
    cfg = _cfg(source_tree, palettes=(8, 16),
               dithers=("bayer2x2", "bayer4x4", "atkinson"),
               rotations=(0, 90), grid="overlap")
    DatasetGenerator(cfg).run()
    n_before = len(glob.glob(
        os.path.join(cfg.dest_dir, "train", "*", "*.png")))
    assert n_before > 100
    # radically smaller spec space -> most files would be orphans
    cfg_small = _cfg(source_tree, palettes=(8,), dithers=("bayer2x2",),
                     rotations=(0,), grid="overlap")
    DatasetGenerator(cfg_small).run()
    n_after = len(glob.glob(
        os.path.join(cfg_small.dest_dir, "train", "*", "*.png")))
    assert n_after == n_before  # guard refused the mass deletion
    # explicit opt-in performs it
    cfg_force = _cfg(source_tree, palettes=(8,), dithers=("bayer2x2",),
                     rotations=(0,), grid="overlap",
                     force_delete_orphans=True)
    DatasetGenerator(cfg_force).run()
    n_forced = len(glob.glob(
        os.path.join(cfg_force.dest_dir, "train", "*", "*.png")))
    assert n_forced < n_before


def test_legacy_spelled_corpus_pairs_and_survives(source_tree):
    """A corpus written with the historical s100/dnone spellings must (a)
    satisfy canonical specs on rerun, (b) survive orphan cleanup, and (c)
    pair styled files with targets across spellings in the gatherer."""
    from fs_uae_image_enhancer_project_tpu.data import (
        gather_all_samples_from_directory,
    )

    cfg = _cfg(source_tree, palettes=(), dithers=("none",))
    DatasetGenerator(cfg).run()
    train_dir = os.path.join(cfg.dest_dir, "train", "img_a")
    # rewrite HALF the files to legacy spellings: target stays canonical,
    # styled goes legacy (cross-spelling pairing)
    for f in sorted(os.listdir(train_dir)):
        if f.startswith("lores_") and "_s0_" in f:
            legacy = f.replace("_s0_", "_s100_").replace("dNone", "dnone")
            os.rename(os.path.join(train_dir, f),
                      os.path.join(train_dir, legacy))
    stats = DatasetGenerator(cfg).run()
    assert stats["generated_this_run"] == 0  # legacy satisfies the spec
    assert stats["missing"] == 0
    legacy_files = [f for f in os.listdir(train_dir) if "_s100_" in f]
    assert legacy_files  # survived orphan cleanup
    pairs = gather_all_samples_from_directory(
        os.path.join(cfg.dest_dir, "train"), (32, 24), verbose=0)
    # every legacy styled file pairs with its canonical target
    assert len(pairs) == len(legacy_files)
