"""Data layer tests: codec round trips, gathering, dataset iteration."""
import os
import time

import numpy as np
import pytest

from fs_uae_image_enhancer_project_tpu.data import (
    SRDataset,
    construct_filename,
    gather_all_samples_from_directory,
    parse_generated_filename,
    split_pairs,
)


def test_codec_target_roundtrip():
    params = {"crop_x": -16, "crop_y": 32, "scale_perc": 70, "rot_deg": 20}
    fn = construct_filename(params, is_target=True)
    assert fn == "target_-16_32_s70_r20.png"
    parsed = parse_generated_filename(fn)
    assert parsed["type"] == "target"
    for k, v in params.items():
        assert parsed[k] == v


@pytest.mark.parametrize("pal", [32, None])
@pytest.mark.parametrize("dither", ["floyd-steinberg", "none", "bayer4x4"])
def test_codec_styled_roundtrip(pal, dither):
    params = {
        "crop_x": 0, "crop_y": -8, "scale_perc": 100, "rot_deg": 0,
        "resolution": "lores", "rgb": "RGB444", "pal": pal, "dither": dither,
    }
    fn = construct_filename(params, is_target=False)
    parsed = parse_generated_filename(fn)
    assert parsed["type"] == "style"
    assert parsed["resolution"] == "lores"
    assert parsed["rgb"] == "RGB444"
    assert parsed["pal"] == pal
    assert parsed["dither"] == dither
    assert parsed["style_name"] == fn.rsplit("r0_", 1)[1][:-4]


def test_codec_rejects_garbage():
    assert parse_generated_filename("notes.txt") is None
    assert parse_generated_filename("random.png") is None
    assert parse_generated_filename("target_1_2.png") is None
    # malformed numeric tokens skip the file instead of raising
    # (reference srdataset.py catches ValueError and returns None)
    assert parse_generated_filename("lores_0_0_s100_r0_rgb444_pXYZ_dnone.png") is None
    with pytest.raises(ValueError):
        construct_filename({"crop_x": 1}, is_target=True)


def _make_tree(root, w=8, h=8):
    from PIL import Image

    d = os.path.join(root, "train", "img1")
    os.makedirs(d)
    rng = np.random.default_rng(0)

    def save(name):
        arr = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        Image.fromarray(arr).save(os.path.join(d, name))

    save("target_0_0_s100_r0.png")
    save("lores_0_0_s100_r0_rgb444_p32_dfloyd-steinberg.png")
    save("lores_0_0_s100_r0_rgb888_pNone_dnone.png")
    # location without target: must be ignored
    save("lores_4_4_s100_r0_rgb444_p32_dnone.png")
    return os.path.join(root, "train")


def test_gather_and_style_filter(tmp_path):
    train_dir = _make_tree(str(tmp_path))
    pairs = gather_all_samples_from_directory(train_dir, (8, 8), verbose=0)
    assert len(pairs) == 2
    only444 = gather_all_samples_from_directory(
        train_dir, (8, 8), styles_to_include={"rgb444"}, verbose=0
    )
    assert len(only444) == 1
    # wrong crop size: target validation rejects everything
    assert gather_all_samples_from_directory(train_dir, (16, 16), verbose=0) == []


def test_split_pairs_guards():
    pairs = [(f"a{i}", f"b{i}") for i in range(10)]
    tr, va = split_pairs(pairs, 0.2, seed=1)
    assert len(tr) == 8 and len(va) == 2
    tr, va = split_pairs(pairs[:1], 0.5)
    assert len(tr) == 1 and len(va) == 0


def test_srdataset_iteration(tmp_path):
    train_dir = _make_tree(str(tmp_path))
    pairs = gather_all_samples_from_directory(train_dir, (8, 8), verbose=0)
    ds = SRDataset(pairs, (8, 8), num_samples=6, batch_size=2, seed=3)
    batches = list(ds)
    assert len(batches) == 3
    lr, hr = batches[0]
    assert lr.shape == (2, 8, 8, 3) and hr.shape == (2, 8, 8, 3)
    assert lr.dtype == np.float32
    assert lr.min() >= 0.0 and lr.max() <= 1.0


def test_srdataset_empty_pool_raises():
    ds = SRDataset([], (8, 8), num_samples=2)
    with pytest.raises(IndexError):
        next(iter(ds))


def test_codec_randomized_roundtrip():
    """Property-style: random specs survive construct -> parse."""
    import random

    rng = random.Random(0)
    dithers = ["none", "checkerboard", "bayer2x2", "bayer8x8",
               "floyd-steinberg", "atkinson", "sierra2", "sierra3",
               "stucki", "burkes"]
    for _ in range(200):
        params = {
            "crop_x": rng.randint(-500, 500),
            "crop_y": rng.randint(-500, 500),
            "scale_perc": rng.randint(1, 99),  # 100 canonicalizes to 0
            "rot_deg": rng.randint(0, 359),
            "resolution": rng.choice(
                ["lores", "hires", "lores_laced", "hires_laced"]
            ),
            "rgb": rng.choice(["RGB444", "RGB555", "RGB565", "RGB666", "RGB888"]),
            "pal": rng.choice([None, 2, 16, 32, 256, 4096]),
            "dither": rng.choice(dithers),
        }
        fn = construct_filename(params, is_target=False)
        parsed = parse_generated_filename(fn)
        assert parsed is not None, fn
        for k in ("crop_x", "crop_y", "scale_perc", "rot_deg",
                  "resolution", "rgb", "pal", "dither"):
            assert parsed[k] == params[k], (k, fn)
        tfn = construct_filename(params, is_target=True)
        tparsed = parse_generated_filename(tfn)
        assert tparsed["type"] == "target"


def test_codec_canonicalizes_legacy_spellings():
    """construct_filename canonicalizes BOTH legacy spellings symmetrically
    (s100 -> s0 like dnone -> dNone), so re-emitting a parsed legacy params
    dict yields the canonical name with no caller special-casing."""
    params = {
        "crop_x": 0, "crop_y": 0, "scale_perc": 100, "rot_deg": 0,
        "resolution": "lores", "rgb": "RGB444", "pal": None, "dither": "none",
    }
    assert construct_filename(params, is_target=False) == \
        "lores_0_0_s0_r0_rgb444_pNone_dNone.png"
    assert construct_filename(params, is_target=True) == "target_0_0_s0_r0.png"
    canonical = dict(params, scale_perc=0)
    assert construct_filename(canonical, is_target=False) == \
        construct_filename(params, is_target=False)


def test_srdataset_corrupt_file_retry(tmp_path):
    """A corrupt PNG in the pool is skipped via the retry path
    (reference srdataset.py:316-321 semantics)."""
    from PIL import Image

    d = tmp_path / "train" / "img"
    d.mkdir(parents=True)
    rng = np.random.default_rng(0)
    good = rng.integers(0, 256, (8, 8, 3), dtype=np.uint8)
    Image.fromarray(good).save(d / "target_0_0_s100_r0.png")
    Image.fromarray(good).save(d / "lores_0_0_s100_r0_rgb444_p32_dnone.png")
    # corrupt styled file paired with a valid target at another location
    Image.fromarray(good).save(d / "target_4_4_s100_r0.png")
    (d / "lores_4_4_s100_r0_rgb444_p32_dnone.png").write_bytes(b"not a png")
    pairs = gather_all_samples_from_directory(str(tmp_path / "train"), (8, 8), verbose=0)
    assert len(pairs) == 2
    ds = SRDataset(pairs, (8, 8), num_samples=12, batch_size=2, seed=0)
    with pytest.warns(UserWarning):
        batches = list(ds)
    assert len(batches) == 6  # epochs complete despite the corrupt file


def test_srdataset_uint8_transfer_matches_float_path(tmp_path):
    """transfer_dtype='uint8' + on-device batch_transform reproduces the
    float32 loader path exactly (same RNG stream, same values), with raw
    bytes on the wire."""
    from fs_uae_image_enhancer_project_tpu.data.dataset import batch_transform

    train_dir = _make_tree(str(tmp_path))
    pairs = gather_all_samples_from_directory(train_dir, (8, 8), verbose=0)
    kw = dict(num_samples=4, batch_size=2, seed=7, linear=True)
    f32 = list(SRDataset(pairs, (8, 8), **kw))
    u8 = list(SRDataset(pairs, (8, 8), transfer_dtype="uint8", **kw))
    to_float = batch_transform(linear=True)
    for (lf, hf), (lu, hu) in zip(f32, u8):
        assert lu.dtype == np.uint8 and hu.dtype == np.uint8
        np.testing.assert_allclose(np.asarray(to_float(lu)), lf, atol=2e-7)
        np.testing.assert_allclose(np.asarray(to_float(hu)), hf, atol=2e-7)
    # float batches pass through batch_transform untouched
    lf0 = f32[0][0]
    np.testing.assert_array_equal(np.asarray(to_float(lf0)), lf0)


def test_gather_same_named_subdirs_do_not_collide(tmp_path):
    """Two scene dirs with the SAME basename in different subtrees (e.g.
    train/sceneA and val/sceneA under a common root) must form separate
    groups — grouping by basename alone pairs styled files with the other
    location's target (regression)."""
    from PIL import Image

    rng = np.random.default_rng(1)
    written = {}
    for split in ("train", "val"):
        d = os.path.join(str(tmp_path), split, "sceneA")
        os.makedirs(d)
        for name in ("target_0_0_s100_r0.png",
                     "lores_0_0_s100_r0_rgb444_p32_dnone.png"):
            arr = rng.integers(0, 256, (8, 8, 3), dtype=np.uint8)
            Image.fromarray(arr).save(os.path.join(d, name))
            written[(split, name.startswith("target"))] = os.path.join(d, name)

    pairs = gather_all_samples_from_directory(str(tmp_path), (8, 8), verbose=0)
    assert len(pairs) == 2
    for styled_path, target_path in pairs:
        # each styled file must pair with the target in ITS OWN directory
        assert os.path.dirname(styled_path) == os.path.dirname(target_path)


def test_srdataset_wrong_size_styled_file_retries(tmp_path):
    """A styled file with off-size dimensions passes the gatherer (which
    size-checks targets only) but must hit SRDataset's retry path instead
    of crashing np.stack mid-epoch."""
    from PIL import Image

    train_dir = _make_tree(str(tmp_path))
    pairs = gather_all_samples_from_directory(train_dir, (8, 8), verbose=0)
    # corrupt one styled file to the wrong size
    bad = pairs[0][0]
    Image.fromarray(np.zeros((9, 8, 3), np.uint8)).save(bad)
    ds = SRDataset(pairs, (8, 8), num_samples=8, batch_size=2, seed=0)
    with pytest.warns(UserWarning, match="Retrying"):
        batches = list(ds)
    assert len(batches) == 4
    for lr, hr in batches:
        assert lr.shape == (2, 8, 8, 3) and hr.shape == (2, 8, 8, 3)


def test_device_prefetch_producer_exits_on_early_consumer_exit(tmp_path):
    """Abandoning the prefetch generator (exception in the train loop) must
    retire the producer thread instead of leaving it blocked on q.put
    holding device-committed batches."""
    import threading

    from fs_uae_image_enhancer_project_tpu.data.dataset import device_prefetch

    n_before = threading.active_count()
    batches = iter([(np.zeros((1, 4, 4, 3), np.float32),) * 2
                    for _ in range(100)])
    gen = device_prefetch(batches, size=2)
    next(gen)
    gen.close()  # early exit — train loop raised / generator GC'd
    deadline = time.time() + 30
    while threading.active_count() > n_before and time.time() < deadline:
        time.sleep(0.05)
    assert threading.active_count() <= n_before


def test_gather_matches_reference_golden(tmp_path):
    """Behavioral parity with the reference's actual
    gather_all_samples_from_directory (srdataset.py:141-244), pinned by
    tests/golden_gen/gen_gather_goldens.py: the tree spec exercises
    negative crops/rotations, pal 'None', hyphenated dithers, underscored
    resolutions (lores_laced), wrong-size-target group drops, orphan
    styled files, unparseable noise, root-level skips, and the
    styles_to_include substring filter."""
    import json

    from PIL import Image

    golden = json.load(open(os.path.join(
        os.path.dirname(__file__), "goldens", "gather_goldens.json")))
    base = tmp_path / "split"
    for subdir, name, size in golden["tree"]:
        d = base / subdir if subdir else base
        d.mkdir(parents=True, exist_ok=True)
        path = d / name
        if name.endswith(".png"):
            Image.new("RGB", tuple(size), (1, 2, 3)).save(path)
        else:
            path.write_bytes(b"not an image")

    def rel_pairs(styles):
        pairs = gather_all_samples_from_directory(
            str(base), tuple(golden["crop"]), styles_to_include=styles,
            verbose=0)
        return sorted(
            [os.path.relpath(s, base), os.path.relpath(t, base)]
            for s, t in pairs
        )

    assert rel_pairs(None) == golden["pairs_all"]
    assert rel_pairs({"rgb444"}) == golden["pairs_rgb444"]
