"""Batched on-device styled phase (datagen/device_batch.py): the chunked
single-process pipeline must produce byte-identical PNGs to the per-crop
pallas path AND to the host numpy path for the vectorizable dither families
(the batched kernel and vmapped k-means were already shown bitwise-equal to
their scalar forms at op level; this covers the whole generator plumbing:
spec staging, base-crop reuse, degenerate-palette fallback, reporting)."""
import os

import numpy as np
import pytest
from PIL import Image

from fs_uae_image_enhancer_project_tpu.datagen.generator import (
    DatasetGenerator,
    GeneratorConfig,
)


def _write_sources(src, n=2, w=96, h=72):
    rng = np.random.default_rng(11)
    for i in range(n):
        # smooth gradient + noise: plenty of unique colours so the k-means
        # path (not the degenerate unique-colour fallback) is exercised
        yy, xx = np.mgrid[0:h, 0:w]
        base = np.stack(
            [(xx * 255 / w), (yy * 255 / h), ((xx + yy) * 127 / (w + h))],
            axis=-1,
        )
        arr = np.clip(
            base + rng.normal(0, 24, (h, w, 3)) + 30, 1, 255
        ).astype(np.uint8)
        Image.fromarray(arr).save(os.path.join(src, f"img_{i}.png"))


def _cfg(tmp_path, out, **kw):
    defaults = dict(
        train_images=[str(tmp_path / "src")],
        dest_dir=str(tmp_path / out),
        crop_w=48, crop_h=32,
        resolutions=("lores",),
        colorspaces=("RGB444",),
        palettes=(8, 16),
        dithers=("none", "checkerboard", "bayer4x4", "floyd-steinberg"),
        rotations=(0,),
        downscales=(100,),
        palette_algorithm="kmeans_jax",
        workers=1,
        cache_dir=str(tmp_path / ("cache_" + out)),
        verbose=0,
    )
    defaults.update(kw)
    return GeneratorConfig(**defaults)


def _tree_bytes(root):
    out = {}
    for r, _d, files in os.walk(root):
        for f in files:
            p = os.path.join(r, f)
            with open(p, "rb") as fh:
                out[os.path.relpath(p, root)] = fh.read()
    return out


@pytest.fixture
def source_tree(tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    _write_sources(str(src))
    return tmp_path


def test_batched_styled_phase_byte_identical(source_tree):
    tmp = source_tree
    runs = {
        "percrop": _cfg(tmp, "out_percrop", quantize_backend="pallas"),
        "batched": _cfg(tmp, "out_batched", quantize_backend="pallas",
                        device_batch=3),
    }
    stats = {}
    for name, cfg in runs.items():
        stats[name] = DatasetGenerator(cfg).run()
        assert stats[name]["missing"] == 0, name

    per = _tree_bytes(runs["percrop"].dest_dir)
    bat = _tree_bytes(runs["batched"].dest_dir)
    assert set(per) == set(bat)
    diff = [k for k in per if per[k] != bat[k]]
    assert diff == [], f"batched output differs for {diff}"
    # and the batched run actually generated everything it planned
    assert stats["batched"]["generated_this_run"] == len(bat)


def test_batched_run_is_idempotent(source_tree):
    cfg = _cfg(source_tree, "out_idem", quantize_backend="pallas",
               device_batch=4)
    s1 = DatasetGenerator(cfg).run()
    assert s1["missing"] == 0
    s2 = DatasetGenerator(cfg).run()
    assert s2["generated_this_run"] == 0


def test_batched_matches_percrop_for_host_palettes(source_tree):
    """With a host palette algorithm (median_cut) the batch path computes
    palettes on the host but still dithers on device in one call — output
    must equal the per-crop pallas path byte-for-byte. (Host-numpy vs
    pallas differs only in fp32/fp64 argmin ties — covered at >=0.98 pixel
    match by tests/test_pallas_dither.py; byte equality is only promised
    within the device backend.)"""
    tmp = source_tree
    per = _cfg(tmp, "out_mc_percrop", palette_algorithm="median_cut",
               quantize_backend="pallas",
               dithers=("none", "bayer2x2"))
    dev = _cfg(tmp, "out_mc_batched", palette_algorithm="median_cut",
               quantize_backend="pallas", device_batch=2,
               dithers=("none", "bayer2x2"))
    for cfg in (per, dev):
        assert DatasetGenerator(cfg).run()["missing"] == 0
    a = _tree_bytes(per.dest_dir)
    b = _tree_bytes(dev.dest_dir)
    assert set(a) == set(b)
    diff = [k for k in a if a[k] != b[k]]
    assert diff == [], f"device-batch output differs from per-crop for {diff}"
