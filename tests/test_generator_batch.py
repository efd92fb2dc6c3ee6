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


def test_batch_level_failure_reports_every_member(source_tree, monkeypatch):
    """A device-call failure inside a (style, chunk) batch must surface as a
    per-job error for every member of that batch — and must not abort the
    rest of the run (targets and the scalar-fallback dithers still
    generate, and the run finishes with a summary instead of raising)."""
    from fs_uae_image_enhancer_project_tpu.datagen import device_batch

    def boom(*a, **k):
        raise RuntimeError("injected device failure")

    monkeypatch.setattr(
        device_batch, "generate_palettes_kmeans_jax_batch", boom
    )
    cfg = _cfg(source_tree, "out_fail", quantize_backend="pallas",
               device_batch=4)
    stats = DatasetGenerator(cfg).run()
    out = _tree_bytes(cfg.dest_dir)
    # batchable combos failed (reported, not raised) -> files missing
    assert stats["missing"] > 0
    assert not stats["stopped"]
    # the scalar fallback family was untouched by the injected failure
    assert any("floyd" in k for k in out), \
        "scalar-fallback dithers should still generate"
    # targets (palette-free) generated too
    assert any(os.path.basename(k).startswith("target_") for k in out)


def test_batched_stop_at_chunk_boundary_then_resume(source_tree, monkeypatch):
    """should_stop trips after the first chunk: the run ends cleanly with
    only completed-chunk files on disk, and a plain re-run resumes to the
    byte-identical full tree (SIGINT-at-boundaries semantics,
    reference generator.py SIGINT contract)."""
    from fs_uae_image_enhancer_project_tpu.datagen import device_batch as db

    # full tree for comparison
    cfg_full = _cfg(source_tree, "out_stop_full", quantize_backend="pallas",
                    device_batch=2)
    assert DatasetGenerator(cfg_full).run()["missing"] == 0
    full = _tree_bytes(cfg_full.dest_dir)

    orig = db.run_styled_jobs_batched

    def tripping(jobs, batch_size, report, should_stop=lambda: False):
        polls = {"n": 0}

        def trip():
            polls["n"] += 1
            return polls["n"] > 1  # first chunk runs, second poll stops

        return orig(jobs, batch_size, report, should_stop=trip)

    cfg_part = _cfg(source_tree, "out_stop_part", quantize_backend="pallas",
                    device_batch=2)
    monkeypatch.setattr(db, "run_styled_jobs_batched", tripping)
    s_part = DatasetGenerator(cfg_part).run()
    partial = _tree_bytes(cfg_part.dest_dir)
    assert s_part["missing"] > 0
    assert len(partial) < len(full)

    # plain re-run (patch removed) completes the remainder byte-identically
    monkeypatch.setattr(db, "run_styled_jobs_batched", orig)
    assert DatasetGenerator(cfg_part).run()["missing"] == 0
    resumed = _tree_bytes(cfg_part.dest_dir)
    assert set(resumed) == set(full)
    assert all(resumed[k] == full[k] for k in full)


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
