"""Smoke-test the head-to-head evaluation protocol end to end (tiny shapes).

scripts/eval_headtohead.py runs unattended on hardware after long training
runs (see /tmp chained pipeline in docs/ROUND4.md); a protocol bug there
wastes a multi-hour TPU window. This test runs the REAL script main() on a
tiny configuration (64x64 crops, 2 batches) against the live corpus and the
live reference ONNX weights, checking the report's shape and invariants
rather than its absolute numbers.

Live-gated like tests/test_full_parity.py: skipped when the local corpus
(/root/work/dataset_lores/train, built by recipes/generate_dataset.sh) or
the reference's shipped pix_shuffle graph is absent.
"""
import json
import os
import sys

import pytest

CORPUS = "/root/work/dataset_lores/train"
REF_ONNX = "/root/reference/model/model_pix_shuffle/pix_shuffle.onnx"
PLATEAU_CK = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "artifacts", "training_parity", "plateau_full",
    "checkpoint_best_pix_shuffle",
)

pytestmark = pytest.mark.skipif(
    not (os.path.isdir(CORPUS) and os.path.isfile(REF_ONNX)
         and os.path.isdir(PLATEAU_CK)),
    reason="live corpus / reference weights not available",
)


def test_headtohead_protocol_smoke(tmp_path):
    sys.path.insert(
        0, os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "scripts"))
    import eval_headtohead

    out = tmp_path / "headtohead.json"
    # crop must match the corpus's native pair size (gather validates the
    # target image size against it) — only the sample count shrinks here
    rc = eval_headtohead.main([
        "--data", CORPUS,
        "--num_samples", "8",
        "--batch_size", "4",
        "--out", str(out),
    ])
    if rc == 1 and not out.exists():
        # the generator writes incrementally, so a freshly started rebuild
        # (recipes/generate_dataset.sh on a recycled VM) has a window where
        # the live-gate passes but the gather finds nothing. Only skip when
        # the corpus truly has no files yet — if PNGs exist but the gather
        # found no pairs, that's a regression (e.g. a size-validation bug
        # filtering everything), not an in-flight rebuild.
        has_pngs = any(
            f.endswith(".png")
            for _, _, files in os.walk(CORPUS) for f in files
        )
        if not has_pngs:
            pytest.skip("corpus present but empty (generation in flight)")
        pytest.fail("corpus has PNGs but the head-to-head gather found no "
                    "pairs — gather/size-validation regression?")
    assert rc == 0
    report = json.loads(out.read_text())

    labels = [r["label"] for r in report["rows"]]
    # rows 1 and 2 are unconditional: reference shipped weights and the
    # committed plateau checkpoint; long/heavy rows depend on local runs
    assert labels[0] == "reference shipped pix_shuffle.onnx"
    assert any("plateau-50" in l for l in labels[1:])
    assert report["held_out_pairs"] > 0

    for row in report["rows"]:
        assert row["batches"] == 2
        # both metrics finite and sane: loss positive, PSNR in (5, 99] dB
        assert 0.0 < row["pixel_loss_vggfree"] < 1.0
        assert 5.0 < row["srgb_psnr_db"] <= 99.0
        # perceptual column: native 376x288 crops permit all 5 MS-SSIM scales
        assert row["ms_ssim_srgb"] is not None
        assert 0.0 < row["ms_ssim_srgb"] <= 1.0
        # fairness caveats are per-row (advisor r4): every row carries one
        assert isinstance(row["caveat"], str) and row["caveat"]

    # the shipped row must be marked zero-leak; any fresh-run row must
    # carry the early-stopping-selection caveat, never a zero-leak claim
    assert report["rows"][0]["caveat"].startswith("zero-leak")
    for row in report["rows"]:
        if "fresh run on THIS corpus" in row["label"]:
            assert "early-stopping selection set" in row["caveat"]
    assert report["heldout_pool_fingerprint_sha256_16"]

    # deterministic draws: identical pools and seeds mean the rows were
    # scored on the SAME batches — the protocol's core fairness claim.
    # Re-running row 1's eval would cost another compile; instead assert
    # the recorded protocol string pins the deterministic pieces.
    assert "split_pairs(seed=0)" in report["protocol"]
    assert "seed=1" in report["protocol"]
