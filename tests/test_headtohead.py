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
        # the corpus dir exists but holds no complete pairs yet — the
        # generator writes incrementally, so a freshly started rebuild
        # (recipes/generate_dataset.sh on a recycled VM) has a window
        # where the live-gate passes but the gather finds nothing
        pytest.skip("corpus present but empty (generation in flight)")
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

    # deterministic draws: identical pools and seeds mean the rows were
    # scored on the SAME batches — the protocol's core fairness claim.
    # Re-running row 1's eval would cost another compile; instead assert
    # the recorded protocol string pins the deterministic pieces.
    assert "split_pairs(seed=0)" in report["protocol"]
    assert "seed=1" in report["protocol"]
