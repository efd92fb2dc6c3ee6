"""Live full-coverage parity: every model family x every sample, in pytest.

Two truth sources, both independent of our model code:

1. The reference's committed ``model_*/predicted/sample*.png`` goldens —
   full-frame, for the families whose shipped weights reproduce them
   (pix_shuffle: 8 samples, conv3/conv3_heavy: 7 samples). conv5 and
   conv5_heavy's predicted frames do NOT match their own shipped .onnx
   weights under any op ordering (~24 dB for conv5 — stale reference
   artifacts), so they are excluded here and covered by (2).

2. The shipped .onnx graphs themselves, executed with the self-contained
   numpy ONNX runner (export/onnx_runner.py) — the deployment truth for all
   four conv families (their deployed graphs differ from training
   semantics; see export/onnx_import.py module doc). Full-frame execution
   costs ~10-80 s/frame on this single-CPU VM, so each sample contributes a
   160x160 crop instead: convs are local and both paths zero-pad the same
   crop borders, so outputs are comparable everywhere. The graph's
   constant full-frame alpha plane (Concat input, dims (1,1,576,752)) is
   cropped via run_graph's feeds-override-initializers behaviour.

Previously this coverage lived only in offline parity_report.json artifacts
(scripts/build_artifacts.py); a regression on any family/sample now fails
CI directly.
"""
import glob
import os

import numpy as np
import pytest

import jax.numpy as jnp

REF = "/root/reference/model"
needs_ref = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference artifacts not available"
)

from conftest import psnr as _psnr

CROP = 160  # crop side for shipped-graph truth (FLOPs ~6% of a full frame)


def _samples(n):
    from PIL import Image

    return np.stack([
        np.asarray(Image.open(f"{REF}/samples/sample{i}.png"))
        for i in range(n)
    ])


def _enhance_outputs(name, frames):
    """Deployed jax path (fp32 for the parity bar), batched in one call."""
    from fs_uae_image_enhancer_project_tpu.export.enhance import (
        enhance_from_onnx,
    )

    enhance = enhance_from_onnx(
        f"{REF}/model_{name}/{name}.onnx", donate=False,
        compute_dtype=jnp.float32,
    )
    return np.asarray(enhance(jnp.asarray(frames)))


@needs_ref
@pytest.mark.parametrize("name,bar", [
    ("pix_shuffle", 60.0),
    ("conv3", 55.0),
    ("conv3_heavy", 55.0),
])
def test_all_samples_vs_reference_predicted(name, bar):
    """Full-frame enhance vs the reference's own committed golden frames.

    Measured margins (round 3): pix_shuffle min 64.2 dB, conv3 min 59.7,
    conv3_heavy min 60.9 — bars sit ~5 dB under the measured minimum to
    catch regressions without flaking on numeric drift.
    """
    from PIL import Image

    pred_dir = f"{REF}/model_{name}/predicted"
    n = len(glob.glob(os.path.join(pred_dir, "sample*.png")))
    assert n >= 7
    outs = _enhance_outputs(name, _samples(n))
    scores = {}
    for i in range(n):
        ref = np.asarray(
            Image.open(f"{pred_dir}/sample{i}.png").convert("RGB")
        )
        scores[i] = _psnr(outs[i][..., :3], ref)
    assert min(scores.values()) >= bar, scores


@needs_ref
@pytest.mark.parametrize("name", [
    "conv3", "conv3_heavy", "conv5", "conv5_heavy",
])
def test_all_samples_vs_shipped_graph(name):
    """Every sample vs the shipped graph executed by the numpy runner, on a
    distinct 160x160 crop per sample (batched into one runner call).

    Measured crop PSNRs (round 3, sample3 spot checks): 63.6-68.9 dB;
    bar 58 dB. Full-frame min PSNRs live in
    artifacts/model_<name>/parity_report.json (>= 63.2 dB everywhere).
    """
    from fs_uae_image_enhancer_project_tpu.export.onnx_proto import load_model
    from fs_uae_image_enhancer_project_tpu.export.onnx_runner import run_graph

    frames = _samples(8)
    n, fh, fw = frames.shape[:3]
    # one deterministic, distinct window per sample
    crops = np.stack([
        frames[i, 24 * i : 24 * i + CROP, 64 * i : 64 * i + CROP]
        for i in range(n)
    ])
    g = load_model(f"{REF}/model_{name}/{name}.onnx").graph
    # crop + batch-tile the constant full-frame planes (alpha channel)
    planes = {
        k: np.tile(t.to_numpy()[:, :, :CROP, :CROP], (n, 1, 1, 1))
        for k, t in g.initializers.items()
        if tuple(t.dims)[-2:] == (fh, fw)
    }
    assert planes, "expected the graph's constant alpha plane"
    truth = run_graph(g, {"input_rgba_chunky": crops, **planes})[
        "output_rgba_uint8_chunky"
    ]
    ours = _enhance_outputs(name, crops)
    scores = {
        i: _psnr(ours[i][..., :3], truth[i][..., :3]) for i in range(n)
    }
    assert min(scores.values()) >= 58.0, scores
