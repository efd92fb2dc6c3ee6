"""FrameStream pipeline and the experimental int8 path."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fs_uae_image_enhancer_project_tpu.export.enhance import make_enhance_fn
from fs_uae_image_enhancer_project_tpu.export.quantized import (
    calibrate,
    make_quantized_enhance,
    quantize_weights,
)
from fs_uae_image_enhancer_project_tpu.export.streaming import FrameStream
from fs_uae_image_enhancer_project_tpu.models import get_model


from conftest import psnr as _psnr  # shared helper


def test_frame_stream_ordering_and_depth():
    m = get_model("pix_shuffle")
    params = m.init(jax.random.key(0))
    enh = make_enhance_fn(m.apply, params, crop_left=0, donate=False)
    stream = FrameStream(enh, depth=2)
    rng = np.random.default_rng(0)
    frames = [rng.integers(0, 256, (32, 48, 4), np.uint8) for _ in range(5)]
    outs = []
    for f in frames:
        r = stream.submit(f)
        if r is not None:
            outs.append(r)
    outs.extend(stream.drain())
    assert len(outs) == 5
    # results come back in submission order: compare against direct calls
    for f, o in zip(frames, outs):
        direct = np.asarray(enh(jnp.asarray(f[None])))
        np.testing.assert_array_equal(o, direct)
    with pytest.raises(ValueError):
        FrameStream(enh, depth=0)


def test_quantized_path_runs_and_is_reasonable():
    """The int8 path is experimental (measured ~28 dB / no speed win on this
    model — see export/quantized.py doc); assert the machinery works and
    quality is in the expected band."""
    m = get_model("pix_shuffle")
    params = m.init(jax.random.key(0))
    rng = np.random.default_rng(0)
    calib = [rng.uniform(0, 1, (32, 48, 3)).astype(np.float32) for _ in range(2)]
    scales = calibrate(params, m.config, calib)
    assert set(scales) == {f"conv{i}" for i in range(1, 8)}
    assert all(v > 0 for v in scales.values())
    qp = quantize_weights(params)
    assert qp["conv1"]["w_q"].dtype == jnp.int8
    q_enh = make_quantized_enhance(params, m.config, calib)
    f_enh = make_enhance_fn(
        m.apply, params, crop_left=0, donate=False,
        linear_to_srgb_exponent=0.4546,
    )
    frame = jnp.asarray(rng.integers(0, 256, (1, 32, 48, 4), np.uint8))
    yq = np.asarray(q_enh(frame))
    yf = np.asarray(f_enh(frame))
    assert yq.shape == yf.shape and yq.dtype == np.uint8
    assert _psnr(yq[..., :3], yf[..., :3]) >= 20.0
