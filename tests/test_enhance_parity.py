"""End-to-end behavioural parity against the reference's shipped artifacts.

Loads the shipped pix_shuffle.onnx weights via the self-contained ONNX codec
and checks the enhanced output of the real Amiga sample frames against the
reference's committed predicted/*.png goldens at >= 50 dB PSNR (BASELINE.md
north-star fidelity target). Skips gracefully if the read-only reference tree
is unavailable.
"""
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

REF = "/root/reference/model"
needs_ref = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference artifacts not available"
)


from conftest import psnr as _psnr  # shared helper


@needs_ref
def test_onnx_codec_reads_shipped_model():
    from fs_uae_image_enhancer_project_tpu.export.onnx_proto import load_model

    m = load_model(f"{REF}/model_pix_shuffle/pix_shuffle.onnx")
    assert m.graph.inputs[0].name == "input_rgba_chunky"
    assert m.graph.inputs[0].shape == (1, 576, 752, 4)
    assert m.graph.outputs[0].shape == (1, 576, 752, 4)
    assert "conv1.weight" in m.graph.initializers
    assert m.graph.initializers["conv1.weight"].dims == (36, 12, 3, 3)


@needs_ref
def test_pix_shuffle_weight_import_shapes():
    from fs_uae_image_enhancer_project_tpu.export.onnx_import import import_pix_shuffle

    imp = import_pix_shuffle(f"{REF}/model_pix_shuffle/pix_shuffle.onnx")
    assert imp.params["conv1"]["w"].shape == (3, 3, 12, 36)  # HWIO
    assert imp.params["conv1"]["w"].dtype == np.float32
    assert imp.params["l1_act1"]["a"].shape == (1,)  # sinlu
    assert imp.params["l2_act4"]["slope"].shape == (36,)  # biased_prelu slope
    assert imp.linear_to_srgb_exponent == pytest.approx(0.4546, abs=1e-4)


@needs_ref
@pytest.mark.parametrize("i", [0, 6])
def test_enhance_parity_vs_predicted_goldens(i):
    """Float-path inference with imported weights vs committed goldens.

    Mirrors reference train.py inference_on_directory (srgb->linear approx,
    model, linear->srgb approx, clamp). fp32 compute for the parity bar.
    """
    from PIL import Image

    from fs_uae_image_enhancer_project_tpu.export.onnx_import import import_pix_shuffle
    from fs_uae_image_enhancer_project_tpu.models import get_model

    imp = import_pix_shuffle(f"{REF}/model_pix_shuffle/pix_shuffle.onnx")
    m = get_model("pix_shuffle")

    @jax.jit
    def fwd(params, x):
        x = x**2.2
        y = m.apply(params, x)
        return jnp.clip(y ** (1 / 2.2), 0.0, 1.0)

    src = np.asarray(Image.open(f"{REF}/samples/sample{i}.png").convert("RGB"))
    ref = np.asarray(
        Image.open(f"{REF}/model_pix_shuffle/predicted/sample{i}.png").convert("RGB")
    )
    x = jnp.asarray(src, jnp.float32)[None] / 255.0
    out = np.asarray(fwd(imp.params, x)[0] * 255.0).astype(np.uint8)
    assert _psnr(out, ref) >= 50.0


@needs_ref
def test_enhance_uint8_contract():
    """The deployed artifact: uint8 RGBA in/out, alpha=255, full frame."""
    from fs_uae_image_enhancer_project_tpu.export.enhance import enhance_from_onnx

    enhance = enhance_from_onnx(
        f"{REF}/model_pix_shuffle/pix_shuffle.onnx", donate=False
    )
    rng = np.random.default_rng(0)
    frame = jnp.asarray(rng.integers(0, 256, (1, 576, 752, 4), dtype=np.uint8))
    out = enhance(frame)
    assert out.shape == (1, 576, 752, 4) and out.dtype == jnp.uint8
    np.testing.assert_array_equal(np.asarray(out[..., 3]), 255)


@needs_ref
def test_conv_stack_onnx_import():
    from fs_uae_image_enhancer_project_tpu.export.onnx_import import import_any

    imp = import_any(f"{REF}/model_conv5/conv5.onnx")
    assert imp.kind == "conv_stack"
    assert imp.num_conv_layers == 5
    assert imp.residual_layers == (1, 3)  # adds after layers 2 and 4
    assert imp.params["conv1"]["w"].shape == (3, 3, 3, 32)
    imp3 = import_any(f"{REF}/model_conv3/conv3.onnx")
    assert imp3.num_conv_layers == 3 and imp3.residual_layers == ()


def test_onnx_writer_roundtrip(tmp_path):
    """GraphBuilder output parses back with identical tensors/topology."""
    from fs_uae_image_enhancer_project_tpu.export.onnx_proto import (
        FLOAT, UINT8, GraphBuilder, load_model,
    )

    rng = np.random.default_rng(0)
    w = rng.normal(size=(8, 3, 3, 3)).astype(np.float32)
    b = GraphBuilder("toy")
    b.add_input("x", UINT8, (1, 16, 16, 3))
    b.add_initializer("w0", w)
    (t,) = b.add_node("Cast", ["x"], to=FLOAT)
    (y,) = b.add_node("Conv", [t, "w0"], ["y"], pads=[1, 1, 1, 1], group=1)
    b.add_output("y", FLOAT, (1, 16, 16, 8))
    path = tmp_path / "toy.onnx"
    path.write_bytes(b.serialize_model())

    m = load_model(str(path))
    assert [n.op_type for n in m.graph.nodes] == ["Cast", "Conv"]
    assert m.graph.nodes[0].attr("to") == FLOAT
    assert m.graph.nodes[1].attr("pads") == [1, 1, 1, 1]
    np.testing.assert_array_equal(m.graph.initializers["w0"].to_numpy(), w)
    assert m.graph.inputs[0].shape == (1, 16, 16, 3)
