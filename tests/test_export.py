"""Export-layer tests: ONNX emission roundtrip, numpy runner vs jax parity,
textual dump, raw-frame runner, StableHLO serialization."""
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fs_uae_image_enhancer_project_tpu.models import get_model
from fs_uae_image_enhancer_project_tpu.export.enhance import make_enhance_fn
from fs_uae_image_enhancer_project_tpu.export.onnx_export import (
    export_pix_shuffle_onnx,
)
from fs_uae_image_enhancer_project_tpu.export.onnx_runner import (
    run_model,
    verify_onnx_model,
)

REF_ONNX = "/root/reference/model/model_pix_shuffle/pix_shuffle.onnx"


from conftest import psnr as _psnr  # shared helper


@pytest.fixture(scope="module")
def exported(tmp_path_factory):
    """A small exported artifact (64x96 frames keep the numpy runner fast)."""
    m = get_model("pix_shuffle")
    params = m.init(jax.random.key(0))
    path = str(tmp_path_factory.mktemp("onnx") / "ps.onnx")
    export_pix_shuffle_onnx(
        params, m.config, path, crop_left=16, fp16=False,
        frame_h=64, frame_w=96,
    )
    return m, params, path


def test_export_runs_and_matches_jax(exported):
    m, params, path = exported
    frame = np.random.default_rng(0).integers(0, 256, (1, 64, 96, 4), np.uint8)
    outs = run_model(path, {"input_rgba_chunky": frame})
    y_onnx = outs["output_rgba_uint8_chunky"]
    assert y_onnx.shape == (1, 64, 96, 4) and y_onnx.dtype == np.uint8
    enh = make_enhance_fn(
        m.apply, params, crop_left=16, compute_dtype=jnp.float32, donate=False
    )
    y_jax = np.asarray(enh(jnp.asarray(frame)))
    assert _psnr(y_jax[..., :3], y_onnx[..., :3]) >= 45.0
    # crop-16 contract: left 16 columns padded black, alpha everywhere 255
    assert (y_onnx[:, :, :16, :3] == 0).all()
    assert (y_onnx[..., 3] == 255).all()


def test_verify_onnx_model(exported):
    _m, _params, path = exported
    outs = verify_onnx_model(path, verbose=0)
    assert "output_rgba_uint8_chunky" in outs


def test_onnx_dump(exported):
    from fs_uae_image_enhancer_project_tpu.export.onnx_dump import dump

    _m, _params, path = exported
    text = dump(path, max_nodes=5)
    assert "input_rgba_chunky" in text
    assert "Conv" in text or "more" in text
    assert "conv1.weight" in text


@pytest.mark.skipif(not os.path.exists(REF_ONNX), reason="reference unavailable")
def test_runner_executes_shipped_reference_graph():
    """The shipped fp16 artifact runs under the numpy runner and matches the
    native jax path with imported weights at >= 50 dB."""
    from PIL import Image

    from fs_uae_image_enhancer_project_tpu.export.enhance import enhance_from_onnx

    src = np.asarray(Image.open("/root/reference/model/samples/sample0.png"))
    outs = run_model(REF_ONNX, {"input_rgba_chunky": src[None]})
    y_ref = outs["output_rgba_uint8_chunky"]
    enh = enhance_from_onnx(REF_ONNX, donate=False, compute_dtype=jnp.float32)
    y_jax = np.asarray(enh(jnp.asarray(src[None])))
    assert _psnr(y_jax[..., :3], y_ref[..., :3]) >= 50.0


def test_raw_runner_roundtrip(exported, tmp_path):
    from fs_uae_image_enhancer_project_tpu.export import raw_runner

    _m, _params, path = exported
    rng = np.random.default_rng(1)
    frame = rng.integers(0, 256, (64, 96, 4), np.uint8)
    raw_path = str(tmp_path / "frame.raw")
    frame.tofile(raw_path)
    loaded = raw_runner.load_raw_rgba(raw_path, width=96, height=64)
    np.testing.assert_array_equal(loaded[0], frame)
    with pytest.raises(ValueError):
        raw_runner.load_raw_rgba(raw_path)  # wrong default size


def test_stablehlo_export_roundtrip(tmp_path):
    from fs_uae_image_enhancer_project_tpu.export.stablehlo import (
        export_enhance,
        load_enhance,
    )

    m = get_model("pix_shuffle")
    params = m.init(jax.random.key(0))
    enh = make_enhance_fn(m.apply, params, crop_left=0, donate=False, jit=False)
    path = str(tmp_path / "enhance.jaxexport")
    export_enhance(enh, path, frame_h=32, frame_w=48)
    loaded = load_enhance(path)
    frame = jnp.asarray(
        np.random.default_rng(0).integers(0, 256, (1, 32, 48, 4), np.uint8)
    )
    y1 = np.asarray(jax.jit(enh)(frame))
    y2 = np.asarray(loaded(frame))
    np.testing.assert_array_equal(y1, y2)


def test_onnx_svg_render(exported, tmp_path):
    from fs_uae_image_enhancer_project_tpu.export.onnx_svg import render_file

    _m, _params, path = exported
    svg_path = render_file(path, str(tmp_path / "g.svg"))
    text = open(svg_path).read()
    assert text.startswith("<svg") and "Conv" in text and "</svg>" in text


@pytest.mark.skipif(
    not os.path.exists("/root/reference/model/model_conv5/conv5.onnx"),
    reason="reference unavailable",
)
def test_conv5_deployed_semantics_parity():
    """The deployed conv5 graph applies ReLU before the residual adds
    (fusion reordering); our conv_stack deployed path must reproduce it.
    Truth = the shipped graph executed by the numpy runner."""
    from PIL import Image

    from fs_uae_image_enhancer_project_tpu.export.enhance import enhance_from_onnx

    path = "/root/reference/model/model_conv5/conv5.onnx"
    src = np.asarray(Image.open("/root/reference/model/samples/sample0.png"))
    truth = run_model(path, {"input_rgba_chunky": src[None]})[
        "output_rgba_uint8_chunky"
    ]
    enh = enhance_from_onnx(path, donate=False, compute_dtype=jnp.float32)
    ours = np.asarray(enh(jnp.asarray(src[None])))
    assert _psnr(ours[..., :3], truth[..., :3]) >= 50.0


def test_conv_stack_export_roundtrip(tmp_path):
    """conv5 export (training semantics, sigmoid) runs under the runner and
    matches the jax fused path."""
    from fs_uae_image_enhancer_project_tpu.export.onnx_export import (
        export_conv_stack_onnx,
    )
    from fs_uae_image_enhancer_project_tpu.models.conv_stack import fuse

    m = get_model("conv5")
    fused = fuse(m.init(jax.random.key(2)), m.config)
    path = str(tmp_path / "c5.onnx")
    export_conv_stack_onnx(fused, m.config, path, fp16=False,
                           frame_h=32, frame_w=48)
    frame = np.random.default_rng(3).integers(0, 256, (1, 32, 48, 4), np.uint8)
    y_onnx = run_model(path, {"input_rgba_chunky": frame})[
        "output_rgba_uint8_chunky"
    ]
    import functools

    from fs_uae_image_enhancer_project_tpu.models.conv_stack import apply_fused

    enh = make_enhance_fn(
        functools.partial(apply_fused, cfg=m.config),
        fused, crop_left=0, srgb_domain=True,
        compute_dtype=jnp.float32, donate=False,
    )
    y_jax = np.asarray(enh(jnp.asarray(frame)))
    assert _psnr(y_jax[..., :3], y_onnx[..., :3]) >= 45.0
    assert (y_onnx[..., 3] == 255).all()


def test_export_reimport_roundtrip(exported, tmp_path):
    """Our own exported artifact re-imports completely (incl. PRelu slopes)
    and reconstructs a working enhance fn — regression for the KeyError:
    'slope' crash found in review."""
    from fs_uae_image_enhancer_project_tpu.export.enhance import enhance_from_onnx
    from fs_uae_image_enhancer_project_tpu.export.onnx_import import import_pix_shuffle

    m, params, path = exported
    imp = import_pix_shuffle(path)
    assert imp.crop_left == 16  # detected from the wrapper graph
    assert "slope" in imp.params["l2_act4"]
    np.testing.assert_allclose(
        np.asarray(imp.params["l2_act4"]["slope"]),
        np.asarray(params["l2_act4"]["slope"]), atol=1e-6,
    )
    enh = enhance_from_onnx(path, donate=False, compute_dtype=jnp.float32)
    frame = jnp.asarray(
        np.random.default_rng(5).integers(0, 256, (1, 64, 96, 4), np.uint8)
    )
    out = np.asarray(enh(frame))
    assert out.shape == (1, 64, 96, 4)
    # direct-path equivalence (same weights, same crop, fp16 rounding only)
    direct = make_enhance_fn(
        m.apply, params, crop_left=16, compute_dtype=jnp.float32, donate=False
    )
    assert _psnr(out[..., :3], np.asarray(direct(frame))[..., :3]) >= 45.0


def test_runner_slice_steps(tmp_path):
    """Slice with steps (negative/strided) — review found it silently ignored."""
    from fs_uae_image_enhancer_project_tpu.export.onnx_proto import (
        FLOAT, GraphBuilder,
    )

    b = GraphBuilder("s")
    b.add_input("x", FLOAT, (1, 8))
    b.add_initializer("starts", np.array([7], np.int64))
    b.add_initializer("ends", np.array([-9], np.int64))
    b.add_initializer("axes", np.array([1], np.int64))
    b.add_initializer("steps", np.array([-1], np.int64))
    b.add_node("Slice", ["x", "starts", "ends", "axes", "steps"], ["y"])
    b.add_output("y", FLOAT, (1, 8))
    path = str(tmp_path / "slice.onnx")
    with open(path, "wb") as f:
        f.write(b.serialize_model())
    x = np.arange(8, dtype=np.float32)[None]
    out = run_model(path, {"x": x})["y"]
    np.testing.assert_array_equal(out, x[:, ::-1])


def test_export_heavyweight_pix_shuffle(tmp_path):
    """The emitter handles the heavyweight act set (biased_relu, leaky_relu,
    prelu, sinlu) and channel-mismatch skip projections."""
    m = get_model("pix_shuffle", "heavyweight")
    params = m.init(jax.random.key(4))
    path = str(tmp_path / "heavy.onnx")
    export_pix_shuffle_onnx(params, m.config, path, crop_left=0, fp16=False,
                            frame_h=32, frame_w=64)
    frame = np.random.default_rng(0).integers(0, 256, (1, 32, 64, 4), np.uint8)
    y = run_model(path, {"input_rgba_chunky": frame})["output_rgba_uint8_chunky"]
    enh = make_enhance_fn(m.apply, params, crop_left=0,
                          compute_dtype=jnp.float32, donate=False)
    y_jax = np.asarray(enh(jnp.asarray(frame)))
    assert _psnr(y_jax[..., :3], y[..., :3]) >= 45.0


def test_committed_artifact_reports_clear_family_bar():
    """Every committed artifacts/model_*/parity_report.json must clear the
    >=63 dB family bar on its primary graph (VERDICT r2 item 6: the heavy
    fp16 export sat at 59.9 dB; the primary is fp32 now, fp16 kept as a
    documented size-parity variant)."""
    import glob
    import json

    reports = glob.glob(os.path.join(
        os.path.dirname(__file__), "..", "artifacts", "model_*",
        "parity_report.json"))
    assert len(reports) >= 6
    for path in reports:
        with open(path) as f:
            r = json.load(f)
        primary = [v for k, v in r.items()
                   if k.endswith("_db") and "fp16" not in k]
        assert primary, path
        assert min(primary) >= 63.0, (path, r)


def test_export_residual_unet_roundtrip(tmp_path):
    """residual U-Net ONNX emission (a capability the reference lacks —
    torch2onnx.py covers only conv/pix_shuffle): exported graph executed by
    the numpy runner matches the native jax enhance path."""
    from fs_uae_image_enhancer_project_tpu.export.onnx_export import (
        export_residual_unet_onnx,
    )
    from fs_uae_image_enhancer_project_tpu.models import residual_unet
    from fs_uae_image_enhancer_project_tpu.models.configs import (
        ResidualUNetConfig,
    )

    cfg = ResidualUNetConfig(unet_depth=2, blocks_per_level=1,
                             base_channels=8,
                             internal_block_channels_ratio=1.5)
    params = residual_unet.init(jax.random.key(2), cfg)
    path = str(tmp_path / "unet.onnx")
    export_residual_unet_onnx(params, cfg, path, crop_left=0, fp16=False,
                              frame_h=32, frame_w=64)
    frame = np.random.default_rng(1).integers(0, 256, (1, 32, 64, 4),
                                              np.uint8)
    y = run_model(path, {"input_rgba_chunky": frame})[
        "output_rgba_uint8_chunky"]
    enh = make_enhance_fn(
        lambda p, x: residual_unet.apply(p, x, cfg), params, crop_left=0,
        compute_dtype=jnp.float32, donate=False)
    y_jax = np.asarray(enh(jnp.asarray(frame)))
    assert y.shape == (1, 32, 64, 4)
    np.testing.assert_array_equal(y[..., 3], 255)
    assert _psnr(y_jax[..., :3], y[..., :3]) >= 45.0


def test_export_residual_unet_rejects_indivisible(tmp_path):
    from fs_uae_image_enhancer_project_tpu.export.onnx_export import (
        export_residual_unet_onnx,
    )
    from fs_uae_image_enhancer_project_tpu.models import residual_unet
    from fs_uae_image_enhancer_project_tpu.models.configs import (
        ResidualUNetConfig,
    )

    cfg = ResidualUNetConfig(unet_depth=3, blocks_per_level=1,
                             base_channels=8)
    params = residual_unet.init(jax.random.key(0), cfg)
    with pytest.raises(ValueError, match="divisible"):
        export_residual_unet_onnx(params, cfg, str(tmp_path / "x.onnx"),
                                  crop_left=0, frame_h=30, frame_w=64)


def test_export_conv6_roundtrip(tmp_path):
    """conv6 (the reference's phantom NAS family) ONNX emission: exported
    graph via the numpy runner matches the native jax path, exercising the
    NAS activation set (mish/telu/sinlu/biased_relu/prelu/...)."""
    from fs_uae_image_enhancer_project_tpu.export.onnx_export import (
        export_conv6_onnx,
    )
    from fs_uae_image_enhancer_project_tpu.models import get_model

    m = get_model("conv6")
    params = m.init(jax.random.key(3))
    path = str(tmp_path / "conv6.onnx")
    export_conv6_onnx(params, m.config, path, fp16=False,
                      frame_h=24, frame_w=40)
    frame = np.random.default_rng(5).integers(0, 256, (1, 24, 40, 4),
                                              np.uint8)
    y = run_model(path, {"input_rgba_chunky": frame})[
        "output_rgba_uint8_chunky"]
    enh = make_enhance_fn(m.apply, params, crop_left=0,
                          compute_dtype=jnp.float32, donate=False)
    y_jax = np.asarray(enh(jnp.asarray(frame)))
    np.testing.assert_array_equal(y[..., 3], 255)
    assert _psnr(y_jax[..., :3], y[..., :3]) >= 45.0


def test_export_cli_conv6(tmp_path):
    """Export CLI end-to-end for a non-pix_shuffle family: checkpoint ->
    conv6 .onnx -> crop-sized numpy-runner verify + jax cross-check."""
    from fs_uae_image_enhancer_project_tpu.export import cli
    from fs_uae_image_enhancer_project_tpu.models import get_model
    from fs_uae_image_enhancer_project_tpu.parallel.train_step import (
        TrainState,
    )
    from fs_uae_image_enhancer_project_tpu.train.trainer import (
        save_checkpoint,
    )

    m = get_model("conv6")
    params = m.init(jax.random.key(1))
    ckpt = str(tmp_path / "ck")
    save_checkpoint(ckpt, TrainState(jnp.zeros((), jnp.int32), params, {},
                                     {}))
    out = str(tmp_path / "conv6.onnx")
    rc = cli.main(["--checkpoint", ckpt, "--model_type", "conv6",
                   "--output", out, "--fp32"])
    assert rc == 0
    assert os.path.getsize(out) > 100_000


def test_export_softmax_activations_roundtrip(tmp_path):
    """The last two registry activations (softmax/log_softmax, channel
    axis): emitter maps the NHWC axis config to the NCHW graph axis and
    the runner reproduces the jax path — closing 20/20 ONNX-emittable
    activations."""
    from fs_uae_image_enhancer_project_tpu.export.onnx_export import (
        export_conv6_onnx,
    )
    from fs_uae_image_enhancer_project_tpu.models import conv6
    from fs_uae_image_enhancer_project_tpu.models.configs import (
        Conv6Config, ConvLayerSpec, act,
    )

    layers = list(conv6.default_config().layers)
    layers[2] = ConvLayerSpec(36, 3, (act("softmax"), act("identity")))
    layers[4] = ConvLayerSpec(36, 3, (act("log_softmax"), act("identity")))
    cfg = Conv6Config(layers=tuple(layers))
    params = conv6.init(jax.random.key(6), cfg)
    path = str(tmp_path / "c6sm.onnx")
    export_conv6_onnx(params, cfg, path, fp16=False, frame_h=16, frame_w=24)
    frame = np.random.default_rng(9).integers(0, 256, (1, 16, 24, 4),
                                              np.uint8)
    y = run_model(path, {"input_rgba_chunky": frame})[
        "output_rgba_uint8_chunky"]
    enh = make_enhance_fn(
        lambda p, x: conv6.apply(p, x, cfg), params, crop_left=0,
        compute_dtype=jnp.float32, donate=False)
    y_jax = np.asarray(enh(jnp.asarray(frame)))
    assert _psnr(y_jax[..., :3], y[..., :3]) >= 45.0


def test_export_cli_conv3_bn_checkpoint(tmp_path):
    """Export CLI on a REAL BN-model trainer checkpoint: conv3 saves with
    running stats split into 'buffers' (save_checkpoint), load_params must
    merge them back for the full-model template, and fuse() needs them.
    Regression for the round-3 review finding."""
    from fs_uae_image_enhancer_project_tpu.export import cli
    from fs_uae_image_enhancer_project_tpu.models import get_model
    from fs_uae_image_enhancer_project_tpu.parallel.train_step import (
        TrainState, init_train_state, make_optimizer,
    )
    from fs_uae_image_enhancer_project_tpu.train.trainer import (
        save_checkpoint,
    )

    m = get_model("conv3")
    params = m.init(jax.random.key(2))
    state = init_train_state(params, make_optimizer(), has_batchnorm=True)
    ckpt = str(tmp_path / "ck")
    save_checkpoint(ckpt, state)
    out = str(tmp_path / "conv3.onnx")
    rc = cli.main(["--checkpoint", ckpt, "--model_type", "conv3",
                   "--output", out, "--fp32"])
    assert rc == 0
    assert os.path.getsize(out) > 50_000


def test_import_any_dispatches_native_families(tmp_path):
    """import_any routes our own conv6/unet artifacts by graph name.

    Regression: dispatch was solely 'has DepthToSpace', which imported
    conv6 (no shuffle) as a plain conv_stack and residual_unet (has a
    DepthToSpace) as pix_shuffle — both crashed opaquely downstream."""
    from fs_uae_image_enhancer_project_tpu.export.onnx_export import (
        export_conv6_onnx, export_residual_unet_onnx,
    )
    from fs_uae_image_enhancer_project_tpu.export.onnx_import import (
        import_any,
    )
    from fs_uae_image_enhancer_project_tpu.models import get_model

    m = get_model("conv6")
    p1 = str(tmp_path / "c6.onnx")
    export_conv6_onnx(m.init(jax.random.key(0)), m.config, p1,
                      frame_h=24, frame_w=40)
    imp = import_any(p1)
    assert imp.kind == "conv6"
    assert set(imp.params) >= {"conv1", "conv7"}

    mu = get_model("residual_unet", "lightweight")
    p2 = str(tmp_path / "un.onnx")
    export_residual_unet_onnx(mu.init(jax.random.key(1)), mu.config, p2,
                              crop_left=16, frame_h=32, frame_w=80)
    impu = import_any(p2)
    assert impu.kind == "residual_unet"
    assert impu.crop_left == 16
    assert "enc0_block0" in impu.params


def test_enhance_from_onnx_native_families_roundtrip(tmp_path):
    """enhance_from_onnx reconstructs conv6/unet artifacts bit-exactly
    (fp32 export; the jax forward on re-imported params is the same
    program on the same numbers)."""
    from fs_uae_image_enhancer_project_tpu.export.enhance import (
        enhance_from_onnx,
    )
    from fs_uae_image_enhancer_project_tpu.export.onnx_export import (
        export_conv6_onnx, export_residual_unet_onnx,
    )
    from fs_uae_image_enhancer_project_tpu.models import get_model

    rng = np.random.default_rng(7)

    m = get_model("conv6")
    params = m.init(jax.random.key(2))
    p1 = str(tmp_path / "c6.onnx")
    export_conv6_onnx(params, m.config, p1, frame_h=24, frame_w=40)
    frame = jnp.asarray(rng.integers(0, 256, (1, 24, 40, 4), np.uint8))
    native = make_enhance_fn(m.apply, params, crop_left=0, donate=False)
    rt = enhance_from_onnx(p1, donate=False)
    np.testing.assert_array_equal(np.asarray(native(frame)),
                                  np.asarray(rt(frame)))

    mu = get_model("residual_unet", "lightweight")
    pu = mu.init(jax.random.key(3))
    p2 = str(tmp_path / "un.onnx")
    export_residual_unet_onnx(pu, mu.config, p2, crop_left=0,
                              frame_h=32, frame_w=64)
    frame2 = jnp.asarray(rng.integers(0, 256, (1, 32, 64, 4), np.uint8))
    native2 = make_enhance_fn(mu.apply, pu, crop_left=0, donate=False)
    rt2 = enhance_from_onnx(p2, donate=False)
    np.testing.assert_array_equal(np.asarray(native2(frame2)),
                                  np.asarray(rt2(frame2)))


def test_enhance_from_onnx_rejects_unregistered_unet_topology(tmp_path):
    """A unet artifact whose config is not a registered variant fails with
    a clear error instead of a KeyError deep in apply()."""
    from fs_uae_image_enhancer_project_tpu.export.enhance import (
        enhance_from_onnx,
    )
    from fs_uae_image_enhancer_project_tpu.export.onnx_export import (
        export_residual_unet_onnx,
    )
    from fs_uae_image_enhancer_project_tpu.models import residual_unet
    from fs_uae_image_enhancer_project_tpu.models.configs import (
        ResidualUNetConfig,
    )

    cfg = ResidualUNetConfig(unet_depth=2, blocks_per_level=1,
                             base_channels=8,
                             internal_block_channels_ratio=1.5)
    params = residual_unet.init(jax.random.key(4), cfg)
    path = str(tmp_path / "tiny.onnx")
    export_residual_unet_onnx(params, cfg, path, crop_left=0,
                              frame_h=16, frame_w=32)
    with pytest.raises(ValueError, match="neither residual_unet variant"):
        enhance_from_onnx(path, donate=False)


def test_proto_negative_and_unpacked_int_data():
    """TensorProto numeric fields: negative int32/int64 values are 64-bit
    two's-complement varints (must sign-convert), and repeated fields must
    accept the unpacked (one tag per value) encoding."""
    from fs_uae_image_enhancer_project_tpu.export import onnx_proto as op

    def tensor_msg(data_fnum, values, data_type, packed):
        out = bytearray()
        op._put_varint_field(out, 1, 2)  # dims: [2] (one unpacked entry=2)
        op._put_varint_field(out, 2, data_type)
        if packed:
            payload = bytearray()
            for v in values:
                op._write_varint(payload, v)
            op._put_bytes_field(out, data_fnum, bytes(payload))
        else:
            for v in values:
                op._put_varint_field(out, data_fnum, v)
        op._put_bytes_field(out, 8, b"t")
        return bytes(out)

    # packed negative int32
    t = op._parse_tensor(tensor_msg(5, [-3, 7], op.INT32, packed=True))
    np.testing.assert_array_equal(t.to_numpy(), np.array([-3, 7], np.int32))
    # unpacked negative int64
    t = op._parse_tensor(tensor_msg(7, [-(2**40), 5], op.INT64,
                                    packed=False))
    np.testing.assert_array_equal(
        t.to_numpy(), np.array([-(2**40), 5], np.int64))
    # unpacked int32
    t = op._parse_tensor(tensor_msg(5, [1, -1], op.INT32, packed=False))
    np.testing.assert_array_equal(t.to_numpy(), np.array([1, -1], np.int32))


def test_runner_rejects_unsupported_conv_attributes(tmp_path):
    """The numpy runner is the parity truth: Conv attributes it does not
    implement (dilations, auto_pad, mismatched kernel_shape) raise instead
    of silently computing a different function."""
    from fs_uae_image_enhancer_project_tpu.export.onnx_proto import (
        FLOAT, GraphBuilder,
    )

    def graph(path, **conv_attrs):
        b = GraphBuilder("g")
        b.add_input("x", FLOAT, (1, 1, 4, 4))
        b.add_initializer("w", np.ones((1, 1, 3, 3), np.float32))
        b.add_node("Conv", ["x", "w"], ["y"], strides=[1, 1],
                   pads=[1, 1, 1, 1], **conv_attrs)
        b.add_output("y", FLOAT, (1, 1, 4, 4))
        with open(path, "wb") as f:
            f.write(b.serialize_model(opset=13))
        return path

    x = {"x": np.ones((1, 1, 4, 4), np.float32)}
    ok = graph(str(tmp_path / "ok.onnx"), kernel_shape=[3, 3])
    assert run_model(ok, x)["y"].shape == (1, 1, 4, 4)
    with pytest.raises(NotImplementedError, match="dilations"):
        run_model(graph(str(tmp_path / "d.onnx"), dilations=[2, 2]), x)
    with pytest.raises(NotImplementedError, match="kernel_shape"):
        run_model(graph(str(tmp_path / "k.onnx"), kernel_shape=[1, 1]), x)


def test_exporter_emits_per_axis_kernel_shape(tmp_path):
    """Non-square conv kernels export with per-axis kernel_shape/pads
    (previously both were derived from the H axis alone)."""
    from fs_uae_image_enhancer_project_tpu.export.onnx_export import (
        _ModelEmitter,
    )
    from fs_uae_image_enhancer_project_tpu.export.onnx_proto import (
        FLOAT, GraphBuilder, load_model,
    )

    b = GraphBuilder("g")
    b.add_input("x", FLOAT, (1, 2, 8, 8))
    em = _ModelEmitter(
        b, {"c": {"w": np.zeros((1, 3, 2, 4), np.float32)}}, FLOAT)
    y = em.conv("c", "x")
    b.add_output(y, FLOAT, (1, 4, 8, 8))
    path = str(tmp_path / "nsq.onnx")
    with open(path, "wb") as f:
        f.write(b.serialize_model(opset=13))
    node = [n for n in load_model(path).graph.nodes
            if n.op_type == "Conv"][0]
    assert node.attr("kernel_shape") == [1, 3]
    assert node.attr("pads") == [0, 1, 0, 1]
