"""Model zoo structural tests: shapes, analytic parameter counts (pinned to
the reference's published counts, BASELINE.md), jit-ability, contracts."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fs_uae_image_enhancer_project_tpu.models import (
    blocks,
    count_params,
    get_model,
)
from fs_uae_image_enhancer_project_tpu.models.conv_stack import (
    apply_fused,
    apply_uint8_rgba,
    fuse,
)

KEY = jax.random.key(0)


# Reference analytic parameter counts (BASELINE.md; model_conv3.py:206-211,
# model_conv5.py:157-162, model_pix_shuffle.py:304-314)
@pytest.mark.parametrize(
    "name,variant,expected",
    [
        ("conv3", "lightweight", 21_222),
        ("conv3", "heavyweight", 455_366),
        ("conv5", "lightweight", 67_494),
        ("conv5", "heavyweight", 264_006),
        ("pix_shuffle", "lightweight", 136_602),
    ],
)
def test_param_counts_match_reference(name, variant, expected):
    m = get_model(name, variant)
    params = m.init(KEY)
    # batchnorm running stats are buffers, not trainable params, in torch
    trainable = {
        k: ({kk: vv for kk, vv in v.items() if kk not in ("mean", "var")}
            if k.startswith("bn") else v)
        for k, v in params.items()
    }
    assert count_params(trainable) == expected


@pytest.mark.parametrize("alias", ["conv3_heavy", "pix_shuffle_heavy"])
def test_heavy_aliases(alias):
    m = get_model(alias)
    assert m.variant == "heavyweight"


def test_pix_shuffle_forward_shape_and_jit():
    m = get_model("pix_shuffle")
    params = m.init(KEY)
    x = jax.random.uniform(KEY, (1, 64, 96, 3), jnp.float32)
    y = jax.jit(m.apply)(params, x)
    assert y.shape == x.shape
    assert np.all(np.asarray(y) >= 0.0)  # final ReLU (model_pix_shuffle.py:296)


def test_pix_shuffle_global_residual():
    # zero the last conv: output must equal relu(identity) = input (inputs >= 0)
    m = get_model("pix_shuffle")
    params = m.init(KEY)
    params["conv7"] = {
        "w": jnp.zeros_like(params["conv7"]["w"]),
        "b": jnp.zeros_like(params["conv7"]["b"]),
    }
    # layer-7 acts are identity & biased_prelu — biased_prelu(0) is a constant
    # per-image offset, so compare against that analytic value instead of 0
    x = jax.random.uniform(jax.random.key(1), (1, 8, 8, 3), jnp.float32)
    y = m.apply(params, x)
    bias = float(params["l7_act2"]["bias"][0])
    slope = float(params["l7_act2"]["slope"][0])
    resid = -bias if -bias >= 0 else slope * -bias
    expected = np.maximum(np.asarray(x) + resid, 0.0)  # final ReLU
    np.testing.assert_allclose(np.asarray(y), expected, atol=1e-5)


@pytest.mark.parametrize("name", ["conv3", "conv5"])
def test_conv_stack_forward_and_fuse(name):
    m = get_model(name)
    params = m.init(KEY)
    x = jax.random.uniform(KEY, (2, 16, 24, 3), jnp.float32)
    y = m.apply(params, x)
    assert y.shape == (2, 16, 24, 3)
    if name == "conv5":  # Sigmoid output (model_conv5.py:64)
        assert np.all((np.asarray(y) >= 0) & (np.asarray(y) <= 1))
    # fused form must match inference-mode unfused forward
    fused = fuse(params, m.config)
    y_fused = apply_fused(fused, x, m.config)
    np.testing.assert_allclose(np.asarray(y_fused), np.asarray(y), atol=2e-5)


def test_conv_stack_train_mode_returns_stats():
    m = get_model("conv3")
    params = m.init(KEY)
    x = jax.random.uniform(KEY, (2, 8, 8, 3), jnp.float32)
    y, new_stats = m.apply(params, x, train=True)
    assert y.shape == x.shape
    assert set(new_stats) == {"bn1", "bn2", "bn3"}


def test_conv3_uint8_rgba_contract():
    m = get_model("conv3")
    fused = fuse(m.init(KEY), m.config)
    x = jax.random.randint(KEY, (1, 16, 16, 4), 0, 256, jnp.uint8)
    y = apply_uint8_rgba(fused, x, m.config)
    assert y.shape == (1, 16, 16, 4)
    np.testing.assert_array_equal(np.asarray(y[..., 3]), 255.0)
    with pytest.raises(ValueError):  # contract check (model_conv3.py:109-110)
        apply_uint8_rgba(fused, x.astype(jnp.float32), m.config)


def test_conv6_forward_shape():
    m = get_model("conv6")
    params = m.init(KEY)
    x = jax.random.uniform(KEY, (1, 16, 16, 3), jnp.float32)
    y = jax.jit(m.apply)(params, x)
    assert y.shape == x.shape
    assert np.all(np.asarray(y) >= 0.0)


def test_residual_unet_forward_shape():
    m = get_model("residual_unet")  # depth 3 -> needs /8 dims
    params = m.init(KEY)
    x = jax.random.uniform(KEY, (1, 48, 64, 3), jnp.float32)
    y = m.apply(params, x)
    assert y.shape == x.shape
    with pytest.raises(ValueError):
        m.apply(params, jax.random.uniform(KEY, (1, 50, 64, 3)))


def test_feature_block_projection_paths():
    acts = blocks.DEFAULT_BLOCK_ACTS
    # same in/out: no projection
    p = blocks.init_feature_block(KEY, 8, 12, 8, 3, acts)
    assert "proj" not in p
    x = jax.random.uniform(KEY, (1, 8, 8, 8), jnp.float32)
    assert blocks.apply_feature_block(p, x, acts, 12, 8).shape == (1, 8, 8, 8)
    # different in/out: projection present
    p2 = blocks.init_feature_block(KEY, 8, 12, 16, 3, acts)
    assert "proj" in p2
    assert blocks.apply_feature_block(p2, x, acts, 12, 16).shape == (1, 8, 8, 16)


def test_feature_block_channel_global_resolution():
    acts = (
        ("prelu", (("num_parameters", "channel"),)),
        ("relu", ()),
        ("prelu", (("num_parameters", "global"),)),
        ("relu", ()),
    )
    p = blocks.init_feature_block(KEY, 8, 12, 16, 3, acts)
    assert p["act1"]["slope"].shape == (12,)  # mid channels
    assert p["act3"]["slope"].shape == (1,)  # global


def test_dense_block_and_triplet_attention():
    # matching channels: reference returns the fusion output with NO
    # residual (residual_dense_block.py:129-137 leaves the adjustment conv
    # None and :180-183 only adds through it)
    p = blocks.init_dense_block(KEY, 16, growth=8, n_convs=3,
                                use_attention=True)
    assert "adjust" not in p
    x = jax.random.uniform(KEY, (1, 8, 8, 16), jnp.float32)
    y = blocks.apply_dense_block(p, x, n_convs=3)
    assert y.shape == x.shape
    # differing channels: 1x1-adjusted residual is added
    p2 = blocks.init_dense_block(KEY, 16, out_channels=24, growth=8,
                                 n_convs=2)
    assert "adjust" in p2
    y2 = blocks.apply_dense_block(p2, x, n_convs=2)
    assert y2.shape == (1, 8, 8, 24)
    # channel-resolved activation params land on the growth width
    p3 = blocks.init_dense_block(
        KEY, 16, growth=8, n_convs=2,
        acts=(("prelu", (("num_parameters", "channel"),)), ("identity", ())),
    )
    assert p3["l1_act1"]["slope"].shape == (8,)
    y3 = blocks.apply_dense_block(
        p3, x, n_convs=2,
        acts=(("prelu", (("num_parameters", "channel"),)), ("identity", ())),
    )
    assert y3.shape == x.shape
    pa = blocks.init_triplet_attention(KEY)
    ya = blocks.apply_triplet_attention(pa, x)
    assert ya.shape == x.shape


def test_config_json_roundtrip():
    from fs_uae_image_enhancer_project_tpu.models import config_from_json, config_to_json
    m = get_model("pix_shuffle")
    s = config_to_json(m.config)
    cfg2 = config_from_json(s)
    assert cfg2 == m.config


def test_model_summary():
    from fs_uae_image_enhancer_project_tpu.models.summary import summarize

    m = get_model("pix_shuffle")
    text = summarize(m.init(KEY), "pix_shuffle")
    assert "conv1.w" in text and "total 136,602" in text
    m3 = get_model("conv3")
    text3 = summarize(m3.init(KEY))
    assert "buffer" in text3  # bn running stats flagged


def test_pix_shuffle_heavyweight_skip_projections():
    """Heavyweight config (36->108 channel jumps) exercises the 1x1
    bias-free skip projections (model_pix_shuffle.py:126-128, :143-145)."""
    m = get_model("pix_shuffle", "heavyweight")
    params = m.init(KEY)
    assert "skip1_proj" not in params  # 36 == 36
    assert "skip2_proj" not in params  # 108 == 108
    # force differing channels to create projections
    from fs_uae_image_enhancer_project_tpu.models.configs import (
        ConvLayerSpec,
        PixShuffleConfig,
        act,
    )
    from fs_uae_image_enhancer_project_tpu.models import pix_shuffle as ps

    cfg = PixShuffleConfig(
        layers=(
            ConvLayerSpec(24, 3, (act("relu"), act("identity"))),
            ConvLayerSpec(36, 3, (act("relu"), act("identity"),
                                  act("identity"), act("identity"))),
            ConvLayerSpec(48, 3, (act("identity"), act("identity"))),
            ConvLayerSpec(64, 3, (act("relu"), act("identity"),
                                  act("identity"), act("identity"))),
            ConvLayerSpec(24, 3, (act("identity"), act("identity"))),
            ConvLayerSpec(36, 3, (act("relu"), act("identity"))),
            ConvLayerSpec(12, 3, (act("identity"), act("identity"))),
        )
    )
    p = ps.init(KEY, cfg)
    assert "skip1_proj" in p and "skip2_proj" in p
    assert p["skip1_proj"]["w"].shape == (1, 1, 24, 36)
    assert "b" not in p["skip1_proj"]  # bias-free (reference :128)
    x = jax.random.uniform(KEY, (1, 16, 16, 3), jnp.float32)
    assert ps.apply(p, x, cfg).shape == x.shape


def test_dense_block_matches_reference_golden():
    """Bit-level parity with the reference's actual ResidualDenseBlock
    (torch goldens from tests/golden_gen/gen_dense_block_goldens.py —
    the reference module executed with a triplet_attention stub):
    matching-channels (no residual), adjusted-residual, and
    channel-resolved-PReLU configurations."""
    import os

    import numpy as np

    path = os.path.join(os.path.dirname(__file__), "goldens",
                        "dense_block_goldens.npz")
    g = np.load(path)

    def build(tag, n_convs, has_adjust, prelu_slot1=False):
        p = {}
        for i in range(n_convs):
            p[f"conv{i + 1}"] = {
                "w": np.transpose(g[f"{tag}_w_dense_layers.{3 * i}.weight"],
                                  (2, 3, 1, 0)),
                "b": g[f"{tag}_w_dense_layers.{3 * i}.bias"],
            }
            if prelu_slot1:
                p[f"l{i + 1}_act1"] = {
                    "slope": g[f"{tag}_w_dense_layers.{3 * i + 1}.weight"]
                    .reshape(-1)
                }
            else:
                p[f"l{i + 1}_act1"] = {}
            p[f"l{i + 1}_act2"] = {}
        p["fusion"] = {
            "w": np.transpose(g[f"{tag}_w_dense_feature_fusion.weight"],
                              (2, 3, 1, 0)),
            "b": g[f"{tag}_w_dense_feature_fusion.bias"],
        }
        if has_adjust:
            p["adjust"] = {
                "w": np.transpose(
                    g[f"{tag}_w_local_residual_adjustment.weight"],
                    (2, 3, 1, 0)),
                "b": g[f"{tag}_w_local_residual_adjustment.bias"],
            }
        return jax.tree.map(jnp.asarray, p)

    for tag, n_convs, has_adjust, acts in [
        ("match", 3, False, blocks.DENSE_DEFAULT_ACTS),
        ("adjust", 2, True, blocks.DENSE_DEFAULT_ACTS),
        ("prelu", 2, False,
         (("prelu", (("num_parameters", "channel"),)), ("identity", ()))),
    ]:
        p = build(tag, n_convs, has_adjust, prelu_slot1=(tag == "prelu"))
        x = jnp.asarray(np.transpose(g[f"{tag}_x"], (0, 2, 3, 1)))
        y = blocks.apply_dense_block(p, x, n_convs=n_convs, acts=acts)
        ref = np.transpose(g[f"{tag}_y"], (0, 2, 3, 1))
        np.testing.assert_allclose(np.asarray(y), ref, atol=2e-5, rtol=1e-5)


def test_feature_block_matches_reference_golden():
    """Bit-level parity with the reference's actual ResidualFeatureBlock
    (torch goldens from tests/golden_gen/gen_feature_block_goldens.py):
    plain config and projected-residual config with channel/global PReLU
    resolution at mid/out widths."""
    import os

    import numpy as np

    g = np.load(os.path.join(os.path.dirname(__file__), "goldens",
                             "feature_block_goldens.npz"))

    def conv(tag, name):
        return {
            "w": jnp.asarray(np.transpose(g[f"{tag}_w_{name}.weight"],
                                          (2, 3, 1, 0))),
            "b": jnp.asarray(g[f"{tag}_w_{name}.bias"]),
        }

    # plain: in=8 mid=12 out=8, default acts
    p = {f"conv{i}": conv("plain", f"conv{i}") for i in (1, 2, 3)}
    p.update({f"act{i}": {} for i in (1, 2, 3, 4)})
    x = jnp.asarray(np.transpose(g["plain_x"], (0, 2, 3, 1)))
    y = blocks.apply_feature_block(p, x, blocks.DEFAULT_BLOCK_ACTS, 12, 8)
    np.testing.assert_allclose(
        np.asarray(y), np.transpose(g["plain_y"], (0, 2, 3, 1)),
        atol=2e-5, rtol=1e-5)

    # proj: in=8 mid=12 out=16, channel prelu act2 / global prelu act4
    acts = (("identity", ()),
            ("prelu", (("num_parameters", "channel"),)),
            ("identity", ()),
            ("prelu", (("num_parameters", "global"),)))
    p2 = {f"conv{i}": conv("proj", f"conv{i}") for i in (1, 2, 3)}
    p2["act1"] = {}
    p2["act2"] = {"slope": jnp.asarray(
        g["proj_w_act2.weight"].reshape(-1))}
    p2["act3"] = {}
    p2["act4"] = {"slope": jnp.asarray(
        g["proj_w_act4.weight"].reshape(-1))}
    p2["proj"] = conv("proj", "proj_conv")
    x2 = jnp.asarray(np.transpose(g["proj_x"], (0, 2, 3, 1)))
    y2 = blocks.apply_feature_block(p2, x2, acts, 12, 16)
    np.testing.assert_allclose(
        np.asarray(y2), np.transpose(g["proj_y"], (0, 2, 3, 1)),
        atol=2e-5, rtol=1e-5)


def _regen_unet_weight(key, shape):
    """Bit-identical duplicate of gen_unet_model_goldens.regen_weight —
    per-key crc32-seeded, fan-in-scaled (numpy is the shared RNG)."""
    import zlib

    rng = np.random.default_rng(zlib.crc32(key.encode()))
    v = rng.standard_normal(shape).astype(np.float32)
    if len(shape) == 4:  # OIHW conv weight
        v /= np.sqrt(shape[1] * shape[2] * shape[3])
    else:
        v *= 0.25
    return v


def _unet_params_from_manifest(tag, manifest, cfg):
    """Map the reference ResidualUNet state_dict (model_residual_unet.py
    :59-146 module tree) onto our param pytree, regenerating values."""
    def get(name):
        return _regen_unet_weight(f"{tag}/{name}", tuple(manifest[name]))

    def conv(prefix):
        return {
            "w": jnp.asarray(np.transpose(get(f"{prefix}.weight"),
                                          (2, 3, 1, 0))),
            "b": jnp.asarray(get(f"{prefix}.bias")),
        }

    def block(prefix):
        p = {f"conv{i}": conv(f"{prefix}.conv{i}") for i in (1, 2, 3)}
        if f"{prefix}.proj_conv.weight" in manifest:
            p["proj"] = conv(f"{prefix}.proj_conv")
        for i in (1, 2, 3, 4):
            wname = f"{prefix}.act{i}.weight"
            p[f"act{i}"] = ({"slope": jnp.asarray(get(wname).reshape(-1))}
                            if wname in manifest else {})
        return p

    p = {"stem": conv("first_pixel_unshuffle_and_conv.1")}
    for d in range(cfg.unet_depth):
        for i in range(cfg.blocks_per_level):
            p[f"enc{d}_block{i}"] = block(f"encoder_block_sequences.{d}.{i}")
    for i in range(cfg.blocks_per_level):
        p[f"bottleneck_block{i}"] = block(f"bottleneck.{i}")
    for i in range(cfg.unet_depth - 1):
        for j in range(cfg.blocks_per_level):
            p[f"dec{i}_block{j}"] = block(f"decoder_block_sequences.{i}.{j}")
    p["dec_final"] = conv(f"decoder_block_sequences.{cfg.unet_depth - 1}.0")
    return p


def test_residual_unet_matches_reference_golden():
    """FULL-MODEL parity with the reference's actual ResidualUNet
    (torch goldens from tests/golden_gen/gen_unet_model_goldens.py):
    the shipped lightweight and heavyweight configs plus a learnable-act
    config (telu / channel-PReLU / global-PReLU). This pins the complete
    wiring — stem, per-level stacks, bottleneck, skip concat order, final
    ReLU — which no reference artifact can (the reference never shipped a
    unet checkpoint or ONNX)."""
    import json
    import os

    from fs_uae_image_enhancer_project_tpu.models import residual_unet as ru
    from fs_uae_image_enhancer_project_tpu.models.configs import (
        ResidualUNetConfig,
    )

    g = np.load(os.path.join(os.path.dirname(__file__), "goldens",
                             "unet_model_goldens.npz"))
    prelu_acts = (("telu", ()),
                  ("prelu", (("num_parameters", "channel"),)),
                  ("identity", ()),
                  ("prelu", (("num_parameters", "global"),)))
    cases = {
        "light": ru.lightweight_config(),
        "heavy": ru.heavyweight_config(),
        "acts": ResidualUNetConfig(base_channels=8, unet_depth=2,
                                   blocks_per_level=2,
                                   internal_block_channels_ratio=0.75,
                                   acts=prelu_acts),
    }
    for tag, cfg in cases.items():
        manifest = json.loads(bytes(g[f"{tag}_manifest"]).decode())
        p = _unet_params_from_manifest(tag, manifest, cfg)
        x = jnp.asarray(np.transpose(g[f"{tag}_x"], (0, 2, 3, 1)))
        y = np.asarray(jax.jit(
            lambda p, x: ru.apply(p, x, cfg))(p, x))
        ref = np.transpose(g[f"{tag}_y"], (0, 2, 3, 1))
        # measured max abs err: light 1.7e-6, heavy 7.7e-5 (|y|~134,
        # depth-4 x 4-block accumulation), acts 4.1e-7
        tol = dict(atol=5e-4, rtol=5e-4) if tag == "heavy" else dict(
            atol=2e-5, rtol=2e-5)
        np.testing.assert_allclose(np.asarray(y), ref, **tol,
                                   err_msg=f"case {tag}")


def _pix_shuffle_params_from_manifest(tag, manifest):
    """Map the reference pix_shuffle state_dict (model_pix_shuffle.py
    :118-225 module tree) onto our param pytree, regenerating values with
    the shared crc32 scheme."""
    p = {}

    def put_conv(our, part, v):
        d = p.setdefault(our, {})
        if part == "weight":
            d["w"] = jnp.asarray(np.transpose(v, (2, 3, 1, 0)))
        else:
            d["b"] = jnp.asarray(v)

    for name, shape in manifest.items():
        v = _regen_unet_weight(f"{tag}/{name}", tuple(shape))
        parts = name.split(".")
        head = parts[0]
        if head.startswith("conv"):
            put_conv(head, parts[1], v)
        elif head in ("skip1_proj_conv", "skip2_proj_conv"):
            put_conv(head[:10], parts[1], v)
        else:  # l{li}_act{si} learnable activation params
            d = p.setdefault(head, {})
            rest = parts[1:]
            if rest == ["a"]:
                d["a"] = jnp.asarray(v)
            elif rest == ["b"]:
                d["b"] = jnp.asarray(v)
            elif rest == ["bias"]:
                d["bias"] = jnp.asarray(v)
            elif rest in (["weight"], ["prelu", "weight"]):
                d["slope"] = jnp.asarray(v.reshape(-1))
            else:
                raise AssertionError(f"unmapped state_dict key {name}")
    return p


def test_pix_shuffle_matches_reference_golden():
    """FULL-MODEL parity with the reference's actual production model
    (torch goldens from tests/golden_gen/gen_pix_shuffle_model_goldens.py).
    The lightweight wiring is also pinned by predicted-frame parity with
    shipped weights; this adds random-weight coverage (sinlu/biased_prelu
    params away from trained values) and the ONLY reference-executed
    evidence for the heavyweight config (no reference artifact exists)."""
    import json
    import os

    from fs_uae_image_enhancer_project_tpu.models import pix_shuffle as ps

    g = np.load(os.path.join(os.path.dirname(__file__), "goldens",
                             "pix_shuffle_model_goldens.npz"))
    cases = {
        "light": ps.lightweight_config(),
        "heavy": ps.heavyweight_config(),
    }
    for tag, cfg in cases.items():
        manifest = json.loads(bytes(g[f"{tag}_manifest"]).decode())
        p = _pix_shuffle_params_from_manifest(tag, manifest)
        x = jnp.asarray(np.transpose(g[f"{tag}_x"], (0, 2, 3, 1)))
        y = np.asarray(jax.jit(
            lambda p, x: ps.apply(p, x, cfg))(p, x))
        ref = np.transpose(g[f"{tag}_y"], (0, 2, 3, 1))
        # measured max abs err: light 3.6e-7, heavy 7.8e-7
        np.testing.assert_allclose(np.asarray(y), ref, atol=2e-5,
                                   rtol=2e-5, err_msg=f"case {tag}")
