"""Tests for the in-domain VGG16 feature self-training (losses/vgg_selftrain)."""
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fs_uae_image_enhancer_project_tpu.losses import vgg as vgg_mod
from fs_uae_image_enhancer_project_tpu.losses import vgg_selftrain as st


def test_decoder_reconstructs_input_shape():
    enc = vgg_mod._random_init(jax.random.key(0))
    dec = st.init_decoder(jax.random.key(1))
    x = jnp.asarray(np.random.default_rng(0).uniform(0, 1, (2, 32, 32, 3)),
                    jnp.float32)
    recon = st.autoencode(enc, dec, x)
    assert recon.shape == x.shape
    assert recon.dtype == jnp.float32


def test_train_step_reduces_loss():
    import optax

    enc = vgg_mod._random_init(jax.random.key(0))
    dec = st.init_decoder(jax.random.key(1))
    opt = optax.adam(1e-3)
    opt_state = opt.init({"enc": enc, "dec": dec})
    step = jax.jit(st.make_train_step(opt))
    x = jnp.asarray(np.random.default_rng(1).uniform(0, 1, (2, 32, 32, 3)),
                    jnp.float32)
    losses = []
    for _ in range(5):
        opt_state, enc, dec, loss = step(opt_state, enc, dec, x)
        losses.append(float(loss))
    assert losses[-1] < losses[0]


def test_rescale_taps_is_exact():
    """After rescale_taps, each tap's RMS on the probe equals the target
    (positive homogeneity of the conv/relu/pool chain makes it exact)."""
    enc = vgg_mod._random_init(jax.random.key(2))
    probe = np.random.default_rng(2).uniform(0, 1, (2, 32, 32, 3)).astype(
        np.float32)
    target = [1.0, 2.0, 4.0, 8.0]
    scaled = st.rescale_taps(enc, probe, target)
    got = st.measure_tap_rms(scaled, probe)
    np.testing.assert_allclose(got, target, rtol=1e-4)


def test_asset_roundtrip_via_init_vgg16(tmp_path, monkeypatch):
    """save_asset writes the drop-in npz that init_vgg16's self-trained
    fallback tier loads (same keys as the torchvision conversion)."""
    enc = vgg_mod._random_init(jax.random.key(3))
    path = str(tmp_path / "vgg16_features_selftrained.npz")
    st.save_asset(enc, path)
    monkeypatch.setattr(vgg_mod, "_ASSET", str(tmp_path / "missing.npz"))
    monkeypatch.setattr(vgg_mod, "_ASSET_SELFTRAINED", path)
    loaded = vgg_mod.init_vgg16()
    assert len(loaded) == len(enc)
    for a, b in zip(loaded, enc):
        np.testing.assert_allclose(np.asarray(a["w"]), np.asarray(b["w"]),
                                   rtol=1e-6)
