"""Multi-chip sharding tests on the virtual 8-device CPU mesh."""
import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from fs_uae_image_enhancer_project_tpu.models import get_model
from fs_uae_image_enhancer_project_tpu.losses.perceptual import build_criterion
from fs_uae_image_enhancer_project_tpu.parallel import (
    TrainState,
    init_train_state,
    make_mesh,
    make_optimizer,
    make_train_step,
    replicate,
    split_bn_buffers,
    merge_bn_buffers,
)
from fs_uae_image_enhancer_project_tpu.parallel.dryrun import run_dryrun


def test_make_mesh_shapes(devices8):
    mesh = make_mesh(8, sp=2)
    assert mesh.devices.shape == (4, 2)
    assert mesh.axis_names == ("dp", "sp")
    with pytest.raises(ValueError):
        make_mesh(8, sp=3)


def test_split_merge_bn_buffers():
    m = get_model("conv3")
    params = m.init(jax.random.key(0))
    trainable, buffers = split_bn_buffers(params)
    assert "mean" not in trainable["bn1"] and "scale" in trainable["bn1"]
    assert set(buffers["bn1"]) == {"mean", "var"}
    merged = merge_bn_buffers(trainable, buffers)
    assert set(merged["bn1"]) == {"scale", "bias", "mean", "var"}


def test_dryrun_full_train_step_8dev(devices8):
    loss = run_dryrun(8)
    assert np.isfinite(loss)


def test_train_step_loss_decreases(devices8):
    """Few steps of the sharded train step on a fixed batch must reduce loss."""
    mesh = make_mesh(8, sp=2)
    m = get_model("pix_shuffle")
    params = m.init(jax.random.key(0))
    crit = build_criterion(dataclasses.replace(m.loss, vgg_weight=0.0))  # pixel-only
    opt = make_optimizer(lr=3e-4)
    state = init_train_state(params, opt)
    step = jax.jit(make_train_step(m.apply, crit, opt, mesh=mesh))

    rng = np.random.default_rng(0)
    lr_b = jnp.asarray(rng.uniform(0, 1, (1, 4, 16, 16, 3)).astype(np.float32))
    hr_b = jnp.asarray(rng.uniform(0, 1, (1, 4, 16, 16, 3)).astype(np.float32))
    bspec = NamedSharding(mesh, P(None, "dp", "sp"))
    lr_b, hr_b = jax.device_put(lr_b, bspec), jax.device_put(hr_b, bspec)
    state = replicate(mesh, state)

    losses = []
    for _ in range(8):
        state, loss = step(state, lr_b, hr_b)
        losses.append(float(loss))
    assert losses[-1] < losses[0]
    assert int(state.step) == 8


def test_train_step_batchnorm_model(devices8):
    """conv3 (batchnorm) trains with buffer updates through the scan."""
    mesh = make_mesh(8, sp=1)
    m = get_model("conv3")
    params = m.init(jax.random.key(0))
    crit = build_criterion(dataclasses.replace(m.loss, vgg_weight=0.0))
    opt = make_optimizer(lr=1e-3)
    state = init_train_state(params, opt, has_batchnorm=True)
    step = jax.jit(
        make_train_step(m.apply, crit, opt, has_batchnorm=True, mesh=mesh)
    )
    rng = np.random.default_rng(1)
    lr_b = jnp.asarray(rng.uniform(0, 1, (2, 8, 16, 16, 3)).astype(np.float32))
    hr_b = jnp.asarray(rng.uniform(0, 1, (2, 8, 16, 16, 3)).astype(np.float32))
    old_mean = np.asarray(state.buffers["bn1"]["mean"])
    state, loss = step(state, lr_b, hr_b)
    assert np.isfinite(float(loss))
    assert not np.allclose(np.asarray(state.buffers["bn1"]["mean"]), old_mean)


def test_sharded_batch_inference(devices8, tmp_path):
    """dp-sharded offline enhancement over the 8-device mesh."""
    import os
    from PIL import Image
    from fs_uae_image_enhancer_project_tpu.export.enhance import make_enhance_fn
    from fs_uae_image_enhancer_project_tpu.parallel.inference import (
        enhance_directory,
        make_sharded_enhance,
    )

    mesh = make_mesh(8, sp=1)
    m = get_model("pix_shuffle")
    params = m.init(jax.random.key(0))
    enh = make_enhance_fn(m.apply, params, crop_left=0, donate=False, jit=False)
    sharded, shard_batch = make_sharded_enhance(enh, mesh)
    rng = np.random.default_rng(0)
    frames = rng.integers(0, 256, (8, 16, 32, 4), np.uint8)
    out = np.asarray(sharded(shard_batch(frames)))
    assert out.shape == (8, 16, 32, 4) and out.dtype == np.uint8
    # matches unsharded single-frame results
    single = np.asarray(jax.jit(enh)(jnp.asarray(frames[:1])))
    np.testing.assert_array_equal(out[0], single[0])
    with pytest.raises(ValueError):
        shard_batch(frames[:3])  # not divisible by dp

    # directory flow (5 files -> padding path exercised)
    src = tmp_path / "in"
    src.mkdir()
    for i in range(5):
        Image.fromarray(
            rng.integers(0, 256, (16, 32, 4), np.uint8), mode="RGBA"
        ).save(src / f"f{i}.png")
    n = enhance_directory(enh, str(src), str(tmp_path / "out"), mesh=mesh, verbose=0)
    assert n == 5
    assert len(os.listdir(tmp_path / "out")) == 5


def test_spatial_sharding_matches_single_device(devices8):
    """Forward over an H-sharded input must equal the unsharded forward —
    validates XLA's conv halo exchange through the whole model stack."""
    mesh = make_mesh(8, dp=1, sp=8)
    m = get_model("pix_shuffle")
    params = m.init(jax.random.key(0))
    x = jnp.asarray(
        np.random.default_rng(0).uniform(0, 1, (1, 64, 48, 3)).astype(np.float32)
    )
    y_single = np.asarray(jax.jit(m.apply)(params, x))
    bspec = NamedSharding(mesh, P(None, "sp"))
    x_sharded = jax.device_put(x, bspec)
    params_rep = replicate(mesh, params)
    y_sharded = np.asarray(
        jax.jit(m.apply, in_shardings=(NamedSharding(mesh, P()), bspec))(
            params_rep, x_sharded
        )
    )
    np.testing.assert_allclose(y_sharded, y_single, atol=2e-5, rtol=1e-5)


def test_make_mesh_rejects_oversubscription(devices8):
    """Asking for more devices than exist fails with device arithmetic, not
    an opaque numpy reshape error (devs[:n] used to silently truncate)."""
    with pytest.raises(ValueError, match="only"):
        make_mesh(16)


def test_make_sharded_enhance_unwraps_jitted_default(devices8):
    """make_sharded_enhance accepts the library-default enhance fn (jitted
    with a donated arg): the inner jit is unwrapped, so the outer sharded
    jit neither warns about unusable donations nor changes results."""
    import warnings

    from fs_uae_image_enhancer_project_tpu.export.enhance import (
        make_enhance_fn,
    )
    from fs_uae_image_enhancer_project_tpu.parallel.inference import (
        make_sharded_enhance,
    )

    mesh = make_mesh(8, sp=1)
    m = get_model("pix_shuffle")
    params = m.init(jax.random.key(0))
    jitted = make_enhance_fn(m.apply, params, crop_left=0,
                             donate=True, jit=True)
    raw = make_enhance_fn(m.apply, params, crop_left=0,
                          donate=False, jit=False)
    sharded, shard_batch = make_sharded_enhance(jitted, mesh)
    frames = np.random.default_rng(1).integers(
        0, 256, (8, 16, 32, 4), np.uint8)
    with warnings.catch_warnings():
        warnings.simplefilter("error", UserWarning)
        out = np.asarray(sharded(shard_batch(frames)))
    ref = np.asarray(jax.jit(raw)(jnp.asarray(frames)))
    np.testing.assert_array_equal(out, ref)
