"""Fused Pallas conv-stack kernel vs the reference model forward.

Interpret mode on CPU; the compiled kernel is exercised and benchmarked on
real TPU hardware (docs/PERF.md). The fused path carries fp32 through each
layer in VMEM, so it is strictly MORE accurate than the bf16 XLA path —
asserted against the fp32 forward.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fs_uae_image_enhancer_project_tpu.models import get_model
from fs_uae_image_enhancer_project_tpu.ops.pallas.fused_stack import (
    STRIP,
    fused_stack_apply,
    supports_config,
)

M = get_model("pix_shuffle")
PARAMS = M.init(jax.random.key(0))


def test_supports_config():
    assert supports_config(M.config)
    assert not supports_config(get_model("pix_shuffle", "heavyweight").config)


def test_fused_matches_fp32_forward():
    x = jnp.asarray(
        np.random.default_rng(0).uniform(0, 1, (1, 2 * STRIP * 2, 96, 3)).astype(np.float32)
    )
    truth = np.asarray(M.apply(PARAMS, x))
    fused = np.asarray(fused_stack_apply(PARAMS, x, interpret=True).astype(jnp.float32))
    err = np.abs(fused - truth)
    assert err.max() < 2e-3, err.max()
    # tighter than the bf16 XLA path on the same input
    bf16 = np.asarray(M.apply(PARAMS, x.astype(jnp.bfloat16)).astype(jnp.float32))
    assert err.mean() <= np.abs(bf16 - truth).mean()


def test_fused_strip_boundaries_and_edges_clean():
    x = jnp.asarray(
        np.random.default_rng(1).uniform(0, 1, (1, 4 * STRIP, 64, 3)).astype(np.float32)
    )
    truth = np.asarray(M.apply(PARAMS, x))
    fused = np.asarray(fused_stack_apply(PARAMS, x, interpret=True).astype(jnp.float32))
    per_row = np.abs(fused - truth)[0].max(axis=(1, 2))
    # no error spike at strip seams (full-res rows 2*STRIP*k) or image edges
    assert per_row.max() < 2e-3


def test_fused_three_strips_steady_state_carry():
    """grid=3 exercises the steady->steady inter-strip carry (strips 0->1
    use the primed carries; 1->2 uses carries saved by a steady step)."""
    x = jnp.asarray(
        np.random.default_rng(2).uniform(0, 1, (1, 6 * STRIP, 48, 3)).astype(np.float32)
    )
    truth = np.asarray(M.apply(PARAMS, x))
    fused = np.asarray(fused_stack_apply(PARAMS, x, interpret=True).astype(jnp.float32))
    per_row = np.abs(fused - truth)[0].max(axis=(1, 2))
    assert per_row.max() < 2e-3


def test_prep_cache_sees_in_place_param_updates():
    """Regression: the prepared-weight cache keys on LEAF array ids, so
    mutating the params dict in place (same dict id, new leaves — the
    eval-several-checkpoints pattern) must NOT serve stale flattened
    weights."""
    x = jnp.asarray(
        np.random.default_rng(1).uniform(0, 1, (1, 2 * STRIP, 64, 3))
        .astype(np.float32)
    )
    params = jax.tree_util.tree_map(jnp.asarray, PARAMS)
    first = np.asarray(fused_stack_apply(params, x, interpret=True)
                       .astype(jnp.float32))
    # in-place leaf swap: zero one conv's weights; the dict id is unchanged
    params["conv7"] = {k: jnp.zeros_like(v)
                       for k, v in params["conv7"].items()}
    mutated = np.asarray(fused_stack_apply(params, x, interpret=True)
                         .astype(jnp.float32))
    truth = np.asarray(M.apply(params, x))
    assert not np.allclose(mutated, first)  # stale cache would reproduce it
    assert np.abs(mutated - truth).max() < 2e-3


def test_fused_shape_validation():
    with pytest.raises(ValueError):
        fused_stack_apply(
            PARAMS, jnp.zeros((1, 2 * STRIP + 2, 64, 3)), interpret=True,
            fallback=False,
        )
    with pytest.raises(ValueError):
        fused_stack_apply(
            PARAMS, jnp.zeros((2, 2 * STRIP, 64, 3)), interpret=True,
            fallback=False,
        )


def test_dispatch_fallback_on_unsupported_shape():
    """Shapes the kernel can't take (batch>1, H/2 not a STRIP multiple)
    dispatch to the XLA forward instead of raising."""
    import dataclasses

    from fs_uae_image_enhancer_project_tpu.models import pix_shuffle as ps
    from fs_uae_image_enhancer_project_tpu.ops.pallas.fused_stack import (
        fused_stack_apply,
        supports_config,
        supports_shape,
    )

    cfg = ps.lightweight_config()
    params = ps.init(jax.random.key(0), cfg)
    rng = np.random.default_rng(0)
    # 16 rows: h/2=8 is not a STRIP multiple -> fallback path
    x = jnp.asarray(rng.uniform(0, 1, (2, 16, 16, 3)).astype(np.float32))
    assert not supports_shape(x.shape)
    got = fused_stack_apply(params, x)
    want = ps.apply(params, x, cfg)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)
    with pytest.raises(ValueError):
        fused_stack_apply(params, x, fallback=False)


def test_supports_config_rejects_different_activations():
    """Same channel plan, different activation chain: must NOT dispatch to
    the kernel (it hard-codes the lightweight activation chain)."""
    import dataclasses

    from fs_uae_image_enhancer_project_tpu.models import pix_shuffle as ps
    from fs_uae_image_enhancer_project_tpu.models.configs import act
    from fs_uae_image_enhancer_project_tpu.ops.pallas.fused_stack import (
        supports_config,
    )

    cfg = ps.lightweight_config()
    assert supports_config(cfg)
    l0 = cfg.layers[0]
    mutated = dataclasses.replace(
        cfg,
        layers=(dataclasses.replace(l0, acts=(act("relu"), act("relu"))),)
        + cfg.layers[1:],
    )
    assert not supports_config(mutated)


@pytest.mark.parametrize("hw", [(2 * STRIP, 32), (4 * STRIP, 44), (6 * STRIP, 32)])
def test_packed_matches_fp32_forward(hw):
    """The width-packed kernel (1/2/3 strips incl. steady->steady carries)
    matches the fp32 forward within bf16-buffer tolerance."""
    from fs_uae_image_enhancer_project_tpu.ops.pallas.fused_stack_packed import (
        fused_stack_packed_apply,
    )

    h, w = hw
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.uniform(0, 1, (1, h, w, 3)).astype(np.float32))
    got = np.asarray(fused_stack_packed_apply(PARAMS, x, interpret=True))
    want = np.asarray(M.apply(PARAMS, x))
    assert np.abs(got - want).max() < 2e-3


def test_packed_fallback_dispatch():
    from fs_uae_image_enhancer_project_tpu.ops.pallas.fused_stack_packed import (
        fused_stack_packed_apply,
    )

    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.uniform(0, 1, (2, 16, 16, 3)).astype(np.float32))
    got = fused_stack_packed_apply(PARAMS, x)  # unsupported shape -> XLA
    want = M.apply(PARAMS, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)
    with pytest.raises(ValueError):
        fused_stack_packed_apply(PARAMS, x, fallback=False)
