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


def test_fused_shape_validation():
    with pytest.raises(ValueError):
        fused_stack_apply(
            PARAMS, jnp.zeros((1, 2 * STRIP + 2, 64, 3)), interpret=True
        )
    with pytest.raises(ValueError):
        fused_stack_apply(
            PARAMS, jnp.zeros((2, 2 * STRIP, 64, 3)), interpret=True
        )
