"""Test configuration: force a virtual 8-device CPU mesh.

Tests run on CPU so they are hermetic and fast, and so multi-chip sharding
logic (parallel/) is exercised on a virtual 8-device mesh exactly as the
driver's dryrun does.

NOTE: this environment's sitecustomize imports jax at interpreter startup to
register the remote-TPU ("axon") PJRT plugin, so mutating JAX_PLATFORMS here
is too late — use jax.config.update instead (backends are still lazy at
conftest-import time).
"""
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"  # for any subprocesses we spawn

# Make the repo root importable regardless of how pytest is invoked.
_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_enable_x64", False)

import pytest  # noqa: E402


def psnr(a, b) -> float:
    """Shared PSNR helper (peak 255, mse==0 -> 99 dB sentinel)."""
    import numpy as np

    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    return 99.0 if mse == 0 else 10 * np.log10(255.0**2 / mse)


@pytest.fixture(scope="session")
def devices8():
    devs = jax.devices()
    assert len(devs) >= 8, f"expected 8 virtual CPU devices, got {devs}"
    return devs[:8]
