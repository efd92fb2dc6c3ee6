"""Test configuration: force a virtual 8-device CPU mesh.

Tests run on CPU so they are hermetic and fast, and so multi-chip sharding
logic (parallel/) is exercised on a virtual 8-device mesh exactly as the
driver's dryrun does. Must set env BEFORE jax initializes a backend.
"""
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"  # force: the env presets a TPU platform
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# Make the repo root importable regardless of how pytest is invoked.
_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

import jax  # noqa: E402

jax.config.update("jax_enable_x64", False)

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def devices8():
    devs = jax.devices()
    assert len(devs) >= 8, f"expected 8 virtual CPU devices, got {len(devs)}"
    return devs[:8]
