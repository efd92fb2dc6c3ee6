"""The JAX_PLATFORMS env var must be binding for subprocesses.

This environment's TPU PJRT plugin registration overrides JAX_PLATFORMS
entirely (a child launched with JAX_PLATFORMS=cpu still selects the TPU —
measured 2026-08-17, CLAUDE.md), so utils/platform.honor_jax_platforms_env
applies the env var through jax.config before first backend use. Every CLI
main calls it; this pins the behavior so a plugin/jax upgrade that changes
the override semantics is caught.
"""
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = """
from fs_uae_image_enhancer_project_tpu.utils.platform import (
    honor_jax_platforms_env,
)

honor_jax_platforms_env()
import jax

print("backend=" + jax.default_backend())
"""


def test_guard_makes_cpu_request_binding():
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    prev = env.get("PYTHONPATH", "")
    env["PYTHONPATH"] = REPO + (os.pathsep + prev if prev else "")
    r = subprocess.run(
        [sys.executable, "-c", CHILD], env=env, cwd=REPO,
        capture_output=True, text=True, timeout=300,
    )
    assert r.returncode == 0, r.stderr
    assert "backend=cpu" in r.stdout


def test_guard_noop_without_env():
    """Unset JAX_PLATFORMS: the guard must not import jax or force a
    platform (the default selection — TPU where present — stays)."""
    import fs_uae_image_enhancer_project_tpu.utils.platform as plat

    env_backup = os.environ.pop("JAX_PLATFORMS", None)
    try:
        plat.honor_jax_platforms_env()  # must not raise
    finally:
        if env_backup is not None:
            os.environ["JAX_PLATFORMS"] = env_backup
