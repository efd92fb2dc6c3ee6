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


def test_wait_for_bench_lock(tmp_path):
    """The bench lock blocks preemptible trainers while the bench pid is
    alive, ignores stale locks (dead pid), and times out loudly."""
    import subprocess
    import sys as _sys
    import time

    import pytest

    import fs_uae_image_enhancer_project_tpu.utils.platform as plat

    lock = str(tmp_path / "bench.lock")

    # no lockfile: returns immediately
    plat.wait_for_bench_lock(lockfile=lock, timeout_s=1.0, poll_s=0.05)

    # stale lock (dead pid): ignored. Spawn-and-reap a real child so the
    # pid is known-dead rather than guessing an unused number.
    child = subprocess.Popen([_sys.executable, "-c", "pass"])
    child.wait()
    with open(lock, "w") as f:
        f.write(str(child.pid))
    plat.wait_for_bench_lock(lockfile=lock, timeout_s=1.0, poll_s=0.05)

    # live lock: blocks until released, then proceeds
    holder = subprocess.Popen([_sys.executable, "-c", "import time; time.sleep(1.0)"])
    with open(lock, "w") as f:
        f.write(str(holder.pid))
    t0 = time.monotonic()
    plat.wait_for_bench_lock(lockfile=lock, timeout_s=30.0, poll_s=0.05)
    waited = time.monotonic() - t0
    holder.wait()
    assert waited >= 0.5, "should have blocked while the holder lived"

    # never-released live lock: loud timeout, not a silent hang
    holder2 = subprocess.Popen([_sys.executable, "-c", "import time; time.sleep(30)"])
    try:
        with open(lock, "w") as f:
            f.write(str(holder2.pid))
        with pytest.raises(TimeoutError):
            plat.wait_for_bench_lock(lockfile=lock, timeout_s=0.3, poll_s=0.05)
    finally:
        holder2.kill()
        holder2.wait()
