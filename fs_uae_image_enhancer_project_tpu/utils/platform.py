"""Make the JAX_PLATFORMS environment variable actually binding.

This environment's sitecustomize registers the remote-TPU ("axon") PJRT
plugin at interpreter start, and that registration overrides the
JAX_PLATFORMS environment variable: a process launched with
``JAX_PLATFORMS=cpu`` still selects the TPU backend (measured 2026-08-17;
``jax.config.update("jax_platforms", ...)`` before first backend use is the
only binding control). Every CLI entry point calls
:func:`honor_jax_platforms_env` first so a user's (or a test harness's)
platform request is respected regardless of plugin registration order.

Must run BEFORE anything touches a jax backend (jax cannot re-select a
platform after first use — see CLAUDE.md on the dryrun subprocess rule).
"""
from __future__ import annotations

import os


def honor_jax_platforms_env() -> None:
    """Apply JAX_PLATFORMS from the environment via jax.config.

    No-op when the variable is unset (the platform stays whatever the
    installed plugins make the default) or when a backend already exists
    and matches. Safe to call multiple times.
    """
    want = os.environ.get("JAX_PLATFORMS")
    if not want:
        return
    import jax

    jax.config.update("jax_platforms", want)
    # config.update does NOT raise when a backend is already initialized —
    # it silently leaves the process on the old platform (measured
    # 2026-08-18 in this jax). Verify positively, but only when a backend
    # already exists (probing default_backend() ourselves would force the
    # initialization this function exists to get ahead of). The guard keeps
    # a JAX_PLATFORMS=cpu child from silently running on the TPU — the
    # exact two-process chip pollution CLAUDE.md forbids.
    try:
        from jax._src import xla_bridge as _xb

        initialized = bool(getattr(_xb, "_backends", None))
    except Exception:
        initialized = False  # internals moved; lose the check, not the run
    if initialized:
        current = jax.default_backend()
        if want != current and current not in want.split(","):
            raise RuntimeError(
                f"JAX_PLATFORMS={want!r} requested but the {current!r} "
                "backend is already initialized in this process; platform "
                "selection cannot change after first backend use. Call "
                "honor_jax_platforms_env() before anything touches jax "
                "(see utils/platform.py docstring)."
            )


BENCH_LOCKFILE = "/tmp/tpu_bench.lock"


def wait_for_bench_lock(
    lockfile: str = BENCH_LOCKFILE, timeout_s: float = 2400.0,
    poll_s: float = 5.0,
) -> None:
    """Block while a bench run holds the chip (one chip, one process).

    bench.py preempts a registered background trainer (SIGTERM; CSV resume
    is lossless) and writes its own pid here while it owns the chip. A
    supervising restart loop (recipes/train_heavy_staged.sh) would
    otherwise relaunch the trainer immediately and collide with the
    still-running bench — the exact two-TPU-process pollution CLAUDE.md
    forbids. A lockfile naming a dead pid is stale (bench crashed) and is
    ignored.
    """
    import time as _time

    deadline = _time.monotonic() + timeout_s
    while _time.monotonic() < deadline:
        try:
            with open(lockfile) as f:
                pid = int(f.read().strip())
            # a zombie (exited, unreaped by a still-living parent) holds no
            # chip: os.kill(pid, 0) would treat it as alive forever
            with open(f"/proc/{pid}/stat") as f:
                if f.read().split()[2] == "Z":
                    return
        except (OSError, ValueError):
            return  # no lock, unreadable, or dead pid -> stale
        _time.sleep(poll_s)
    raise TimeoutError(
        f"bench lock {lockfile} still held after {timeout_s:.0f}s"
    )


def register_preemptible_pid(pidfile: str = "/tmp/tps3.pid") -> None:
    """Register this process as a preemptible background chip user.

    bench.py's _preempt_background_training kills the pid in this file —
    strictly pid-file + cmdline-allowlist, never by pattern — before taking
    the chip (one chip, one process; CLAUDE.md). Only call this from
    scripts that are safe to kill and resume: CSV-resumable trainers,
    SQLite-resumable NAS studies. The cmdline allowlist lives in bench.py;
    registering a script here without adding it there is a no-op.

    First WAITS for any live bench run to release the chip: preempted
    trainers come back via supervising restart loops, and restarting into
    a running bench would put two processes on the one chip.
    """
    import os as _os

    wait_for_bench_lock()
    try:
        with open(pidfile, "w") as f:
            f.write(str(_os.getpid()))
    except OSError:
        pass
