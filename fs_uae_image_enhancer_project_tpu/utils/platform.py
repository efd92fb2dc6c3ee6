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


def register_preemptible_pid(pidfile: str = "/tmp/tps3.pid") -> None:
    """Register this process as a preemptible background chip user.

    bench.py's _preempt_background_training kills the pid in this file —
    strictly pid-file + cmdline-allowlist, never by pattern — before taking
    the chip (one chip, one process; CLAUDE.md). Only call this from
    scripts that are safe to kill and resume: CSV-resumable trainers,
    SQLite-resumable NAS studies. The cmdline allowlist lives in bench.py;
    registering a script here without adding it there is a no-op.
    """
    import os as _os

    try:
        with open(pidfile, "w") as f:
            f.write(str(_os.getpid()))
    except OSError:
        pass
