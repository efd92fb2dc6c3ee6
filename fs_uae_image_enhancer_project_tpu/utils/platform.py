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

    try:
        jax.config.update("jax_platforms", want)
    except RuntimeError:
        # Backend already initialized; nothing can change it now. If it
        # already matches the request this is fine; otherwise surface it.
        current = jax.default_backend()
        if want != current and current not in want.split(","):
            raise
