"""Persistent XLA compilation cache.

The deployed enhance artifact is an emulator sidecar: paying an XLA compile
before frame 1 is a deployment defect. JAX's persistent compilation cache
stores the compiled executable keyed on (HLO, compile options, backend
version); a warm process deserializes instead of compiling — measured
7.9 s -> 0.1 s for the enhance program (round 3 phase split). Seed at
deploy time with scripts/precompile.py. NOTE: on this environment's tunnel
the *first execution* of a program costs an additional, highly variable
8.6-517.8 s regardless of cache state — see docs/DEPLOYMENT.md "Cold
start" for the full phase table; that term is a tunnel artifact, not XLA.

The reference has no counterpart (ONNX Runtime sessions build in ~ms from
the pre-compiled .onnx graph; README.md:26-27) — this closes the gap from
the JAX side.
"""
from __future__ import annotations

import os

_DEFAULT_DIR = os.path.expanduser("~/.cache/fs_uae_image_enhancer_project_tpu/xla")

_enabled: str | None = None


def enable_persistent_cache(cache_dir: str | None = None) -> str:
    """Enable JAX's persistent compilation cache (idempotent).

    Must be called before the first compilation to benefit it; safe to call
    any time. Directory resolution: explicit arg > $FS_UAE_TPU_COMPILE_CACHE
    > ~/.cache/fs_uae_image_enhancer_project_tpu/xla.
    """
    global _enabled
    if cache_dir is None:
        cache_dir = os.environ.get("FS_UAE_TPU_COMPILE_CACHE", _DEFAULT_DIR)
    if _enabled == cache_dir:
        return cache_dir
    os.makedirs(cache_dir, exist_ok=True)

    import jax

    jax.config.update("jax_compilation_cache_dir", cache_dir)
    # Cache everything: the enhance artifact is one program; there is no
    # value in skipping "cheap" entries.
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    _enabled = cache_dir
    return cache_dir
