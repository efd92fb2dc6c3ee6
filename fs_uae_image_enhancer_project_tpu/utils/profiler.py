"""The single FPS/latency harness.

Replaces the reference's six copy-pasted benchmark loops (20 warmups + 20 s
sustained at batch 1, 576x752 — model_pix_shuffle.py:348-368,
optuna_study_opt_act.py:42-108, ...) with one reusable measurement utility
that reports sustained FPS and latency percentiles, with proper device
synchronisation (block_until_ready is the TPU analogue of
torch.cuda.synchronize).
"""
from __future__ import annotations

import contextlib
import dataclasses
import time
from typing import Callable, Optional

import jax
import numpy as np


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/jax-trace"):
    """jax.profiler trace context — the TPU counterpart of the reference's
    TensorBoard/cuda.Event instrumentation (SURVEY §5 Tracing). View with
    xprof/tensorboard-profile on a machine that has them."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


@dataclasses.dataclass
class BenchResult:
    fps: float
    p50_ms: float
    p90_ms: float
    p99_ms: float
    mean_ms: float
    iterations: int
    duration_s: float
    compile_s: float

    def to_dict(self) -> dict:
        return dataclasses.asdict(self)


def measure(
    fn: Callable,
    *args,
    warmup: int = 20,
    duration_s: float = 20.0,
    max_iters: Optional[int] = None,
) -> BenchResult:
    """Reference FPS protocol: ``warmup`` untimed calls, then sustained calls
    for ``duration_s`` seconds (or ``max_iters``), per-call latency recorded.

    ``fn(*args)`` must return jax arrays (blocked on for timing).
    """
    t0 = time.perf_counter()
    out = fn(*args)
    jax.block_until_ready(out)
    compile_s = time.perf_counter() - t0

    for _ in range(max(warmup - 1, 0)):
        jax.block_until_ready(fn(*args))

    lat = []
    iters = 0
    start = time.perf_counter()
    deadline = start + duration_s
    while True:
        t1 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        t2 = time.perf_counter()
        lat.append(t2 - t1)
        iters += 1
        if t2 >= deadline or (max_iters is not None and iters >= max_iters):
            break
    total = time.perf_counter() - start
    lat_ms = np.array(lat) * 1e3
    return BenchResult(
        fps=iters / total,
        p50_ms=float(np.percentile(lat_ms, 50)),
        p90_ms=float(np.percentile(lat_ms, 90)),
        p99_ms=float(np.percentile(lat_ms, 99)),
        mean_ms=float(lat_ms.mean()),
        iterations=iters,
        duration_s=total,
        compile_s=compile_s,
    )


def measure_donated(
    make_fn_and_args: Callable[[], tuple],
    warmup: int = 20,
    duration_s: float = 20.0,
    max_iters: Optional[int] = None,
) -> BenchResult:
    """Like :func:`measure` for functions with donated input buffers: the
    caller provides a factory returning (fn, fresh_args) and we re-create the
    donated argument each call (matching the deployment pattern where every
    frame is a fresh host upload)."""
    fn, args = make_fn_and_args()
    t0 = time.perf_counter()
    jax.block_until_ready(fn(*args))
    compile_s = time.perf_counter() - t0
    for _ in range(max(warmup - 1, 0)):
        fn_, args_ = make_fn_and_args()
        jax.block_until_ready(fn_(*args_))
    lat = []
    iters = 0
    start = time.perf_counter()
    deadline = start + duration_s
    while True:
        fn_, args_ = make_fn_and_args()
        t1 = time.perf_counter()
        jax.block_until_ready(fn_(*args_))
        t2 = time.perf_counter()
        lat.append(t2 - t1)
        iters += 1
        if t2 >= deadline or (max_iters is not None and iters >= max_iters):
            break
    total = time.perf_counter() - start
    lat_ms = np.array(lat) * 1e3
    return BenchResult(
        fps=iters / total,
        p50_ms=float(np.percentile(lat_ms, 50)),
        p90_ms=float(np.percentile(lat_ms, 90)),
        p99_ms=float(np.percentile(lat_ms, 99)),
        mean_ms=float(lat_ms.mean()),
        iterations=iters,
        duration_s=total,
        compile_s=compile_s,
    )
