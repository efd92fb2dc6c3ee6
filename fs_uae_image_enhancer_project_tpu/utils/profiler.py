"""The single FPS/latency harness.

Replaces the reference's six copy-pasted benchmark loops (20 warmups + 20 s
sustained at batch 1, 576x752 — model_pix_shuffle.py:348-368,
optuna_study_opt_act.py:42-108, ...) with one measurement utility.

Methodology: **chained dependent calls + periodic host fetch**
(:func:`measure_chained`). Each iteration consumes the previous iteration's
output, and a host fetch closes every chunk — the only timing this
environment's remote-TPU tunnel cannot fool (its ``block_until_ready``
returns early; naive per-call timing reported an 8192^3 matmul at
"37 PFLOPS"). :func:`measure_roundtrip` times full host->device->host trips
per call (deployment-readback realism) by fetching every result.
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
    ms_per_call: float
    iterations: int
    duration_s: float
    compile_s: float
    # per-chunk latency percentiles (chunked-chain timing); per-call for
    # measure_roundtrip
    p50_ms: float = 0.0
    p90_ms: float = 0.0
    p99_ms: float = 0.0

    def to_dict(self) -> dict:
        return dataclasses.asdict(self)


def _fetch_probe(x) -> None:
    """Force completion by fetching ONE element of every output leaf.

    The slice happens on DEVICE (``leaf.ravel()[:1]`` dispatches a tiny
    program) so the host transfer is 1 element, not the whole array —
    ``np.asarray(leaf)`` would pay the full output payload through the
    tunnel once per chunk, inflating every reported latency by
    transfer_time/chunk. Still honest: the fetched element's value
    depends on the completed final program, which depends on the whole
    chain, so the wall-clock includes all chained executions.
    """
    for leaf in jax.tree.leaves(x):
        if hasattr(leaf, "ravel"):
            np.asarray(leaf.ravel()[:1])
        else:
            np.asarray(leaf)


def _fetch_all(x) -> None:
    """Force completion by pulling EVERY output leaf in full — the
    deployment host-readback pattern (measure_roundtrip only)."""
    for leaf in jax.tree.leaves(x):
        np.asarray(leaf)


def measure_chained(
    fn: Callable,
    x,
    *,
    warmup: int = 20,
    duration_s: float = 20.0,
    chunk=20,
    max_iters: Optional[int] = None,
) -> BenchResult:
    """Sustained on-device throughput of ``fn`` whose output feeds its input
    (same shape/dtype). total_time / N is true per-call latency; chunked
    fetches bound the async pipeline without paying a round trip per call.
    ``chunk="auto"`` sizes chunks from a differenced latency probe (the
    probe RTT cancels) targeting ~2 s of device time per chunk."""
    # The chain never resets to ``x``: ``fn`` may donate its argument (the
    # deployed enhance fn aliases frame buffers), which deletes ``x`` after
    # the first call. Feeding each output forward is donation-safe and the
    # same steady-state measurement.
    t0 = time.perf_counter()
    acc = fn(x)
    _fetch_probe(acc)
    compile_s = time.perf_counter() - t0

    for _ in range(max(warmup - 1, 0)):
        acc = fn(acc)
    _fetch_probe(acc)

    if chunk == "auto":
        # Size chunks from a differenced latency probe: two probe chunks of
        # 5 and 25 calls each pay one probe-fetch RTT, so the RTT cancels
        # in (t25 - t5)/20. Target ~2 s of device time per chunk so the
        # per-chunk RTT adder (150-350 ms through the tunnel) stays under
        # ~2% of the signal (CLAUDE.md timing rule) even for sub-ms fns.
        t1 = time.perf_counter()
        for _ in range(5):
            acc = fn(acc)
        _fetch_probe(acc)
        t5 = time.perf_counter() - t1
        t1 = time.perf_counter()
        for _ in range(25):
            acc = fn(acc)
        _fetch_probe(acc)
        t25 = time.perf_counter() - t1
        est = max((t25 - t5) / 20.0, 1e-6)
        chunk = int(min(max(round(2.0 / est), 10), 5000))

    lat = []
    iters = 0
    start = time.perf_counter()
    deadline = start + duration_s
    while True:
        t1 = time.perf_counter()
        for _ in range(chunk):
            acc = fn(acc)
        _fetch_probe(acc)
        t2 = time.perf_counter()
        lat.append((t2 - t1) / chunk)
        iters += chunk
        if t2 >= deadline or (max_iters is not None and iters >= max_iters):
            break
    total = time.perf_counter() - start
    lat_ms = np.array(lat) * 1e3
    return BenchResult(
        fps=iters / total,
        ms_per_call=total / iters * 1e3,
        iterations=iters,
        duration_s=total,
        compile_s=compile_s,
        p50_ms=float(np.percentile(lat_ms, 50)),
        p90_ms=float(np.percentile(lat_ms, 90)),
        p99_ms=float(np.percentile(lat_ms, 99)),
    )


def measure_roundtrip(
    fn: Callable,
    *args,
    warmup: int = 5,
    duration_s: float = 10.0,
    max_iters: Optional[int] = None,
) -> BenchResult:
    """Per-call latency INCLUDING a host fetch of every result — the
    deployment host->device->host pattern. Honest through the tunnel (the
    fetch forces completion) but dominated by link RTT on remote setups."""
    t0 = time.perf_counter()
    _fetch_all(fn(*args))
    compile_s = time.perf_counter() - t0
    for _ in range(max(warmup - 1, 0)):
        _fetch_all(fn(*args))
    lat = []
    iters = 0
    start = time.perf_counter()
    deadline = start + duration_s
    while True:
        t1 = time.perf_counter()
        _fetch_all(fn(*args))
        t2 = time.perf_counter()
        lat.append(t2 - t1)
        iters += 1
        if t2 >= deadline or (max_iters is not None and iters >= max_iters):
            break
    total = time.perf_counter() - start
    lat_ms = np.array(lat) * 1e3
    return BenchResult(
        fps=iters / total,
        ms_per_call=total / iters * 1e3,
        iterations=iters,
        duration_s=total,
        compile_s=compile_s,
        p50_ms=float(np.percentile(lat_ms, 50)),
        p90_ms=float(np.percentile(lat_ms, 90)),
        p99_ms=float(np.percentile(lat_ms, 99)),
    )
