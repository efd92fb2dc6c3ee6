"""Double-buffered frame streaming for emulator integration.

The reference documents GPU->CPU readback as the deployment's major
bottleneck (reference README.md:22-24). The TPU-native answer is a pipelined
stream: jax dispatch is asynchronous, so with a pipeline depth of D the
host->HBM upload of frame t, the compute of frame t-1 and the HBM->host
readback of frame t-D all overlap. The emulator trades D frames of latency
(one frame at depth 1) for full-rate throughput.

Usage (per emulator frame):
    stream = FrameStream(enhance_fn, depth=2)
    out = stream.submit(frame)   # returns an enhanced frame from D frames ago
                                 # (None for the first D calls)
    ...
    for out in stream.drain():   # flush the tail on shutdown
        ...
"""
from __future__ import annotations

import collections
import time
from typing import Callable, Iterator, Optional

import numpy as np

import jax
import jax.numpy as jnp


class FrameStream:
    def __init__(self, enhance_fn: Callable, depth: int = 2):
        if depth < 1:
            raise ValueError("depth must be >= 1")
        self.fn = enhance_fn
        self.depth = depth
        self._inflight: collections.deque = collections.deque()

    def submit(self, frame: np.ndarray) -> Optional[np.ndarray]:
        """Enqueue one uint8 RGBA frame; returns the oldest completed result
        once the pipeline is full (None during warmup)."""
        if frame.ndim == 3:
            frame = frame[None]
        x = jnp.asarray(frame)  # async host->device
        y = self.fn(x)  # async dispatch
        self._inflight.append(y)
        if len(self._inflight) > self.depth:
            return np.asarray(self._inflight.popleft())  # async readback sync
        return None

    def drain(self) -> Iterator[np.ndarray]:
        while self._inflight:
            yield np.asarray(self._inflight.popleft())

    def __len__(self) -> int:
        return len(self._inflight)


def measure_stream_throughput(
    enhance_fn: Callable,
    *,
    depth: int = 2,
    n_frames: int = 300,
    frame_shape=(576, 752, 4),
    seed: int = 0,
) -> dict:
    """Sustained end-to-end throughput INCLUDING host transfers both ways —
    the deployment-realistic number (unlike bench.py's on-device chain)."""
    rng = np.random.default_rng(seed)
    frames = [
        rng.integers(0, 256, frame_shape, dtype=np.uint8) for _ in range(8)
    ]
    stream = FrameStream(enhance_fn, depth=depth)
    # warmup
    for i in range(depth + 2):
        stream.submit(frames[i % len(frames)])
    list(stream.drain())

    stream = FrameStream(enhance_fn, depth=depth)
    got = 0
    t0 = time.perf_counter()
    for i in range(n_frames):
        if stream.submit(frames[i % len(frames)]) is not None:
            got += 1
    for _ in stream.drain():
        got += 1
    dt = time.perf_counter() - t0
    return {
        "fps_end_to_end": got / dt,
        "ms_per_frame": dt / got * 1e3,
        "depth": depth,
        "frames": got,
    }
