"""Timing harness tests (CPU; methodology, not absolute numbers)."""
import jax
import jax.numpy as jnp
import numpy as np

from fs_uae_image_enhancer_project_tpu.utils.profiler import (
    measure_chained,
    measure_roundtrip,
)


def test_measure_chained_counts_and_percentiles():
    f = jax.jit(lambda x: x * 1.0001)
    x = jnp.ones((64, 64))
    res = measure_chained(f, x, warmup=2, duration_s=60.0, chunk=5, max_iters=20)
    assert res.iterations == 20
    assert res.fps > 0 and res.ms_per_call > 0
    assert res.p50_ms <= res.p99_ms
    assert res.compile_s >= 0


def test_measure_roundtrip_counts():
    f = jax.jit(lambda x: x + 1)
    x = jnp.ones((8, 8))
    res = measure_roundtrip(f, x, warmup=1, duration_s=60.0, max_iters=7)
    assert res.iterations == 7
    assert np.isfinite(res.p90_ms)
