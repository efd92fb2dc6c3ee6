#!/usr/bin/env python3
"""Decide the fused-stack lane-packing question with a direct measurement.

The fused-stack kernel is MXU-lane-bound: its im2col matmuls have
N = cout in {12, 36, 72} of 128 lanes (docs/PERF.md). Width-packing P output
pixels per matmul row lifts N to P*cout at the cost of (P+2)/(3P)-inflated K
(block-structured weights with zeros). Whether that trades profitably is a
property of the MXU alone, so measure it on in-VMEM Pallas matmuls with the
exact shapes the kernel would use, before committing to a kernel rewrite:

  per layer class, BASELINE (m, 9cin)x(9cin, cout)
             vs    PACKED-2 (m/2, 12cin)x(12cin, 2cout)
             vs    PACKED-3 (m/3, 18cin)x(18cin, 3cout)

Same useful output per variant; packed variants do 1.33x / 2.0x the MACs.
A packed variant wins only if its wall time is LOWER despite the extra MACs.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# m = STRIP(24) * wp(384): one fused-stack strip's matmul rows
M_FULL = 24 * 384
REPS = 8  # matmuls per grid step (amortize grid/store overhead)


def _mm_kernel(a_ref, w_ref, o_ref, acc_ref):
    a = a_ref[...]
    acc = acc_ref[...]
    for _ in range(REPS):
        acc = jax.lax.dot_general(
            a.astype(jnp.bfloat16), w_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * 1e-4 + acc * 0.5  # keep a data dependency so nothing folds away
    acc_ref[...] = acc
    # output has the INPUT's shape so measure_chained can feed it back;
    # the lane-sum keeps the dependency on every matmul
    s = jnp.sum(acc, axis=1, keepdims=True)
    o_ref[...] = (a.astype(jnp.float32) * 0.999 + 1e-7 * s).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("grid",))
def _run(a, w, grid):
    m, k = a.shape
    n = w.shape[1]
    return pl.pallas_call(
        _mm_kernel,
        out_shape=jax.ShapeDtypeStruct((m, k), jnp.float32),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((m, k), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((k, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((m, k), lambda i: (0, 0), memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((m, n), jnp.float32)],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 2**20),
    )(a, w)


def main() -> int:
    from fs_uae_image_enhancer_project_tpu.utils.compile_cache import (
        enable_persistent_cache,
    )
    from fs_uae_image_enhancer_project_tpu.utils.platform import (
        honor_jax_platforms_env,
    )
    from fs_uae_image_enhancer_project_tpu.utils.profiler import measure_chained

    honor_jax_platforms_env()  # CLI convention: JAX_PLATFORMS binds
    enable_persistent_cache()  # Mosaic kernel compiles are 10-20 min; cache

    rng = np.random.default_rng(0)
    grid = 64
    cases = []
    for cin, cout, label in [(36, 36, "l2/l6-class"), (72, 72, "l4-class"),
                             (36, 12, "l7-class"), (72, 36, "l5-class")]:
        cases.append((label, "baseline", M_FULL, 9 * cin, cout))
        cases.append((label, "packed-2", M_FULL // 2, 12 * cin, 2 * cout))
        cases.append((label, "packed-3", M_FULL // 3, 18 * cin, 3 * cout))

    print(f"m_full={M_FULL} reps={REPS} grid={grid}; useful MACs equal per class")
    for label, variant, m, k, n in cases:
        a = jnp.asarray(rng.normal(0, 1, (m, k)).astype(np.float32))
        w = jnp.asarray(rng.normal(0, 0.05, (k, n)).astype(np.float32)).astype(jnp.bfloat16)
        fn = lambda t, w=w: _run(t, w, grid)
        # chunk=100 keeps the tunnel RTT/chunk adder well under the
        # ms-scale per-call signal (docs/PERF.md "RTT adder")
        res = measure_chained(fn, a, warmup=3, duration_s=4.0, chunk=100)
        macs = m * k * n * REPS * grid
        tflops = 2 * macs / (res.ms_per_call * 1e-3) / 1e12
        print(
            f"{label:11s} {variant:9s} ({m:5d},{k:4d})x({k:4d},{n:3d}): "
            f"{res.ms_per_call:7.3f} ms/call  {tflops:5.2f} TFLOPS(raw)",
            flush=True,
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
