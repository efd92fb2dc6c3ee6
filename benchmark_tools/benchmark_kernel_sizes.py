#!/usr/bin/env python3
"""Conv2d latency + analytic GFLOPs grid over kernel sizes and channels.

Counterpart of reference benchmark_tools/benchmark_kernel_sizes.py
(kernel {1,2,3,4,5,7} x channel grid at the deployment shape): informs model
design about which kernel/channel combinations the MXU executes at equal
cost. Chained timing (see bench.py).
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from fs_uae_image_enhancer_project_tpu.ops.conv import conv2d, init_conv

# the reference grid includes even kernels (benchmark_kernel_sizes.py
# kernel {1,2,3,4,5,7}); conv2d uses padding="SAME" so even kernels keep
# the spatial shape (asymmetric pad) and chained timing stays valid
KERNELS = [1, 2, 3, 4, 5, 7]
CHANNELS = [12, 24, 36, 48, 72, 96, 144]


def analytic_gflops(h, w, cin, cout, k):
    return 2.0 * h * w * cin * cout * k * k / 1e9


def time_conv(cin, cout, k, h, w, dtype, duration_s=1.0, chunk=200):
    from fs_uae_image_enhancer_project_tpu.utils.profiler import measure_chained

    params = init_conv(jax.random.key(0), cin, cout, k)
    fwd = jax.jit(lambda x: conv2d(params, x))
    x = jnp.zeros((1, h, w, cin), dtype)
    # chained timing requires cout == cin; otherwise ping-pong two convs
    # (measure_chained warms the full chain, so both compiles stay untimed)
    if cin == cout:
        chain = fwd
    else:
        params_back = init_conv(jax.random.key(1), cout, cin, k)
        back = jax.jit(lambda y: conv2d(params_back, y))
        chain = lambda x: back(fwd(x))  # noqa: E731
    # single convs are sub-millisecond: chunk must push the tunnel's
    # RTT/chunk adder below the signal (chunk=10 reported ~RTT/10 =
    # 15-35 ms/call, >90% noise — docs/PERF.md "RTT adder")
    res = measure_chained(chain, x, warmup=3, duration_s=duration_s,
                          chunk=chunk)
    per_call = res.ms_per_call
    if cin != cout:
        per_call /= 2.0  # chain ran two convs per step
    return per_call


def main() -> int:
    from fs_uae_image_enhancer_project_tpu.utils.platform import (
        honor_jax_platforms_env,
    )

    honor_jax_platforms_env()  # CLI convention: JAX_PLATFORMS binds
    ap = argparse.ArgumentParser()
    ap.add_argument("--shape", type=int, nargs=2, default=[288, 376],
                    metavar=("H", "W"))
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--duration", type=float, default=1.0)
    ap.add_argument("--chunk", type=int, default=200,
                    help="chained calls per host fetch")
    args = ap.parse_args()
    h, w = args.shape
    dtype = jnp.dtype(args.dtype)
    rows = []
    for k in KERNELS:
        for c in CHANNELS:
            ms = time_conv(c, c, k, h, w, dtype, args.duration, args.chunk)
            gf = analytic_gflops(h, w, c, c, k)
            rows.append({
                "kernel": k, "channels": c, "ms": round(ms, 4),
                "gflops": round(gf, 3),
                "achieved_tflops": round(gf / ms, 2),
            })
            print(rows[-1], flush=True)
    print(json.dumps({"shape": [h, w], "dtype": args.dtype, "rows": rows}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
