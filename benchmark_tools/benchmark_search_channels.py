#!/usr/bin/env python3
"""Inverse search: per-kernel-size channel counts with equal latency.

Counterpart of reference benchmark_tools/benchmark_search_channels.py
(benchmark_search_channels.py:81-136, :138-249): for each kernel size, find
the channel count whose conv latency matches a 3x3 reference conv, then scale
the per-kernel channel counts to a total channel budget — the design tool for
iso-latency multi-kernel paths.
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from benchmark_kernel_sizes import time_conv  # noqa: E402

import jax.numpy as jnp  # noqa: E402


def find_equal_latency_channels(
    target_ms: float, kernel: int, h: int, w: int, dtype,
    lo: int = 4, hi: int = 512, duration: float = 0.5,
) -> int:
    """Binary search the channel count whose latency best matches target."""
    best_c, best_err = lo, float("inf")
    while lo <= hi:
        mid = (lo + hi) // 2
        mid8 = max(4, (mid // 4) * 4)
        ms = time_conv(mid8, mid8, kernel, h, w, dtype, duration)
        err = abs(ms - target_ms)
        if err < best_err:
            best_err, best_c = err, mid8
        if ms < target_ms:
            lo = mid + 4
        else:
            hi = mid - 4
    return best_c


def main() -> int:
    from fs_uae_image_enhancer_project_tpu.utils.platform import (
        honor_jax_platforms_env,
    )

    honor_jax_platforms_env()  # CLI convention: JAX_PLATFORMS binds
    ap = argparse.ArgumentParser()
    ap.add_argument("--reference_kernel", type=int, default=3)
    ap.add_argument("--reference_channels", type=int, default=36)
    ap.add_argument("--kernels", type=int, nargs="*", default=[1, 3, 5, 7])
    ap.add_argument("--budget", type=int, default=72,
                    help="total channel budget to distribute")
    ap.add_argument("--shape", type=int, nargs=2, default=[288, 376])
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--duration", type=float, default=0.5)
    args = ap.parse_args()

    h, w = args.shape
    dtype = jnp.dtype(args.dtype)
    target = time_conv(
        args.reference_channels, args.reference_channels,
        args.reference_kernel, h, w, dtype, args.duration,
    )
    print(f"reference: k={args.reference_kernel} c={args.reference_channels} "
          f"-> {target:.4f} ms", flush=True)
    equal = {}
    for k in args.kernels:
        c = find_equal_latency_channels(target, k, h, w, dtype,
                                        duration=args.duration)
        equal[k] = c
        print(f"k={k}: ~{c} channels at iso-latency", flush=True)
    total = sum(equal.values())
    scaled = {k: max(4, round(c * args.budget / total)) for k, c in equal.items()}
    print(json.dumps({
        "reference_ms": round(target, 4),
        "iso_latency_channels": equal,
        "scaled_to_budget": scaled,
        "budget": args.budget,
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
