#!/usr/bin/env python3
"""Forward+backward timing of the activation registry on TPU.

Counterpart of reference benchmark_tools/benchmark_activation_functions.py
(fwd+bwd over shapes x dtypes with device-synchronized timing): informs the
NAS activation search about per-activation cost. Uses the chained-timing
methodology (see bench.py) because naive per-call timing is meaningless
through the remote-TPU tunnel.
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

from fs_uae_image_enhancer_project_tpu.ops.activations import (
    ACTIVATION_NAMES,
    apply_activation,
    init_activation,
)

SHAPES = [(1, 576, 752, 3), (1, 288, 376, 36), (1, 288, 376, 72)]


def time_fn(fn, x, duration_s=1.0, chunk=500):
    from fs_uae_image_enhancer_project_tpu.utils.profiler import measure_chained

    # activations are microsecond-scale: the tunnel's RTT/chunk adder must
    # be pushed well below the signal (chunk=20 would report ~RTT/20 =
    # 7.5-17.5 ms/call, ~1000x the true cost — docs/PERF.md "RTT adder")
    res = measure_chained(fn, x, warmup=3, duration_s=duration_s, chunk=chunk)
    return res.ms_per_call * 1e3  # us per call


def main() -> int:
    from fs_uae_image_enhancer_project_tpu.utils.platform import (
        honor_jax_platforms_env,
    )

    honor_jax_platforms_env()  # CLI convention: JAX_PLATFORMS binds
    ap = argparse.ArgumentParser()
    ap.add_argument("--dtype", default="bfloat16", choices=["bfloat16", "float32"])
    ap.add_argument("--duration", type=float, default=1.0)
    ap.add_argument("--chunk", type=int, default=500,
                    help="chained calls per host fetch")
    ap.add_argument("--names", nargs="*", default=None)
    args = ap.parse_args()

    names = args.names or [n for n in ACTIVATION_NAMES if n not in ("softmax", "log_softmax")]
    dtype = jnp.dtype(args.dtype)
    results = {}
    for shape in SHAPES:
        key = "x".join(map(str, shape))
        results[key] = {}
        x = jnp.asarray(
            np.random.default_rng(0).normal(0, 1, shape).astype(np.float32), dtype
        )
        for name in names:
            params = init_activation(jax.random.key(0), name,
                                     {"num_parameters": shape[-1]}
                                     if name in ("prelu", "biased_relu", "biased_prelu")
                                     else None)
            fwd = jax.jit(lambda t, p=params, n=name: apply_activation(n, p, t))
            # fwd+bwd: grad of mean output wrt input
            bwd = jax.jit(
                jax.grad(lambda t, p=params, n=name: jnp.mean(
                    apply_activation(n, p, t).astype(jnp.float32)))
            )
            try:
                results[key][name] = {
                    "fwd_us": round(
                        time_fn(fwd, x, args.duration, args.chunk), 2),
                    "fwd_bwd_us": round(
                        time_fn(bwd, x, args.duration, args.chunk), 2),
                }
            except Exception as e:
                results[key][name] = {"error": f"{type(e).__name__}"}
            print(f"{key} {name}: {results[key][name]}", flush=True)
    print(json.dumps({"dtype": args.dtype, "results": results}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
