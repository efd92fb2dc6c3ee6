#!/usr/bin/env python3
"""Seed the persistent compile cache for the deployed enhance artifact.

Run once at install/deploy time so the emulator sidecar's first frame does
not pay the XLA cold compile (measured 96.7-117.5 s on the tunnel TPU;
529.7 s once under heavy VM iowait — BENCH_r02). After this step a fresh
process deserializes the executable from the cache in ~1 s.

    python scripts/precompile.py [--onnx path] [--shapes 576x752 ...]

The reference sidesteps this class of cost entirely (ONNX Runtime builds a
session from the pre-compiled .onnx in milliseconds, README.md:26-27); this
is the JAX deployment counterpart.
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DEFAULT_ONNX = "/root/reference/model/model_pix_shuffle/pix_shuffle.onnx"


def main() -> int:
    from fs_uae_image_enhancer_project_tpu.utils.platform import (
        honor_jax_platforms_env,
    )

    honor_jax_platforms_env()  # CLI convention: JAX_PLATFORMS binds
    ap = argparse.ArgumentParser()
    ap.add_argument("--onnx", default=DEFAULT_ONNX if os.path.exists(DEFAULT_ONNX)
                    else None, help="weights artifact; random-init if absent")
    ap.add_argument("--shapes", nargs="*", default=["576x752"],
                    metavar="HxW", help="frame shapes to precompile")
    args = ap.parse_args()

    from fs_uae_image_enhancer_project_tpu.utils.compile_cache import (
        enable_persistent_cache,
    )

    cache_dir = enable_persistent_cache()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from fs_uae_image_enhancer_project_tpu.export.enhance import (
        default_enhance_fn,
        enhance_from_onnx,
    )

    if args.onnx:
        enhance = enhance_from_onnx(args.onnx, donate=False)
    else:
        enhance, _ = default_enhance_fn(donate=False)

    print(f"backend={jax.default_backend()} cache={cache_dir}", flush=True)
    for spec in args.shapes:
        h, w = (int(v) for v in spec.split("x"))
        frame = jnp.asarray(
            np.zeros((1, h, w, 4), np.uint8)
        )
        # Phase-split so the cacheable part (XLA compile) is reported
        # separately from the tunnel's first-execution cost, which the
        # cache cannot touch and which varies 8.6-517.8 s here (see
        # docs/DEPLOYMENT.md "Cold start") — a wall-clock threshold on the
        # total would mislabel both.
        # enhance is already jitted; use ITS .lower so the compiled program
        # (and so the cache key) is byte-identical to a direct enhance(x)
        # call — wrapping in another jax.jit produces a DIFFERENT key
        # (observed round 3: direct f64d... vs nested ab98... entries) and
        # would seed the wrong cache line.
        t0 = time.perf_counter()
        compiled = enhance.lower(frame).compile()
        t_compile = time.perf_counter() - t0
        t0 = time.perf_counter()
        np.asarray(compiled(frame))
        t_run = time.perf_counter() - t0
        state = "cache hit" if t_compile < 2.0 else "compiled + cached"
        print(f"{h}x{w}: compile {t_compile:.1f}s ({state}), first "
              f"execution {t_run:.1f}s, first call {t_compile + t_run:.1f}s",
              flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
