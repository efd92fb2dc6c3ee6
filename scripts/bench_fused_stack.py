#!/usr/bin/env python3
"""Benchmark the fused-stack Pallas kernel vs the XLA path on TPU.

Also checks both paths' accuracy on-device against the fp32 XLA forward.
Numbers land in docs/PERF.md.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    from fs_uae_image_enhancer_project_tpu.utils.compile_cache import (
        enable_persistent_cache,
    )

    from fs_uae_image_enhancer_project_tpu.utils.platform import (
        honor_jax_platforms_env,
    )

    honor_jax_platforms_env()  # CLI convention: JAX_PLATFORMS binds
    enable_persistent_cache()  # Mosaic compiles here run 10-20 min; cache them

    import numpy as np

    import jax
    import jax.numpy as jnp

    from fs_uae_image_enhancer_project_tpu.export.onnx_import import (
        import_pix_shuffle,
    )
    from fs_uae_image_enhancer_project_tpu.models import get_model
    from fs_uae_image_enhancer_project_tpu.ops.pallas.fused_stack import (
        fused_stack_apply,
    )
    from fs_uae_image_enhancer_project_tpu.ops.pallas.fused_stack_packed import (
        fused_stack_packed_apply,
    )
    from fs_uae_image_enhancer_project_tpu.utils.profiler import measure_chained

    ref = "/root/reference/model/model_pix_shuffle/pix_shuffle.onnx"
    if os.path.exists(ref):
        params = import_pix_shuffle(ref).params
    else:
        params = get_model("pix_shuffle").init(jax.random.key(0))
    m = get_model("pix_shuffle")

    x = jnp.asarray(
        np.random.default_rng(0).uniform(0, 1, (1, 576, 752, 3)).astype(np.float32)
    )
    xla_fn = jax.jit(
        lambda t: m.apply(params, t.astype(jnp.bfloat16)).astype(jnp.float32)
    )
    fused_fn = jax.jit(lambda t: fused_stack_apply(params, t, interpret=False))
    packed_fn = jax.jit(
        lambda t: fused_stack_packed_apply(params, t, interpret=False)
    )
    variants = [
        ("xla bf16", xla_fn),
        ("pallas fused", fused_fn),
        ("pallas packed-2", packed_fn),
    ]
    only = os.environ.get("BENCH_FUSED_ONLY")
    if only:
        variants = [(n, f) for n, f in variants if only in n]
    truth = np.asarray(jax.jit(lambda t: m.apply(params, t))(x))
    for name, fn in variants:
        err = np.abs(np.asarray(fn(x)) - truth)
        print(f"{name} vs fp32: max err {err.max():.2e} mean {err.mean():.2e}",
              flush=True)

    for name, fn in variants:
        # chunk=200 keeps the tunnel-RTT adder (RTT/chunk) under ~2 ms/call;
        # only same-run comparisons are meaningful either way (RTT varies 2x
        # between sessions).
        res = measure_chained(fn, x, warmup=5, duration_s=12.0, chunk=200)
        print(f"{name}: {res.ms_per_call:.3f} ms ({res.fps:.1f} fps, "
              f"p50 {res.p50_ms:.3f})", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
