#!/usr/bin/env python3
"""5 ms north-star latency attack for conv3_heavy and conv6 (round-4,
VERDICT item 4): one same-run sweep of width-geometry variants, to either
get both under 5 ms p50 or pin the structural arithmetic for PERF.md.

- conv3_heavy: 394 GFLOP/frame at ~78 TFLOPS effective (5.02 ms) — already
  at 40% of silicon peak; the only levers left are geometry (crop-16 736,
  pad-768) worth +/-2%.
- conv6: 62.3 GFLOP at ~10.7 TFLOPS (5.84 ms) — lane-bound (36-channel
  layers); geometry is also the only lever (channel padding is net-negative:
  FLOPs grow quadratically, lane use linearly).

Run on TPU: python scripts/bench_conv6_latency.py
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from common import REF, TRAINED_CKPTS  # noqa: E402 — single checkpoint source


def main() -> int:
    from fs_uae_image_enhancer_project_tpu.utils.compile_cache import (
        enable_persistent_cache,
    )
    from fs_uae_image_enhancer_project_tpu.utils.platform import (
        honor_jax_platforms_env,
    )

    honor_jax_platforms_env()  # CLI convention: JAX_PLATFORMS binds
    enable_persistent_cache()

    import numpy as np
    import jax
    import jax.numpy as jnp

    from fs_uae_image_enhancer_project_tpu.export.enhance import make_enhance_fn
    from fs_uae_image_enhancer_project_tpu.export.onnx_import import import_any
    from fs_uae_image_enhancer_project_tpu.models import get_model
    from fs_uae_image_enhancer_project_tpu.models.configs import ConvStackConfig
    from fs_uae_image_enhancer_project_tpu.models.conv_stack import apply_fused
    from fs_uae_image_enhancer_project_tpu.train.trainer import load_params
    from fs_uae_image_enhancer_project_tpu.utils.profiler import measure_chained

    duration = float(os.environ.get("BENCH_DURATION_S", "10"))
    rng = np.random.default_rng(0)
    results = {}

    def bench(tag, fn):
        frame = jnp.asarray(
            rng.integers(0, 256, (1, 576, 752, 4), dtype=np.uint8)
        )
        res = measure_chained(fn, frame, warmup=20, duration_s=duration,
                              chunk=200)
        results[tag] = {"ms_per_frame": round(res.ms_per_call, 3),
                        "p50_ms": round(res.p50_ms, 3),
                        "fps": round(res.fps, 1),
                        "compile_s": round(res.compile_s, 1)}
        print(json.dumps({tag: results[tag]}), flush=True)

    def pad768(apply):
        def f(p, x):
            xp = jnp.pad(x, ((0, 0), (0, 0), (0, 16), (0, 0)))
            return apply(p, xp)[:, :, :752, :]
        return f

    # ---- conv3_heavy (shipped weights, sRGB domain) ----------------------
    imp = import_any(f"{REF}/model_conv3_heavy/conv3_heavy.onnx")
    cfg = ConvStackConfig(
        channels=tuple(imp.params[f"conv{i + 1}"]["w"].shape[-1]
                       for i in range(imp.num_conv_layers)),
        residual_layers=imp.residual_layers, final_act="none",
    )

    def c3h_apply(p, x):
        return apply_fused(p, x, cfg,
                           relu_before_residual_add=imp.relu_before_residual_add)

    for tag, kw in (
        ("conv3_heavy_baseline_752", dict(crop_left=0)),
        ("conv3_heavy_crop16_736", dict(crop_left=16)),
    ):
        bench(tag, make_enhance_fn(c3h_apply, imp.params, srgb_domain=True,
                                   donate=True, **kw))
    bench("conv3_heavy_pad768",
          make_enhance_fn(pad768(c3h_apply), imp.params, crop_left=0,
                          srgb_domain=True, donate=True))

    # ---- conv6 (trained weights, linear domain) --------------------------
    m = get_model("conv6")
    params = m.init(jax.random.key(0))
    ck = TRAINED_CKPTS["conv6"]
    if os.path.isdir(ck):
        params = load_params(ck, params)
    for tag, kw in (
        ("conv6_baseline_752", dict(crop_left=0)),
        ("conv6_crop16_736", dict(crop_left=16)),
    ):
        bench(tag, make_enhance_fn(m.apply, params,
                                   srgb_domain=not m.linear_io, donate=True,
                                   **kw))
    bench("conv6_pad768",
          make_enhance_fn(pad768(m.apply), params, crop_left=0,
                          srgb_domain=not m.linear_io, donate=True))

    print(json.dumps(results), flush=True)
    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "artifacts", "latency_sweep_r4.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=1)
    return 0


if __name__ == "__main__":
    sys.exit(main())
