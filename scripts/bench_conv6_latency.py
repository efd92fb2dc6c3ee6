#!/usr/bin/env python3
"""conv6 latency attack (round-4, VERDICT item 4): one same-run sweep of
width-geometry variants, to either get conv6 under the 5 ms p50 north star
or pin the structural arithmetic for PERF.md.

conv6 runs 62.3 GFLOP/frame at ~10.7 TFLOPS effective (5.84 ms) — the same
lane-bound regime as pix_shuffle (<=72-channel layers cannot fill the MXU's
128-wide N axis; channel padding is net-negative: FLOPs grow quadratically
with channel count but lane utilization only linearly). The remaining
levers are pure geometry:

- crop_left=16: the deployed reference wrapper's 736-wide frame (-2% FLOPs,
  and 736 = 32x23 may tile the width-into-lanes packing better than 752).
- pad-to-768: +2% FLOPs but 768 = 2^8 x 3 gives the friendliest tiling.

Run on TPU: python scripts/bench_conv6_latency.py
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    from fs_uae_image_enhancer_project_tpu.utils.compile_cache import (
        enable_persistent_cache,
    )

    enable_persistent_cache()

    import numpy as np
    import jax
    import jax.numpy as jnp

    from fs_uae_image_enhancer_project_tpu.export.enhance import make_enhance_fn
    from fs_uae_image_enhancer_project_tpu.models import get_model
    from fs_uae_image_enhancer_project_tpu.train.trainer import load_params
    from fs_uae_image_enhancer_project_tpu.utils.profiler import measure_chained

    duration = float(os.environ.get("BENCH_DURATION_S", "10"))
    m = get_model("conv6")
    params = m.init(jax.random.key(0))
    ck = "/root/work/train_conv6/checkpoint_best_conv6"
    src = "fresh-init"
    if os.path.isdir(ck):
        params = load_params(ck, params)
        src = "trained (lores corpus)"

    def pad768_apply(p, x):
        # pad width to 768 (zero columns right), compute, slice back: SAME
        # padding means the extra columns only perturb a 1-px halo that we
        # discard. 768 = 256*3 tiles the lane packing on round numbers.
        xp = jnp.pad(x, ((0, 0), (0, 0), (0, 16), (0, 0)))
        y = m.apply(p, xp)
        return y[:, :, :752, :]

    variants = {
        "baseline_752": make_enhance_fn(
            m.apply, params, crop_left=0, srgb_domain=not m.linear_io,
            donate=True),
        "crop16_736": make_enhance_fn(
            m.apply, params, crop_left=16, srgb_domain=not m.linear_io,
            donate=True),
        "pad_768": make_enhance_fn(
            pad768_apply, params, crop_left=0, srgb_domain=not m.linear_io,
            donate=True),
    }

    rng = np.random.default_rng(0)
    out = {"family": "conv6", "weights": src}
    for tag, fn in variants.items():
        frame = jnp.asarray(
            rng.integers(0, 256, (1, 576, 752, 4), dtype=np.uint8)
        )
        res = measure_chained(fn, frame, warmup=20, duration_s=duration,
                              chunk=200)
        out[tag] = {"ms_per_frame": round(res.ms_per_call, 3),
                    "p50_ms": round(res.p50_ms, 3),
                    "fps": round(res.fps, 1),
                    "compile_s": round(res.compile_s, 1)}
        print(json.dumps({tag: out[tag]}), flush=True)
    print(json.dumps(out), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
