#!/usr/bin/env python3
"""Per-family sustained enhance throughput on the TPU — the counterpart of
the reference's per-model FPS reporting (each model_*.py carries the same
20-warmup + sustained-window loop, e.g. model_pix_shuffle.py:348-368;
model_conv3.py / model_conv5.py equivalents).

Weights: the reference's shipped artifacts where they exist
(pix_shuffle/conv3/conv5 families), this repo's trained artifacts'
checkpoints for conv6/residual_unet when present, fresh-init otherwise.
One process for all families (the tunnel's first-execution cost is paid
once per process). Prints one JSON line per family.
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from common import REF, TRAINED_CKPTS as CKPTS  # noqa: E402


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

    from fs_uae_image_enhancer_project_tpu.export.enhance import (
        enhance_from_onnx, make_enhance_fn,
    )
    from fs_uae_image_enhancer_project_tpu.models import get_model
    from fs_uae_image_enhancer_project_tpu.utils.profiler import measure_chained

    duration = float(os.environ.get("BENCH_DURATION_S", "12"))

    def family_fn(name):
        onnx = f"{REF}/model_{name}/{name}.onnx"
        if os.path.exists(onnx):
            return enhance_from_onnx(onnx, donate=True), "shipped reference weights"
        base = name.partition("_heavy")[0]
        variant = "heavyweight" if name.endswith("_heavy") else "lightweight"
        m = get_model(base if base in ("conv3", "conv5", "pix_shuffle")
                      else name, variant)
        params = m.init(jax.random.key(0))
        src = "fresh-init"
        ck = CKPTS.get(name)
        if ck and os.path.isdir(ck):
            from fs_uae_image_enhancer_project_tpu.train.trainer import (
                load_params,
            )

            params = load_params(ck, params)
            src = "trained (lores corpus)"
        crop = 16 if name == "residual_unet" else 0
        return (
            make_enhance_fn(m.apply, params, crop_left=crop,
                            srgb_domain=not m.linear_io, donate=True),
            src,
        )

    rng = np.random.default_rng(0)
    for name in ("pix_shuffle", "pix_shuffle_heavy", "conv3", "conv3_heavy",
                 "conv5", "conv5_heavy", "conv6", "residual_unet"):
        fn, src = family_fn(name)
        # fresh device frame per family: each fn donates its input, which
        # deletes the buffer after the first call
        frame = jnp.asarray(
            rng.integers(0, 256, (1, 576, 752, 4), dtype=np.uint8)
        )
        res = measure_chained(fn, frame, warmup=20, duration_s=duration,
                              chunk=200)
        print(json.dumps({
            "family": name, "fps": round(res.fps, 1),
            "ms_per_frame": round(res.ms_per_call, 3),
            "p50_ms": round(res.p50_ms, 3),
            "compile_s": round(res.compile_s, 1), "weights": src,
        }), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
