"""Per-family model benchmark CLI.

TPU-native counterpart of the reference's per-model ``__main__`` perf
self-tests (model_pix_shuffle.py / model_conv3.py / model_conv5.py /
model_residual_unet.py "Test performance" blocks: fuse -> half -> compile ->
measure FPS over a fixed window). Here the model is jitted with bf16 compute
and timed with the honest chained-dispatch methodology from utils/profiler
(naive per-call timing through the remote-TPU tunnel reports impossible
numbers — see docs/PERF.md).

    python -m fs_uae_image_enhancer_project_tpu.models.benchmark \
        --model_type pix_shuffle [--batch_size 1] [--duration 20]
"""
from __future__ import annotations

import sys
from typing import List, Optional

from . import MODEL_NAMES, count_params, get_model


def main(argv: Optional[List[str]] = None) -> int:
    from ..utils.platform import honor_jax_platforms_env

    honor_jax_platforms_env()
    import argparse

    ap = argparse.ArgumentParser(description="Model performance benchmark")
    ap.add_argument("--model_type", required=True, choices=sorted(MODEL_NAMES))
    ap.add_argument("--batch_size", type=int, default=1)
    ap.add_argument("--duration", type=float, default=20.0,
                    help="measurement window in seconds (reference uses 20)")
    ap.add_argument("--crop_size", type=int, nargs=2, default=[752, 576],
                    metavar=("W", "H"))
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from ..utils.profiler import measure_chained

    model = get_model(args.model_type)
    params = model.init(jax.random.key(0))
    n_params = count_params(params)
    dev = jax.devices()[0]
    print(f"Using device: {dev.platform}:{dev.id}")

    w, h = args.crop_size
    x = jnp.zeros((args.batch_size, h, w, 3), jnp.bfloat16)
    apply = model.apply
    if model.name in ("conv3", "conv5"):
        # fuse Conv+BN before timing — the reference self-benchmarks fuse
        # first (model_conv3.py:213-275 'model.fuse()'), and the deployed
        # graphs never execute live BatchNorm
        from .conv_stack import apply_fused, fuse

        params = fuse(params, model.config)
        apply = lambda p, t: apply_fused(p, t, model.config)  # noqa: E731
    p_bf16 = jax.tree.map(lambda a: a.astype(jnp.bfloat16), params)

    @jax.jit
    def fwd(x):
        return apply(p_bf16, x)

    out_shape = jax.eval_shape(fwd, x).shape
    print("Starting warm-up...")
    fwd(x).block_until_ready()
    print("Warm-up finished.\nMeasuring FPS...")
    res = measure_chained(fwd, x, warmup=5, duration_s=args.duration)
    fps = res.fps * args.batch_size

    print("\n--- Results ---")
    print("Model output shape:", tuple(out_shape))
    print(f"Model size (trainable parameters): {n_params}")
    print(f"Model size (MB, assuming bfloat16): {n_params * 2 / 1e6:.2f} MB")
    print(f"Mean step: {res.ms_per_call:.3f} ms")
    print(f"Average FPS: {fps:.2f}")
    print("---------------")
    return 0


if __name__ == "__main__":
    sys.exit(main())
