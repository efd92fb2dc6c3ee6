"""Export CLI — the deployment compiler.

Counterpart of reference ``convertion_tools/torch2onnx.py``'s main flow
(load checkpoint -> export -> graph wrapper -> verify -> save), argument
surface mirroring torch2onnx.py:790-805:

    python -m fs_uae_image_enhancer_project_tpu.export.cli \
        --checkpoint ckpts/checkpoint_best_pix_shuffle \
        --model_type pix_shuffle --output pix_shuffle.onnx

Emits the ONNX deployment artifact (full chunky-RGBA wrapper) and, with
--stablehlo, the jax.export artifact; verifies the ONNX with the numpy
runner on a random uint8 frame (the reference's verify_onnx_model step) and
cross-checks it against the native jax enhance path.
"""
from __future__ import annotations

import sys
from typing import Optional


def main(argv: Optional[list] = None) -> int:
    from ..utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()
    import argparse

    ap = argparse.ArgumentParser(description="Export a trained model for deployment")
    ap.add_argument("--checkpoint", required=True, help="orbax checkpoint dir")
    ap.add_argument("--model_type", default="pix_shuffle",
                    choices=["pix_shuffle", "pix_shuffle_heavy"])
    ap.add_argument("--output", required=True, help=".onnx output path")
    ap.add_argument("--stablehlo", default=None,
                    help="optional jax.export artifact output path")
    ap.add_argument("--crop_left", type=int, default=16,
                    help="left crop in px (torch2onnx crop-16 contract)")
    ap.add_argument("--fp32", action="store_true", help="export fp32 (default fp16)")
    ap.add_argument("--skip_verify", action="store_true")
    args = ap.parse_args(argv)

    import numpy as np
    import jax
    import jax.numpy as jnp

    from ..models import get_model
    from ..train.trainer import load_params
    from .onnx_export import export_pix_shuffle_onnx
    from .onnx_runner import verify_onnx_model

    m = get_model(args.model_type)
    params = load_params(args.checkpoint, m.init(jax.random.key(0)))
    print(f"loaded checkpoint {args.checkpoint}")

    out = export_pix_shuffle_onnx(
        params, m.config, args.output,
        crop_left=args.crop_left, fp16=not args.fp32,
    )
    print(f"wrote {out}")

    if not args.skip_verify:
        outs = verify_onnx_model(out)
        # cross-check vs the native jax enhance path on the same frame
        from .enhance import make_enhance_fn

        enhance = make_enhance_fn(
            m.apply, params, crop_left=args.crop_left,
            compute_dtype=jnp.float32, donate=False,
        )
        frame = np.random.default_rng(0).integers(
            0, 256, (1, 576, 752, 4), dtype=np.uint8
        )
        ours = np.asarray(enhance(jnp.asarray(frame)))
        theirs = outs["output_rgba_uint8_chunky"]
        mse = np.mean(
            (ours[..., :3].astype(np.float64) - theirs[..., :3].astype(np.float64)) ** 2
        )
        psnr = 99.0 if mse == 0 else 10 * np.log10(255.0**2 / mse)
        print(f"onnx-vs-jax cross-check PSNR: {psnr:.2f} dB")
        if psnr < 40.0:
            print("ERROR: exported graph diverges from the native path",
                  file=sys.stderr)
            return 1

    if args.stablehlo:
        from .enhance import make_enhance_fn
        from .stablehlo import export_enhance

        enhance = make_enhance_fn(
            m.apply, params, crop_left=args.crop_left, donate=False, jit=False
        )
        export_enhance(enhance, args.stablehlo)
        print(f"wrote {args.stablehlo}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
