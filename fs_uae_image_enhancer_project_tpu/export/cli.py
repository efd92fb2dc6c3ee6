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
    from ..utils.platform import honor_jax_platforms_env

    honor_jax_platforms_env()
    from ..utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()
    import argparse

    ap = argparse.ArgumentParser(description="Export a trained model for deployment")
    ap.add_argument("--checkpoint", required=True, help="orbax checkpoint dir")
    ap.add_argument("--model_type", default="pix_shuffle",
                    choices=["pix_shuffle", "pix_shuffle_heavy",
                             "conv3", "conv3_heavy", "conv5", "conv5_heavy",
                             "conv6", "residual_unet"])
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
    from .onnx_export import (
        export_conv6_onnx,
        export_conv_stack_onnx,
        export_pix_shuffle_onnx,
        export_residual_unet_onnx,
    )
    from .onnx_runner import verify_onnx_model

    # get_model resolves the reference-style '<name>_heavy' aliases itself
    m = get_model(args.model_type)
    base = m.name  # family name without the variant suffix
    params = load_params(args.checkpoint, m.init(jax.random.key(0)))
    print(f"loaded checkpoint {args.checkpoint}")

    fp16 = not args.fp32
    verify_crop = None  # (exporter-kwargs, crop side) for families whose
    # full-frame numpy-runner execution is too slow for an inline verify
    if args.model_type in ("pix_shuffle", "pix_shuffle_heavy"):
        out = export_pix_shuffle_onnx(
            params, m.config, args.output,
            crop_left=args.crop_left, fp16=fp16,
        )
        export_params = params
    elif base in ("conv3", "conv5"):
        from ..models.conv_stack import fuse

        export_params = fuse(params, m.config)
        out = export_conv_stack_onnx(export_params, m.config, args.output,
                                     fp16=fp16)
        verify_crop = (export_conv_stack_onnx, 160)
    elif args.model_type == "conv6":
        export_params = params
        out = export_conv6_onnx(params, m.config, args.output, fp16=fp16)
        verify_crop = (export_conv6_onnx, 160)
    else:  # residual_unet
        export_params = params
        out = export_residual_unet_onnx(
            params, m.config, args.output, crop_left=args.crop_left,
            fp16=fp16,
        )
        verify_crop = (export_residual_unet_onnx, 160)
    print(f"wrote {out}")

    if not args.skip_verify:
        from .enhance import make_enhance_fn

        if verify_crop is None:
            outs = verify_onnx_model(out)
            shape = (1, 576, 752, 4)
            crop_left = args.crop_left if args.model_type.startswith(
                "pix_shuffle") else 0
        else:
            # emit a crop-sized graph with the same weights for verification
            # (full-frame unet/conv6 through the numpy runner costs minutes)
            exporter, side = verify_crop
            import tempfile

            with tempfile.NamedTemporaryFile(suffix=".onnx") as tmp:
                kw = dict(fp16=fp16, frame_h=side, frame_w=side)
                if exporter is export_residual_unet_onnx:
                    kw["crop_left"] = 0
                exporter(export_params, m.config, tmp.name, **kw)
                outs = verify_onnx_model(tmp.name)
            shape = (1, side, side, 4)
            crop_left = 0
        # cross-check vs the native jax enhance path on the same frame
        srgb = base in ("conv3", "conv5")
        if srgb:
            from ..models.conv_stack import apply_fused

            apply = lambda p, x: apply_fused(p, x, m.config)  # noqa: E731
        else:
            apply = m.apply
        enhance = make_enhance_fn(
            apply, export_params, crop_left=crop_left,
            compute_dtype=jnp.float32, srgb_domain=srgb, donate=False,
        )
        frame = np.random.default_rng(0).integers(0, 256, shape, np.uint8)
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

        # mirror the ONNX artifact's per-family semantics exactly: fused
        # weights + sRGB domain for the conv stacks, crop only for the
        # families whose deployed graphs crop (pix_shuffle/unet) — a
        # default-gamma, always-cropped wrapper silently diverges from the
        # verified ONNX emitted above
        srgb = base in ("conv3", "conv5")
        if srgb:
            from ..models.conv_stack import apply_fused

            hlo_apply = lambda p, x: apply_fused(p, x, m.config)  # noqa: E731
        else:
            hlo_apply = m.apply
        hlo_crop = (args.crop_left
                    if args.model_type.startswith("pix_shuffle")
                    or base == "residual_unet" else 0)
        enhance = make_enhance_fn(
            hlo_apply, export_params, crop_left=hlo_crop,
            srgb_domain=srgb, donate=False, jit=False,
        )
        export_enhance(enhance, args.stablehlo)
        print(f"wrote {args.stablehlo} (crop_left={hlo_crop}, srgb={srgb})")
    return 0


if __name__ == "__main__":
    sys.exit(main())
