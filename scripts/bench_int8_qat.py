#!/usr/bin/env python3
"""int8 QAT study on real TPU hardware (round-4, VERDICT item 2).

The MXU runs int8 at 2x bf16 throughput — but only where the systolic
array's lanes are already full. This script settles the int8 question per
family with same-run evidence:

1. conv3_heavy (192/256-channel, ~394 GFLOP/frame, measured ~77 TFLOPS
   effective in bf16 — MXU-throughput-bound): bf16 vs int8-PTQ vs int8-QAT,
   same-run chained timing + full-frame parity vs the fp32 path.
2. pix_shuffle (36/72-channel, lane-bound): int8 timing re-measured for the
   negative-proof table.

Outputs artifacts/int8_qat/report.json. Run on the TPU:

    python scripts/bench_int8_qat.py
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REF = "/root/reference/model"
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "artifacts", "int8_qat")


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
    from PIL import Image
    import jax
    import jax.numpy as jnp

    from fs_uae_image_enhancer_project_tpu.export import qat
    from fs_uae_image_enhancer_project_tpu.export.enhance import make_enhance_fn
    from fs_uae_image_enhancer_project_tpu.export.onnx_import import import_any
    from fs_uae_image_enhancer_project_tpu.models.configs import ConvStackConfig
    from fs_uae_image_enhancer_project_tpu.utils.profiler import measure_chained

    os.makedirs(OUT, exist_ok=True)
    duration = float(os.environ.get("BENCH_DURATION_S", "10"))
    qat_steps = int(os.environ.get("QAT_STEPS", "300"))

    from common import psnr_u8 as psnr

    # ---- conv3_heavy: import shipped deployed weights --------------------
    imp = import_any(f"{REF}/model_conv3_heavy/conv3_heavy.onnx")
    cfg = ConvStackConfig(
        channels=tuple(imp.params[f"conv{i + 1}"]["w"].shape[-1]
                       for i in range(imp.num_conv_layers)),
        residual_layers=imp.residual_layers, final_act="none",
    )
    rbra = imp.relu_before_residual_add
    params = imp.params

    samples = [
        np.asarray(Image.open(f"{REF}/samples/sample{i}.png").convert("RGB"),
                   np.float32) / 255.0
        for i in range(8)
    ]

    # calibration on real frames (the deployment domain is sRGB [0,1])
    print("calibrating activation scales...", flush=True)
    scales = qat.calibrate_conv_stack(
        params, cfg, [s[None] for s in samples[:4]],
        relu_before_residual_add=rbra,
    )
    print(f"scales: { {k: round(v, 5) for k, v in scales.items()} }",
          flush=True)

    from fs_uae_image_enhancer_project_tpu.models.conv_stack import apply_fused

    def bf16_apply(p, x):
        return apply_fused(p, x, cfg, relu_before_residual_add=rbra)

    def int8_apply_factory(qp):
        def f(_p, x):
            return qat.apply_fused_int8(qp, x, cfg, scales,
                                        relu_before_residual_add=rbra)
        return f

    report = {"family": "conv3_heavy", "weights": "shipped reference",
              "qat_steps": qat_steps}

    # ---- quality: PTQ and QAT vs the fp32 native path --------------------
    enhance_fp32 = make_enhance_fn(bf16_apply, params, crop_left=0,
                                   srgb_domain=True,
                                   compute_dtype=jnp.float32, donate=False)
    fp32_frames = []
    for i, s in enumerate(samples):
        rgba = np.dstack([(s * 255).astype(np.uint8),
                          np.full(s.shape[:2], 255, np.uint8)])
        fp32_frames.append(np.asarray(enhance_fp32(jnp.asarray(rgba[None])))[0])

    def int8_quality(qp, tag):
        enh = make_enhance_fn(int8_apply_factory(qp), params, crop_left=0,
                              srgb_domain=True, compute_dtype=jnp.bfloat16,
                              donate=False)
        vals = []
        for i, s in enumerate(samples):
            rgba = np.dstack([(s * 255).astype(np.uint8),
                              np.full(s.shape[:2], 255, np.uint8)])
            out = np.asarray(enh(jnp.asarray(rgba[None])))[0]
            vals.append(psnr(out[..., :3], fp32_frames[i][..., :3]))
        report[f"{tag}_psnr_vs_fp32_8samples"] = vals
        report[f"{tag}_min_psnr_db"] = min(vals)
        print(f"{tag}: min {min(vals)} dB {vals}", flush=True)

    qp_ptq = qat.quantize_conv_stack(params)
    int8_quality(qp_ptq, "ptq")

    # ---- QAT distillation (crops of the real frames) ---------------------
    rng = np.random.default_rng(0)
    batches = []
    for _ in range(24):
        b = []
        for _ in range(4):
            s = samples[rng.integers(0, len(samples))]
            y = rng.integers(0, s.shape[0] - 256 + 1)
            x = rng.integers(0, s.shape[1] - 256 + 1)
            b.append(s[y:y + 256, x:x + 256])
        batches.append(np.stack(b))
    trained, scales, curve = qat.qat_distill_conv_stack(
        params, cfg, batches, relu_before_residual_add=rbra,
        steps=qat_steps, lr=2e-5, act_scales=scales,
    )
    report["distill_loss_first"] = float(np.mean(curve[:24]))
    report["distill_loss_last"] = float(np.mean(curve[-24:]))
    qp_qat = qat.quantize_conv_stack(trained)
    int8_quality(qp_qat, "qat")

    # ---- same-run speed: bf16 vs int8 ------------------------------------
    timing = {}
    for tag, fn in (
        ("bf16", make_enhance_fn(bf16_apply, params, crop_left=0,
                                 srgb_domain=True, donate=True)),
        ("int8_qat", make_enhance_fn(int8_apply_factory(qp_qat), params,
                                     crop_left=0, srgb_domain=True,
                                     donate=True)),
    ):
        frame = jnp.asarray(
            rng.integers(0, 256, (1, 576, 752, 4), dtype=np.uint8)
        )
        res = measure_chained(fn, frame, warmup=20, duration_s=duration,
                              chunk=200)
        timing[tag] = {"ms_per_frame": round(res.ms_per_call, 3),
                       "p50_ms": round(res.p50_ms, 3),
                       "fps": round(res.fps, 1),
                       "compile_s": round(res.compile_s, 1)}
        print(f"conv3_heavy {tag}: {timing[tag]}", flush=True)
    report["timing_same_run"] = timing

    # ---- pix_shuffle int8 negative-proof timing --------------------------
    from fs_uae_image_enhancer_project_tpu.export.onnx_import import (
        import_pix_shuffle,
    )
    from fs_uae_image_enhancer_project_tpu.export.quantized import (
        calibrate as ps_calibrate, make_quantized_enhance,
        quantize_weights as ps_quantize,
    )
    from fs_uae_image_enhancer_project_tpu.models import get_model

    ps = import_pix_shuffle(f"{REF}/model_pix_shuffle/pix_shuffle.onnx")
    m = get_model("pix_shuffle")
    lin_frames = [(s ** 2.2) for s in samples[:4]]
    ps_enh = make_quantized_enhance(ps.params, m.config, lin_frames,
                                    crop_left=ps.crop_left)
    ps_bf16 = make_enhance_fn(lambda p, x: m.apply(p, x), ps.params,
                              crop_left=ps.crop_left, donate=True)
    ps_timing = {}
    for tag, fn in (("bf16", ps_bf16), ("int8_ptq", ps_enh)):
        frame = jnp.asarray(
            rng.integers(0, 256, (1, 576, 752, 4), dtype=np.uint8)
        )
        res = measure_chained(fn, frame, warmup=20, duration_s=duration,
                              chunk=200)
        ps_timing[tag] = {"ms_per_frame": round(res.ms_per_call, 3),
                          "p50_ms": round(res.p50_ms, 3),
                          "fps": round(res.fps, 1)}
        print(f"pix_shuffle {tag}: {ps_timing[tag]}", flush=True)
    report["pix_shuffle_timing_same_run"] = ps_timing

    with open(os.path.join(OUT, "report.json"), "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report), flush=True)

    # persist the QAT weights + scales for the artifact/dispatch decision
    np.savez_compressed(
        os.path.join(OUT, "conv3_heavy_int8_qat.npz"),
        **{f"{k}_wq": np.asarray(v["w_q"]) for k, v in qp_qat.items()},
        **{f"{k}_scale": np.asarray(v["w_scale"]) for k, v in qp_qat.items()},
        **{f"{k}_bias": np.asarray(v["b"]) for k, v in qp_qat.items()
           if "b" in v},
        **{f"act_scale_{k}": np.float32(v) for k, v in scales.items()},
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
