#!/usr/bin/env python3
"""End-to-end dataset-generation throughput: on-device mode vs host mode
(round-4, VERDICT item 6).

Regenerates a real slice of the lores corpus twice through the ACTUAL
generator orchestrator (datagen/generator.py — scan, targets, styled
phases, process-pool workers), identical crop specs both ways:

- host:   --palette_algorithm kmeans      --dither_backend numpy
          (the reference's architecture: per-crop sklearn k-means +
          host dither kernels in worker processes; the reference's own
          documented throughput hog, SURVEY §7 hard part 5)
- device: --palette_algorithm kmeans_jax  --dither_backend pallas
          (TPU k-means palettes + the fused Pallas dither kernel, one
          worker process owning the chip)

Combo slice = the vectorizable dither families the pallas kernel covers
(none/checkerboard/bayer*), palettes {64, 256} — error-diffusion dithers
always run on the host (inherently serpentine-sequential) so including
them would only dilute both columns equally.

Run on TPU from the repo root: python scripts/bench_generator_e2e.py
Writes artifacts/generator_e2e_r4.json. NOTE: this VM exposes ONE CPU, so
the host path's process pool is a single worker — on an N-core host the
host column scales ~N× while the device column is chip-bound; the JSON
records cpu_count for that context.
"""
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

GT = "/root/work/gt_frames"
OUTJSON = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "artifacts", "generator_e2e_r4.json")

N_IMAGES = int(os.environ.get("GEN_IMAGES", "2"))
MAX_CROPS = int(os.environ.get("GEN_MAX_CROPS", "8"))


def run_once(tag: str, palette_algorithm: str, backend: str,
             device_batch: int = 0) -> dict:
    from fs_uae_image_enhancer_project_tpu.datagen.generator import (
        DatasetGenerator,
        GeneratorConfig,
    )

    # real scene frames only — the flat?? frames are single-colour fills
    # whose 1-colour palettes trivialize (and distort) both columns
    imgs = sorted(
        os.path.join(GT, f)
        for f in os.listdir(GT)
        if f.startswith("sample") and f.endswith(".png")
    )[:N_IMAGES]
    dest = f"/tmp/genbench_{tag}"
    shutil.rmtree(dest, ignore_errors=True)
    cfg = GeneratorConfig(
        train_images=imgs,
        test_images=(),
        dest_dir=dest,
        crop_w=376, crop_h=288,
        resolutions=("lores",),
        colorspaces=("RGB444",),
        palettes=(64, 256),
        dithers=("none", "checkerboard", "bayer2x2", "bayer4x4", "bayer8x8"),
        rotations=(0,),
        downscales=(100,),
        palette_algorithm=palette_algorithm,
        quantize_backend=backend,
        device_batch=device_batch,
        max_crops_per_image=MAX_CROPS,
        workers=1,
        cache_dir=f"/tmp/genbench_cache_{tag}",
        verbose=1,
    )
    t0 = time.time()
    DatasetGenerator(cfg).run()
    dt = time.time() - t0

    styled = targets = 0
    for _r, _d, files in os.walk(dest):
        for f in files:
            if not f.endswith(".png"):
                continue
            if f.startswith("target_"):
                targets += 1
            else:
                styled += 1
    res = {
        "palette_algorithm": palette_algorithm,
        "dither_backend": backend,
        "device_batch": device_batch,
        "wall_s": round(dt, 1),
        "target_crops": targets,
        "styled_crops": styled,
        "styled_crops_per_s": round(styled / dt, 3),
    }
    print(json.dumps({tag: res}), flush=True)
    return res


def main() -> int:
    from fs_uae_image_enhancer_project_tpu.utils.platform import (
        honor_jax_platforms_env,
    )

    honor_jax_platforms_env()  # CLI convention: JAX_PLATFORMS binds
    results = {
        "slice": {
            "images": N_IMAGES,
            "max_crops_per_image": MAX_CROPS,
            "palettes": [64, 256],
            "dithers": ["none", "checkerboard", "bayer2x2", "bayer4x4",
                        "bayer8x8"],
            "crop": [376, 288],
        },
        "cpu_count": os.cpu_count(),
        "host": run_once("host", "kmeans", "numpy"),
        "device": run_once("device", "kmeans_jax", "pallas"),
        # the batched mode is the one that actually pays through the
        # high-RTT tunnel: ONE k-means call + ONE dither call per
        # (style, spec-chunk) instead of a round trip per crop
        "device_batched": run_once(
            "device_batched", "kmeans_jax", "pallas",
            device_batch=int(os.environ.get("GEN_DEVICE_BATCH", "16"))),
    }
    host_rate = max(results["host"]["styled_crops_per_s"], 1e-9)
    results["device_speedup_x"] = round(
        results["device"]["styled_crops_per_s"] / host_rate, 2)
    results["device_batched_speedup_x"] = round(
        results["device_batched"]["styled_crops_per_s"] / host_rate, 2)
    os.makedirs(os.path.dirname(OUTJSON), exist_ok=True)
    with open(OUTJSON, "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
