#!/usr/bin/env python3
"""Self-train the VGG16-topology perceptual feature encoder in-domain.

Closes the last reference-capability gap (pretrained torchvision VGG16,
/root/reference/model/loss_vgg.py:60-91) by *capability* rather than by
blocked file: trains the identical topology as a reconstruction autoencoder
over the local ground-truth corpus + its quantized/dithered variants (see
losses/vgg_selftrain.py for the design rationale), rescales tap magnitudes
to the fixed-seed random-VGG baseline (keeps vgg_weight calibration), and
ships the encoder as assets/vgg16_features_selftrained.npz — the drop-in
path init_vgg16 already prefers over random init.

Run on the TPU:

    python scripts/train_vgg_features.py \
        --data /root/work/dataset_lores/train --gt /root/work/gt_frames
"""
import argparse
import glob
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


class PatchSampler:
    """Random 128x128 uint8 sRGB patches from a RAM-cached image subset.

    Mixes clean GT crops, their styled (palette/dither) variants, and the
    full GT frames — the encoder must represent both clean and degraded
    appearance (sensitivity, not invariance; vgg_selftrain.py docstring).
    """

    def __init__(self, files, patch: int, cache_n: int, seed: int):
        from PIL import Image

        rng = np.random.default_rng(seed)
        files = list(files)
        rng.shuffle(files)
        self.images = []
        for p in files[:cache_n]:
            with Image.open(p) as img:
                a = np.asarray(img.convert("RGB"), np.uint8)
            if a.shape[0] >= patch and a.shape[1] >= patch:
                self.images.append(a)
        if not self.images:
            raise RuntimeError("no usable images")
        self.patch = patch
        self.rng = rng

    def batch(self, n: int) -> np.ndarray:
        out = np.empty((n, self.patch, self.patch, 3), np.uint8)
        for i in range(n):
            img = self.images[self.rng.integers(0, len(self.images))]
            y = self.rng.integers(0, img.shape[0] - self.patch + 1)
            x = self.rng.integers(0, img.shape[1] - self.patch + 1)
            out[i] = img[y : y + self.patch, x : x + self.patch]
        return out


def main() -> int:
    from fs_uae_image_enhancer_project_tpu.utils.platform import (
        honor_jax_platforms_env,
    )

    honor_jax_platforms_env()  # CLI convention: JAX_PLATFORMS binds
    ap = argparse.ArgumentParser()
    ap.add_argument("--data", default="/root/work/dataset_lores/train")
    ap.add_argument("--gt", default="/root/work/gt_frames")
    ap.add_argument("--steps", type=int, default=6000)
    ap.add_argument("--batch_size", type=int, default=32)
    ap.add_argument("--patch", type=int, default=128)
    ap.add_argument("--lr", type=float, default=2e-4)
    ap.add_argument("--warmup", type=int, default=200)
    ap.add_argument("--cache_images", type=int, default=1400)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--work", default="/root/work/train_vgg")
    ap.add_argument("--out", default=os.path.join(
        REPO, "assets", "vgg16_features_selftrained.npz"))
    ap.add_argument("--resume", action="store_true")
    args = ap.parse_args()

    from fs_uae_image_enhancer_project_tpu.utils.compile_cache import (
        enable_persistent_cache,
    )

    enable_persistent_cache()

    import jax
    import jax.numpy as jnp
    import optax

    from fs_uae_image_enhancer_project_tpu.losses import vgg as vgg_mod
    from fs_uae_image_enhancer_project_tpu.losses import vgg_selftrain as st

    files = sorted(glob.glob(os.path.join(args.data, "*", "*.png")))
    gt_files = sorted(glob.glob(os.path.join(args.gt, "*.png")))
    print(f"corpus: {len(files)} crop files + {len(gt_files)} GT frames",
          flush=True)
    sampler = PatchSampler(files + gt_files, args.patch,
                           args.cache_images, args.seed)
    val_sampler = PatchSampler(files + gt_files, args.patch, 200,
                               args.seed + 1)
    val_batch = val_sampler.batch(args.batch_size)
    probe = val_sampler.batch(16).astype(np.float32) / 255.0
    print(f"cached {len(sampler.images)} train / {len(val_sampler.images)} "
          "val images", flush=True)

    enc = vgg_mod._random_init(jax.random.key(args.seed))
    dec = st.init_decoder(jax.random.key(args.seed + 100))

    schedule = optax.warmup_cosine_decay_schedule(
        0.0, args.lr, args.warmup, args.steps)
    optimizer = optax.chain(
        optax.clip_by_global_norm(1.0), optax.adamw(schedule, weight_decay=1e-5)
    )
    opt_state = optimizer.init({"enc": enc, "dec": dec})
    step_fn = jax.jit(st.make_train_step(optimizer), donate_argnums=(0, 1, 2))

    @jax.jit
    def val_loss_fn(enc_p, dec_p, x_u8):
        x = x_u8.astype(jnp.float32) / 255.0
        return st.reconstruction_loss(enc_p, dec_p, x)

    os.makedirs(args.work, exist_ok=True)
    start = 0
    ckpt = os.path.join(args.work, "latest.npz")
    if args.resume and os.path.exists(ckpt):
        data = np.load(ckpt)
        start = int(data["step"])
        enc = [{"w": jnp.asarray(data[f"enc{i}_w"]),
                "b": jnp.asarray(data[f"enc{i}_b"])} for i in range(len(enc))]
        dec = [{"w": jnp.asarray(data[f"dec{i}_w"]),
                "b": jnp.asarray(data[f"dec{i}_b"])} for i in range(len(dec))]
        print(f"resumed at step {start} (optimizer state fresh)", flush=True)

    @jax.jit
    def prep(x):
        return x.astype(jnp.float32) / 255.0

    log = open(os.path.join(args.work, "train_log.jsonl"), "a")
    t0 = time.time()
    # a --resume run already at/past --steps skips the loop entirely (asset
    # regeneration only) — vl must still exist for the meta dict below
    vl = None
    for step in range(start, args.steps):
        x_u8 = jnp.asarray(sampler.batch(args.batch_size))
        opt_state, enc, dec, loss = step_fn(opt_state, enc, dec, prep(x_u8))
        if step % 100 == 0 or step == args.steps - 1:
            vl = float(val_loss_fn(enc, dec, jnp.asarray(val_batch)))
            rec = {"step": step, "loss": float(loss), "val": vl,
                   "sec": round(time.time() - t0, 1)}
            print(json.dumps(rec), flush=True)
            log.write(json.dumps(rec) + "\n")
            log.flush()
        if step and step % 1000 == 0:
            payload = {"step": np.asarray(step)}
            for i, p in enumerate(enc):
                payload[f"enc{i}_w"] = np.asarray(p["w"], np.float32)
                payload[f"enc{i}_b"] = np.asarray(p["b"], np.float32)
            for i, p in enumerate(dec):
                payload[f"dec{i}_w"] = np.asarray(p["w"], np.float32)
                payload[f"dec{i}_b"] = np.asarray(p["b"], np.float32)
            np.savez(ckpt, **payload)

    # calibrate tap magnitudes to the random baseline, then ship
    enc_host = [{k: np.asarray(v, np.float32) for k, v in p.items()}
                for p in enc]
    target = st.random_baseline_rms(probe)
    before = st.measure_tap_rms(enc_host, probe)
    enc_cal = st.rescale_taps(enc_host, probe, target)
    after = st.measure_tap_rms(enc_cal, probe)
    print(f"tap rms before={before}\n        target={target}\n"
          f"         after={after}", flush=True)
    st.save_asset(enc_cal, args.out)
    meta = {
        "steps": args.steps, "batch": args.batch_size, "patch": args.patch,
        "corpus_files": len(files) + len(gt_files),
        "tap_rms_trained": before, "tap_rms_target_random": target,
        "tap_rms_calibrated": after,
        "final_val_recon_charbonnier": vl,
    }
    with open(args.out.replace(".npz", ".json"), "w") as f:
        json.dump(meta, f, indent=1)
    print(f"asset written: {args.out}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
