"""Shared constants/helpers for the scripts/ harnesses.

Single source of truth for the machine-local trained-checkpoint map and the
capped-PSNR parity metric — these were previously copy-pasted between
build_artifacts.py, bench_families.py and bench_int8_qat.py and could drift
(a retrain updating one copy would leave another harness silently
benchmarking stale weights under a "trained" label).
"""
import os

REF = "/root/reference/model"

# Provenance tag for the corpus currently under /root/work/dataset_lores
# (the scripts/make_gt_frames.py + recipes/generate_dataset.sh rebuild).
# Stamped into trained-weight parity reports so downstream harnesses
# (eval_headtohead) can tell which corpus a committed artifact's weights
# were trained on — numbers are NOT comparable across corpora (CLAUDE.md).
CURRENT_CORPUS_TAG = "r4-rebuild"

# Trained checkpoints from this machine's hardware runs (CLAUDE.md "Local
# assets"); the trainer names files by family without the variant suffix.
TRAINED_CKPTS = {
    "conv6": "/root/work/train_conv6/checkpoint_best_conv6",
    "residual_unet": "/root/work/train_unet/checkpoint_best_residual_unet",
    "pix_shuffle_heavy": "/root/work/train_psh/checkpoint_best_pix_shuffle",
    # the long fresh run (scripts/train_psh_long.py --out default)
    "pix_shuffle_long": "/root/work/train_psh_long/checkpoint_best_pix_shuffle",
}


def psnr_u8(a, b) -> float:
    """PSNR between uint8 image arrays, capped at the 99.0 dB sentinel for
    bit-identical inputs (mse == 0)."""
    import numpy as np

    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    return round(99.0 if mse == 0 else 10 * np.log10(255.0**2 / mse), 2)


def vggfree_eval(model, params, val_iter, sync_every: int = 8):
    """The ONE cross-run scoring protocol: vgg-free pixel criterion + sRGB
    PSNR over a deterministic validation iterator.

    Both scripts/training_parity_study.py (ablation rows) and
    scripts/eval_headtohead.py (reference-vs-trained rows) call THIS
    function, so their numbers are comparable by construction — previously
    each carried a hand-synchronized copy of the same ~35 lines.

    Loss/PSNR scalars stay on device and are fetched in one stacked
    transfer (per-batch float() costs a tunnel RTT per batch — see
    trainer.py loss_sync_steps); ``sync_every`` bounds dispatch runahead.

    Alongside pixel loss + sRGB PSNR, reports sRGB-domain MS-SSIM when the
    crop geometry permits 5 scales (the perceptual column: PSNR alone is
    known-insufficient here — a row can win pixel loss while losing PSNR).

    Returns {"loss": float, "srgb_psnr_db": float,
             "ms_ssim_srgb": float | None, "batches": int}.
    """
    import dataclasses

    import numpy as np
    import jax
    import jax.numpy as jnp

    from fs_uae_image_enhancer_project_tpu.data.dataset import batch_transform
    from fs_uae_image_enhancer_project_tpu.losses.perceptual import (
        build_criterion,
    )
    from fs_uae_image_enhancer_project_tpu.losses.ssim import ms_ssim

    criterion = build_criterion(
        dataclasses.replace(model.loss, vgg_weight=0.0)
    )
    to_float = batch_transform(model.linear_io)

    @jax.jit
    def eval_step(p, lr_b, hr_b):
        lr_b, hr_b = to_float(lr_b), to_float(hr_b)
        y = model.apply(p, lr_b.astype(jnp.bfloat16)).astype(jnp.float32)
        loss = criterion(y, hr_b)
        # PSNR in the sRGB domain (linear io -> gamma for display)
        ys = jnp.clip(y, 0, None) ** (1 / 2.2)
        ts = jnp.clip(hr_b, 0, None) ** (1 / 2.2)
        try:
            ms = ms_ssim(jnp.clip(ys, 0.0, 1.0), jnp.clip(ts, 0.0, 1.0))
        except ValueError:  # crop too small for 5 scales (tiny test crops)
            ms = jnp.full((), jnp.nan, jnp.float32)
        return loss, jnp.mean((ys - ts) ** 2), ms

    losses, mses, msssims = [], [], []
    for i, (lr_b, hr_b) in enumerate(val_iter):
        l, e, m = eval_step(params, jnp.asarray(lr_b), jnp.asarray(hr_b))
        losses.append(l)
        mses.append(e)
        msssims.append(m)
        if (i + 1) % max(sync_every, 1) == 0:
            e.block_until_ready()
    if not losses:
        return {"loss": float("nan"), "srgb_psnr_db": float("nan"),
                "ms_ssim_srgb": None, "batches": 0}
    losses = np.asarray(jnp.stack(losses), np.float32)
    mses = np.asarray(jnp.stack(mses), np.float32)
    msssims = np.asarray(jnp.stack(msssims), np.float32)
    mse = float(np.mean(mses))
    ms_mean = float(np.mean(msssims))
    return {
        "loss": float(np.mean(losses)),
        "srgb_psnr_db": float(10 * np.log10(1.0 / mse)) if mse > 0 else 99.0,
        "ms_ssim_srgb": None if np.isnan(ms_mean) else ms_mean,
        "batches": int(len(mses)),
    }
