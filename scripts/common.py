"""Shared constants/helpers for the scripts/ harnesses.

Single source of truth for the machine-local trained-checkpoint map and the
capped-PSNR parity metric — these were previously copy-pasted between
build_artifacts.py, bench_families.py and bench_int8_qat.py and could drift
(a retrain updating one copy would leave another harness silently
benchmarking stale weights under a "trained" label).
"""
import os

REF = "/root/reference/model"

# Trained checkpoints from this machine's hardware runs (CLAUDE.md "Local
# assets"); the trainer names files by family without the variant suffix.
TRAINED_CKPTS = {
    "conv6": "/root/work/train_conv6/checkpoint_best_conv6",
    "residual_unet": "/root/work/train_unet/checkpoint_best_residual_unet",
    "pix_shuffle_heavy": "/root/work/train_psh/checkpoint_best_pix_shuffle",
}


def psnr_u8(a, b) -> float:
    """PSNR between uint8 image arrays, capped at the 99.0 dB sentinel for
    bit-identical inputs (mse == 0)."""
    import numpy as np

    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    return round(99.0 if mse == 0 else 10 * np.log10(255.0**2 / mse), 2)
