"""Long fresh pix_shuffle training run for the head-to-head study.

Same protocol as scripts/training_parity_study.py's plateau leg (identical
gather, split_pairs(seed=0) 10% held-out pool, pinned random-VGG criterion,
lr/batch/accumulation from train_pix_shuffle.sh) but trained longer and
wider: 2x the samples per epoch and a larger early-stopping patience, so
the run is not capped by the 50-epoch budget the committed plateau model
had. The result feeds scripts/eval_headtohead.py (reference shipped weights
vs weights trained here, one metric, one held-out pool).

Checkpoints land OUTSIDE the repo (default /root/work/train_psh_long);
only the evaluation artifact is committed.
"""
from __future__ import annotations

import argparse
import dataclasses
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    from fs_uae_image_enhancer_project_tpu.utils.platform import (
        honor_jax_platforms_env,
    )

    honor_jax_platforms_env()  # CLI convention: JAX_PLATFORMS binds
    from fs_uae_image_enhancer_project_tpu.utils.platform import (
        register_preemptible_pid,
    )

    # Register for preemption: bench.py kills a concurrent trainer strictly
    # by this pid file + cmdline check (one chip, one process; training is
    # CSV-resumable so the kill is lossless). Self-registering here means
    # ANY launch of this script is preemptible, not only watcher-managed
    # ones. The helper also waits out a live bench before (re)starting.
    register_preemptible_pid()
    ap = argparse.ArgumentParser()
    ap.add_argument("--data", default="/root/work/dataset_lores/train")
    ap.add_argument("--out", default="/root/work/train_psh_long")
    ap.add_argument("--crop_size", type=int, nargs=2, default=[376, 288])
    ap.add_argument("--epochs", type=int, default=120)
    ap.add_argument("--samples_per_epoch", type=int, default=4096)
    ap.add_argument("--batch_size", type=int, default=8)
    ap.add_argument("--accumulation_steps", type=int, default=4)
    ap.add_argument("--lr", type=float, default=0.000544)
    ap.add_argument("--patience", type=int, default=20)
    args = ap.parse_args()

    from fs_uae_image_enhancer_project_tpu.utils.compile_cache import (
        enable_persistent_cache,
    )

    enable_persistent_cache()

    from fs_uae_image_enhancer_project_tpu.data import (
        SRDataset, gather_all_samples_from_directory, split_pairs,
    )
    from fs_uae_image_enhancer_project_tpu.losses import vgg as vgg_mod
    from fs_uae_image_enhancer_project_tpu.models import get_model
    from fs_uae_image_enhancer_project_tpu.train.trainer import (
        Trainer, TrainerConfig,
    )

    crop = tuple(args.crop_size)
    pairs = gather_all_samples_from_directory(args.data, crop, verbose=1)
    train_pool, val_pool = split_pairs(pairs, 0.1)  # the study's exact split
    print(f"pool: {len(train_pool)} train / {len(val_pool)} val", flush=True)

    tr = SRDataset(train_pool, crop, args.samples_per_epoch,
                   batch_size=args.batch_size, seed=0,
                   transfer_dtype="uint8")
    va = SRDataset(val_pool, crop, max(args.samples_per_epoch // 8, 64),
                   batch_size=args.batch_size, flips=False, seed=1,
                   transfer_dtype="uint8")

    model = get_model("pix_shuffle")
    cfg = TrainerConfig(
        num_epochs=args.epochs, lr=args.lr, batch_size=args.batch_size,
        accumulation_steps=args.accumulation_steps,
        checkpoint_interval=10, early_stopping_patience=args.patience,
        checkpoint_dir=args.out,
        samples_dir="/root/reference/model/samples"
        if os.path.isdir("/root/reference/model/samples") else None,
        verbose=1,
    )
    # pinned random basis: the committed plateau run's exact criterion
    best_val, best_epoch, _ = Trainer(
        model, cfg, vgg_mod._random_init()
    ).train(tr, va)
    print(f"best val {best_val:.5f} @ epoch {best_epoch}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
