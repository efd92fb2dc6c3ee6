#!/usr/bin/env bash
# Staged pix_shuffle_heavy training: LR-restart stage seeded from a prior
# best checkpoint, with PERIODIC PROCESS RESTARTS.
#
# Why restarts: the remote-TPU tunnel client retains host RSS for every
# byte ever device_put (CLAUDE.md "transfer retention"; measured
# scripts/probe_transfer_retention.py). Even uint8 batches retain
# ~2.7 GB/epoch at 4096x(376x288x3)x2 samples, so one long process OOMs
# this 125 GB VM after ~45 epochs (observed round 5: pid OOM-killed at
# 130 GB anon RSS, epoch 73). CSV resume is lossless (trainer.py
# load_last_epoch_and_checkpoint), so capping each process at ~12 epochs
# bounds the leak at ~33 GB and costs only a ~40 s restart.
#
# Why the CSV seed row: the trainer's resume semantics (reference
# train.py:86-148) take model weights from "Checkpoint Path", the learning
# rate from the last CSV row, and rebuild fresh optimizer state — exactly
# the reference's staged-curriculum pattern (train_*.sh stages), so a
# hand-seeded row IS a stage boundary: weights from the previous stage's
# best, lr reset to $LR, stage-local best starts at inf.
#
# Usage: recipes/train_heavy_staged.sh [OUT] [LR] [TOTAL_EPOCHS] [SEED_CKPT]
set -euo pipefail
cd "$(dirname "$0")/.."
OUT=${1:-/root/work/train_psh2}
LR=${2:-0.00015}
TOTAL=${3:-40}
SEED_CKPT=${4:-/root/work/train_psh/checkpoint_best_pix_shuffle}
STRIDE=12

mkdir -p "$OUT"
CSV="$OUT/training_stats_pix_shuffle.csv"
if [ ! -f "$CSV" ]; then
  if [ ! -d "$SEED_CKPT" ]; then
    echo "seed checkpoint not found: $SEED_CKPT" >&2
    exit 1
  fi
  printf 'Epoch,Train Loss,Validation Loss,EpochsNoImprove,LearningRate,Checkpoint Path\n' > "$CSV"
  printf '0,inf,inf,0,%s,%s\n' "$LR" "$SEED_CKPT" >> "$CSV"
  echo "seeded stage CSV: weights=$SEED_CKPT lr=$LR"
fi

TARGET=$STRIDE
TRIES=0
while true; do
  [ "$TARGET" -gt "$TOTAL" ] && TARGET=$TOTAL
  echo "=== stage process: epochs -> $TARGET (restart bounds tunnel RSS) ==="
  # a crashed process (OOM kill etc.) is retried at the same target: CSV
  # resume loses at most the in-flight epoch
  python scripts/train_psh_heavy_long.py --out "$OUT" --lr "$LR" \
    --epochs "$TARGET" || echo "stage process exited nonzero; resuming"
  LAST=$(tail -1 "$CSV" | cut -d, -f1)
  if [ "$LAST" -ge "$TOTAL" ]; then break; fi
  # early stop: the trainer writes a final CSV row at the stopping epoch
  # with the patience counter past the budget (field 4), then exits early
  PAT=$(tail -1 "$CSV" | cut -d, -f4)
  if [ "$PAT" -gt 20 ]; then echo "early stop detected"; break; fi
  if [ "$LAST" -ge "$TARGET" ]; then
    TARGET=$((TARGET + STRIDE))
    TRIES=0
  else
    TRIES=$((TRIES + 1))
    if [ "$TRIES" -ge 5 ]; then
      echo "no forward progress after $TRIES tries; giving up" >&2
      exit 1
    fi
  fi
done
echo "staged run complete: $(tail -1 "$CSV")"
