#!/bin/bash
# Multi-chip training: dp x sp mesh over ICI. On real hardware the mesh is
# the visible TPU slice; for a local smoke run use a virtual CPU mesh:
#   JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
#       recipes/train_pix_shuffle_multichip.sh data/quantized/train ckpts/ps8 8 2
# Gradient all-reduce and conv halo exchanges are XLA-inserted collectives
# (no NCCL/MPI analogue; see parallel/mesh.py).
DATA=${1:-data/quantized/train}
CKPT=${2:-ckpts/pix_shuffle_mc}
NDEV=${3:-8}
SP=${4:-2}
python -m fs_uae_image_enhancer_project_tpu.train.cli \
  --model_type pix_shuffle --generator_train_dir "$DATA" \
  --checkpoint_dir "$CKPT" --crop_size 376 288 \
  --n_devices "$NDEV" --spatial "$SP" \
  --epochs 50 --batch_size "$((NDEV / SP * 2))" --accumulation_steps 4 \
  --train_samples 50000 --val_samples 5000 \
  --learning_rate 0.000544
