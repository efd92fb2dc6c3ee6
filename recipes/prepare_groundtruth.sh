#!/bin/bash
# Ground-truth normalization — counterpart of the reference's
# dataset_generator/prepare_groundtruth.sh: ICC->sRGB PNGs, fit within
# 1920x1080 (LANCZOS), mirrored tree.
#   usage: prepare_groundtruth.sh <src_dir> <dst_dir> [extra flags...]
python -m fs_uae_image_enhancer_project_tpu.datagen.prepare_groundtruth \
  --max_crop_size 1920 1080 \
  --src "${1:-dataset/original_train}" \
  --dst "${2:-dataset/groundtruth_train}" \
  "${@:3}"
