#!/bin/bash
# Canonical dataset generation — counterpart of the reference's
# dataset_generator/generate_dataset.sh: 376x288 lores crops, palettes
# {none,32..1024}, all 11 dithers, rotations {0,20..80}, downscales {40..90}.
python -m fs_uae_image_enhancer_project_tpu.datagen.generator \
  --train_images "$1" --test_images "$2" --dest_dir "${3:-data/quantized}" \
  --crop_size 376 288 \
  --resolution lores \
  --colorspace RGB444 \
  --palette 0 32 64 128 256 512 1024 \
  --dither none checkerboard bayer2x2 bayer4x4 bayer8x8 \
           floyd-steinberg atkinson sierra2 sierra3 stucki burkes \
  --rotation 0 20 40 60 80 \
  --downscale 40 50 60 70 80 90 \
  --grid overlap \
  "${@:4}"
# --grid overlap: the corpus at /root/work/dataset_lores was generated with
# the centered 20%-overlap grid (~1.5x more crops than the reference's
# tiling, which is the CLI default); pinning it keeps re-runs idempotent
# against that corpus.
