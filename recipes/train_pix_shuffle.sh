#!/bin/bash
# Production training recipe — counterpart of the reference's
# model/train_pix_shuffle.sh (lr from the NAS study, crop 376x288, 50k
# samples/epoch).
DATA=${1:-data/quantized/train}
CKPT=${2:-ckpts/pix_shuffle}
python -m fs_uae_image_enhancer_project_tpu.train.cli \
  --model_type pix_shuffle --generator_train_dir "$DATA" \
  --checkpoint_dir "$CKPT" --crop_size 376 288 \
  --epochs 50 --train_samples 50000 --val_samples 5000 \
  --batch_size 8 --accumulation_steps 4 \
  --learning_rate 0.000544 --early_stopping_patience 10 \
  --samples_dir /root/reference/model/samples "${@:3}"
