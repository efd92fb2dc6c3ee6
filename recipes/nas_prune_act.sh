#!/bin/bash
# NAS study recipe — counterpart of the reference's
# model/optuna_study_prune_act.sh (prune_act study: first-round activation
# pruning over the conv6 model, lores dataset, crop 376x288).
DATA=${1:-data/quantized/train}
python -m fs_uae_image_enhancer_project_tpu.nas.studies \
  --study prune_act --trials 35 \
  --generator_train_dir "$DATA" --crop_size 376 288 \
  --epochs_per_trial 10 --samples_per_epoch 512 \
  --storage tuning_results/studies.sqlite "${@:2}"
