#!/bin/bash
# NAS study recipe — counterpart of the reference's model/optuna_study_opt_act.sh
# (opt_act study: activation search on layers 1/2/4/6/7 of the conv6 model,
# 10 epochs per trial, MedianPruner warmup 6, crop 376x288).
DATA=${1:-data/quantized/train}
python -m fs_uae_image_enhancer_project_tpu.nas.studies \
  --study opt_act --trials 35 \
  --generator_train_dir "$DATA" --crop_size 376 288 \
  --epochs_per_trial 10 --samples_per_epoch 512 \
  --pruning_warmup_steps 6 \
  --storage tuning_results/studies.sqlite "${@:2}"
