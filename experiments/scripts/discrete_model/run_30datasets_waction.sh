#!/bin/bash
# Discrete 30-dataset action-conditioned training
# (equivalent of the reference torchrun launcher,
# experiments/scripts/discrete_model/run_30datasets_waction.sh — one
# process drives all local TPU chips; no rendezvous needed).
set -e
OUTPUT_DIR=${OUTPUT_DIR:-data/hma_discrete_30}
python -m hma_tpu.train_multi \
  --genie_config hma_tpu/configs/magvit_n32_h8_d256_action.json \
  --train_split experiments/datasplit/dataset30.yaml \
  --output_dir "$OUTPUT_DIR" \
  --model_type discrete \
  --window_size 12 \
  --per_device_train_batch_size ${BATCH:-8} \
  --gradient_accumulation_steps ${ACCUM:-1} \
  --learning_rate 1e-4 \
  --lr_scheduler_type custom_cosine \
  --num_warmup_steps 5000 \
  --eval_every_n_steps 1000 \
  --checkpointing_steps 2000 \
  --use_native_loader \
  "$@"
