#!/bin/bash
# Continuous (STMAR) 30-dataset action-conditioned training
# (equivalent of experiments/scripts/continuous_model/run_30datasets_mar_waction.sh).
set -e
OUTPUT_DIR=${OUTPUT_DIR:-data/hma_mar_30}
python -m hma_tpu.train_multi \
  --genie_config hma_tpu/configs/mar_n32_h8_d256_action.json \
  --train_split experiments/datasplit/dataset30.yaml \
  --output_dir "$OUTPUT_DIR" \
  --model_type continuous \
  --window_size 12 \
  --per_device_train_batch_size ${BATCH:-8} \
  --learning_rate 1e-4 \
  --lr_scheduler_type custom_cosine \
  --num_warmup_steps 5000 \
  --eval_every_n_steps 1000 \
  --checkpointing_steps 2000 \
  "$@"
