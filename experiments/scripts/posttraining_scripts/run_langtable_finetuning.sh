#!/bin/bash
# Language-table finetuning from a multi-dataset checkpoint
# (equivalent of posttraining_scripts/run_langtable_finetuning.sh).
set -e
PRETRAINED=${PRETRAINED:-data/hma_discrete_30}
python -m hma_tpu.train_multi \
  --genie_config hma_tpu/configs/magvit_n32_h8_d256_action.json \
  --train_split experiments/datasplit/langtable.yaml \
  --output_dir ${OUTPUT_DIR:-data/hma_langtable_ft} \
  --model_type discrete \
  --window_size 12 \
  --resume_from_checkpoint "$PRETRAINED" \
  --learning_rate 2e-5 \
  --num_warmup_steps 500 \
  "$@"
