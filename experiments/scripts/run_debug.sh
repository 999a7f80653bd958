#!/bin/bash
# 1-dataset overfit debug run (equivalent of experiments/scripts/run_debug.sh,
# whose reference version pointed at a nonexistent module).
set -e
python -m hma_tpu.train_multi \
  --genie_config hma_tpu/configs/magvit_n32_h8_d128_action.json \
  --train_split experiments/datasplit/dataset1.yaml \
  --output_dir ${OUTPUT_DIR:-data/debug_run} \
  --overfit_first_batch --max_train_steps 500 --log_every 10 \
  "$@"
