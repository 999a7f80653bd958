#!/bin/bash
# Chain evaluate -> generate -> visualize on one domain
# (equivalent of eval_action_scripts/*.sh).
set -e
CKPT=${1:?usage: eval_discrete.sh CKPT_DIR VAL_DATA_DIR [TOKENIZER]}
VAL=${2:?}
TOKENIZER=${3:-data/magvit2.ckpt}
python -m hma_tpu.evaluate --checkpoint_dir "$CKPT" --val_data_dir "$VAL" \
  --output_dir "$CKPT/eval" ${TOKENIZER:+--tokenizer_ckpt "$TOKENIZER"}
python -m hma_tpu.generate --checkpoint_dir "$CKPT" --val_data_dir "$VAL" \
  --output_dir "$CKPT/gen"
python -m hma_tpu.visualize --token_dir "$CKPT/gen" --tokenizer_ckpt "$TOKENIZER"
