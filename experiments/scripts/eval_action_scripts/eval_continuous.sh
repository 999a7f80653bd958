#!/bin/bash
# Chain evaluate_feature -> generate --use_feature -> visualize on one
# domain (continuous-family equivalent of eval_discrete.sh; the reference
# chains evaluate_diffusion -> generate --use_feature -> visualize in its
# eval_action_scripts).
set -e
CKPT=${1:?usage: eval_continuous.sh CKPT_DIR VAL_DATA_DIR [SVD_VAE_STATE_DICT]}
VAL=${2:?}
VAE=${3:-}
python -m hma_tpu.evaluate_feature --checkpoint_dir "$CKPT" --val_data_dir "$VAL" \
  --output_dir "$CKPT/eval_feature" ${VAE:+--vae_checkpoint "$VAE" --compute_fvd --compute_fid}
python -m hma_tpu.generate --use_feature --checkpoint_dir "$CKPT" --val_data_dir "$VAL" \
  --output_dir "$CKPT/gen_feature"
if [ -n "$VAE" ]; then
  python -m hma_tpu.visualize --token_dir "$CKPT/gen_feature" --tokenizer_ckpt "$VAE"
fi
