#!/bin/bash
# Shard-encode one OpenX dataset then merge (equivalent of gen_data.sh).
set -e
DATASET=${1:-kaist_nonprehensile_converted_externally_to_rlds}
NUM_SHARDS=${NUM_SHARDS:-8}
for SPLIT in train val; do
  for i in $(seq 0 $((NUM_SHARDS-1))); do
    python -m hma_tpu.data.encode_openx --dataset_name "$DATASET" \
      --data_split $SPLIT --shard_ind $i --num_shards $NUM_SHARDS &
  done
  wait
  python -m hma_tpu.data.merge_shards --dataset_name "$DATASET" \
    --data_split $SPLIT --num_shards $NUM_SHARDS
done
