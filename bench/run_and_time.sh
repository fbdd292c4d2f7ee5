#!/bin/bash
# MLPerf DLRM recipe (reference: bench/run_and_time.sh:17 — emb dim 128,
# top 1024-1024-512-256-1, bs 2048, lr 1.0, target AUC 0.8025).
set -e
cd "$(dirname "$0")/.."

dlrm_extra_option=$1

python -m evstore_tpu.cli \
  --arch-sparse-feature-size 128 \
  --arch-embedding-size 227605432-39060-17295-7424-20265-3-7122-1543-63-130229467-3067956-405282-10-2209-11938-155-4-976-14-292775614-40790948-187188510-590152-12973-108-36 \
  --arch-mlp-bot 13-512-256-128 \
  --arch-mlp-top 1024-1024-512-256-1 \
  --max-ind-range 40000000 \
  --data-generation dataset \
  --data-set terabyte \
  --loss-function bce \
  --round-targets True \
  --learning-rate 1.0 \
  --mini-batch-size 2048 \
  --print-freq 2048 \
  --test-freq 102400 \
  --mlperf-logging \
  --mlperf-auc-threshold 0.8025 \
  --lr-num-warmup-steps 2750 \
  --lr-decay-start-step 49315 \
  --lr-num-decay-steps 27772 \
  $dlrm_extra_option
