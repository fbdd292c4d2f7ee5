#!/bin/bash
# Criteo Terabyte training benchmark (reference: bench/dlrm_s_criteo_terabyte.sh:24
# — emb dim 64, bot 13-512-256-64, top 512-512-256-1, bs 2048, max-ind-range 10M).
set -e
cd "$(dirname "$0")/.."

dlrm_extra_option=$1

python -m evstore_tpu.cli \
  --arch-sparse-feature-size 64 \
  --arch-embedding-size 227605432-39060-17295-7424-20265-3-7122-1543-63-130229467-3067956-405282-10-2209-11938-155-4-976-14-292775614-40790948-187188510-590152-12973-108-36 \
  --arch-mlp-bot 13-512-256-64 \
  --arch-mlp-top 512-512-256-1 \
  --max-ind-range 10000000 \
  --data-generation dataset \
  --data-set terabyte \
  --loss-function bce \
  --round-targets True \
  --learning-rate 0.1 \
  --mini-batch-size 2048 \
  --print-freq 1024 \
  --test-freq 30000 \
  $dlrm_extra_option
