#!/bin/bash
# Criteo Kaggle training benchmark (reference: bench/dlrm_s_criteo_kaggle.sh:24
# — emb dim 36, bot 13-512-256-64-36, top 512-256-1, bs 128, SGD lr 0.1, bce).
# Extra args pass through: ./dlrm_s_criteo_kaggle.sh "--nepochs 2 ..."
set -e
cd "$(dirname "$0")/.."

dlrm_extra_option=$1

python -m evstore_tpu.cli \
  --arch-sparse-feature-size 36 \
  --arch-embedding-size 1460-583-10131227-2202608-305-24-12517-633-3-93145-5683-8351593-3194-27-14992-5461306-10-5652-2173-4-7046547-18-15-286181-105-142572 \
  --arch-mlp-bot 13-512-256-64-36 \
  --arch-mlp-top 512-256-1 \
  --data-generation dataset \
  --data-set kaggle \
  --loss-function bce \
  --round-targets True \
  --learning-rate 0.1 \
  --mini-batch-size 128 \
  --print-freq 1024 \
  --test-freq 30000 \
  --print-precision 5 \
  $dlrm_extra_option
