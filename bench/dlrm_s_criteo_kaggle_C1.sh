#!/bin/bash
# EVStore C1 inference benchmark (reference: bench/dlrm_s_criteo_kaggle_C1.sh:
# cache-size 64000, storage-backed, 0.001 of data, warm-up).
set -e
cd "$(dirname "$0")/.."

dlrm_extra_option=$1

python -m evstore_tpu.cli \
  --inference-only \
  --use-evstore True \
  --arch-sparse-feature-size 36 \
  --arch-embedding-size 1460-583-10131227-2202608-305-24-12517-633-3-93145-5683-8351593-3194-27-14992-5461306-10-5652-2173-4-7046547-18-15-286181-105-142572 \
  --arch-mlp-bot 13-512-256-64-36 \
  --arch-mlp-top 512-256-1 \
  --data-generation dataset \
  --cache-algo evlfu \
  --emb-cache-size 64000 \
  --n-caching-layers 1 \
  --emb-stor mmap \
  --percent-data-for-inference 0.001 \
  --enable-warmup True \
  --write-cdf-file ./output/cdf_c1.csv \
  $dlrm_extra_option
