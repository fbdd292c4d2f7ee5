#!/bin/bash
# EVStore 3-tier inference (reference: the C1_C2_C3 driver with
# N_CACHING_LAYER=3, 8-bit C1 + 4-bit C2 + alt-key C3, proportion 48-48-4,
# TOTAL_SIZE 75425 — mixed_precs_caching/cache_manager.cpp:13-20).
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
  --cache-algo native \
  --emb-cache-size 75425 \
  --n-caching-layers 3 \
  --main-precision 8 \
  --secondary-precision 4 \
  --size-proportion 48-48-4 \
  --emb-stor mmap \
  --percent-data-for-inference 0.001 \
  --enable-warmup True \
  --write-cdf-file ./output/cdf_c1c2c3.csv \
  $dlrm_extra_option
