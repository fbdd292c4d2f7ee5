"""evstore_tpu — a TPU-native DLRM training/inference engine with EVStore-style
tiered embedding storage.

A ground-up JAX/XLA/Pallas re-design of the capabilities of
`ucare-uchicago/ev-store-dlrm` (ASPLOS'23 EVStore):

- DLRM model family (bottom MLP -> sparse embedding lookup -> pairwise feature
  interaction -> top MLP) for Criteo Kaggle / Terabyte, with md/qr compressed
  table tricks (reference: tricks/md_embedding_bag.py, tricks/qr_embedding_bag.py).
- rwsAdagrad row-wise sparse optimizer (reference: optim/rwsadagrad.py).
- SPMD sharded training over a (data, model) `jax.sharding.Mesh`: batch-DP MLPs
  and row-sharded embedding tables with collective exchange of looked-up rows
  (reference: extend_distributed.py + DLRM_Net.distributed_forward).
- Groupability-aware multi-tier embedding cache: C1 (EvLFU, HBM-resident),
  C2 (mixed-precision int4/8/16 host tier), C3 (approximate/alt-key tier)
  (reference: cache_algo/, mixed_precs_caching/).
- Storage backends for beyond-DRAM tables (reference: emb_storage/).

The compute path is jit/pjit + Pallas; the host runtime (tier engine, IO) is
C++ behind a ctypes ABI, mirroring the reference's native engine but with a
batched, TPU-feed-oriented API.
"""

__version__ = "0.1.0"

from evstore_tpu.config import DLRMConfig, TrainConfig, CacheConfig  # noqa: F401
