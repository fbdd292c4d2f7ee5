"""Configuration dataclasses for the evstore_tpu engine.

The reference drives everything through ~90 argparse flags
(dlrm_s_pytorch.py:924-1047) plus ~20 EVStore flags
(dlrm_s_pytorch_C1.py:1248-1268) and compile-time #defines in the C++ engine
(mixed_precs_caching/cache_manager.cpp:13-20).  Here all of that is typed,
runtime configuration.  `evstore_tpu.cli` maps the reference flag names onto
these dataclasses for CLI parity.
"""

from __future__ import annotations

import dataclasses
import json
from typing import Optional, Sequence, Tuple


def _tuple(xs) -> Tuple[int, ...]:
    return tuple(int(x) for x in xs)


@dataclasses.dataclass(frozen=True)
class DLRMConfig:
    """Model architecture.

    Mirrors the reference's arch flags: --arch-sparse-feature-size,
    --arch-embedding-size, --arch-mlp-bot, --arch-mlp-top,
    --arch-interaction-op, --arch-interaction-itself
    (dlrm_s_pytorch.py:926-936).
    """

    embedding_dim: int = 36                  # arch-sparse-feature-size
    table_sizes: Tuple[int, ...] = (4, 3, 2) # arch-embedding-size (tiny default, :930)
    mlp_bot: Tuple[int, ...] = (4, 3, 2)     # arch-mlp-bot (input dim first)
    mlp_top: Tuple[int, ...] = (8, 4, 2, 1)  # arch-mlp-top (output dim last)
    interaction_op: str = "dot"              # dot | cat
    interaction_itself: bool = False
    # md/qr compressed-table tricks (tricks/{md,qr}_embedding_bag.py)
    qr_flag: bool = False
    qr_operation: str = "mult"               # mult | add | concat
    qr_collisions: int = 4
    qr_threshold: int = 200
    md_flag: bool = False
    md_threshold: int = 200
    md_temperature: float = 0.3
    md_round_dims: bool = False
    # numerics
    param_dtype: str = "float32"
    compute_dtype: str = "float32"           # bfloat16 for MXU-friendly training
    # sample-blocked fused Pallas interaction (ops/pallas_interaction.py
    # dot_interaction_blocked, round 5): groups G=4 samples' feature
    # matrices into one MXU operand (the per-sample batched gram padded
    # 128x128 tiles to ~1% useful work and ran at 5.5 TF/s; blocked form
    # 158 TF/s).  In-step device time 52.3 -> 45.5 ms at B=65536 on v5e
    # with the scoped-vmem compile option (train_loop.step_jit) that keeps
    # XLA promoting the update-path take operands to VMEM.  Enabled by
    # default; falls back to the XLA split-gram form for batches not
    # divisible by 128 or off-TPU.  (The older per-sample-batched kernel
    # dot_interaction_pallas remains for A/B: it loses end-to-end.)
    use_pallas_interaction: bool = True
    # Pallas DMA row-gather for plain-table lookups in INFERENCE paths
    # (models/embedding.py).  Only engages when rows are 128-lane aligned
    # (D % 128 == 0, e.g. the MLPerf dim-128 recipe) on a TPU backend;
    # otherwise silently falls back to the XLA gather.  Honest fenced A/B
    # on v5e at dim 128 / B 8192 (scripts/ab_pallas_gather.py, EXPERIMENTS
    # §9): eval 0.35x, train 1.0x — the kernel wins only in kernel-level
    # isolation, so this stays False on v5e; the knob exists for other
    # TPU generations.
    use_pallas_gather: bool = False
    weighted_pooling: Optional[str] = None   # None | "learned" | "fixed"
    loss_threshold: float = 0.0              # clamp predictions (dlrm_s_pytorch.py:1034)

    @property
    def num_tables(self) -> int:
        return len(self.table_sizes)

    @property
    def num_dense_features(self) -> int:
        return self.mlp_bot[0]

    def top_mlp_input_dim(self) -> int:
        """num_int in the reference (dlrm_s_pytorch.py:1214-1229)."""
        d = self.mlp_bot[-1]
        n = self.num_tables
        if self.interaction_op == "dot":
            ni = n + 1
            offset = 1 if self.interaction_itself else 0
            return d + (ni * (ni - 1)) // 2 + offset * ni
        elif self.interaction_op == "cat":
            return d * (n + 1)
        raise ValueError(f"unsupported interaction op {self.interaction_op}")

    def validate(self) -> None:
        if self.mlp_bot[-1] != self.embedding_dim and not self.md_flag:
            raise ValueError(
                f"bottom MLP output dim {self.mlp_bot[-1]} must equal "
                f"embedding dim {self.embedding_dim} for '{self.interaction_op}' "
                "interaction (reference check dlrm_s_pytorch.py:1192-1199)")
        if self.mlp_top[0] != self.top_mlp_input_dim():
            raise ValueError(
                f"top MLP input dim {self.mlp_top[0]} != interaction output "
                f"{self.top_mlp_input_dim()} (reference check :1230-1234)")


def make_dlrm_config(embedding_dim: int, table_sizes: Sequence[int],
                     mlp_bot_hidden: Sequence[int], mlp_top_hidden: Sequence[int],
                     num_dense: int = 13, **kw) -> DLRMConfig:
    """Build a config with the top-MLP input dim derived automatically."""
    mlp_bot = _tuple([num_dense, *mlp_bot_hidden, embedding_dim])
    cfg = DLRMConfig(embedding_dim=embedding_dim, table_sizes=_tuple(table_sizes),
                     mlp_bot=mlp_bot, mlp_top=(1,), **kw)
    mlp_top = _tuple([cfg.top_mlp_input_dim(), *mlp_top_hidden, 1])
    cfg = dataclasses.replace(cfg, mlp_top=mlp_top)
    cfg.validate()
    return cfg


def kaggle_dlrm_config(**kw) -> DLRMConfig:
    """emb dim 36, bot 13-512-256-64-36, top 512-256-1
    (bench/dlrm_s_criteo_kaggle.sh:24)."""
    sizes = (1460, 583, 10131227, 2202608, 305, 24, 12517, 633, 3, 93145,
             5683, 8351593, 3194, 27, 14992, 5461306, 10, 5652, 2173, 4,
             7046547, 18, 15, 286181, 105, 142572)
    return make_dlrm_config(36, sizes, (512, 256, 64), (512, 256), **kw)


def kaggle_small_dlrm_config(max_rows: int = 100_000, **kw) -> DLRMConfig:
    """Kaggle model shape with tables clipped to max_rows (HBM/test friendly)."""
    base = kaggle_dlrm_config()
    sizes = tuple(min(s, max_rows) for s in base.table_sizes)
    return make_dlrm_config(36, sizes, (512, 256, 64), (512, 256), **kw)


def terabyte_dlrm_config(max_ind_range: int = 10_000_000, **kw) -> DLRMConfig:
    """emb dim 64, bot 13-512-256-64, top 512-512-256-1
    (bench/dlrm_s_criteo_terabyte.sh:24). Table sizes capped by max-ind-range."""
    sizes = (227605432, 39060, 17295, 7424, 20265, 3, 7122, 1543, 63,
             130229467, 3067956, 405282, 10, 2209, 11938, 155, 4, 976, 14,
             292775614, 40790948, 187188510, 590152, 12973, 108, 36)
    sizes = tuple(min(s, max_ind_range) for s in sizes)
    return make_dlrm_config(64, sizes, (512, 256), (512, 512, 256), **kw)


def mlperf_dlrm_config(max_ind_range: int = 40_000_000, **kw) -> DLRMConfig:
    """MLPerf recipe: emb dim 128, top 1024-1024-512-256-1 (bench/run_and_time.sh:17)."""
    sizes = (227605432, 39060, 17295, 7424, 20265, 3, 7122, 1543, 63,
             130229467, 3067956, 405282, 10, 2209, 11938, 155, 4, 976, 14,
             292775614, 40790948, 187188510, 590152, 12973, 108, 36)
    sizes = tuple(min(s, max_ind_range) for s in sizes)
    return make_dlrm_config(128, sizes, (512, 256), (1024, 1024, 512, 256), **kw)


def tiny_dlrm_config(**kw) -> DLRMConfig:
    """CPU-runnable fixture, analogous to the reference's tiny default model
    (--arch-embedding-size=4-3-2, dlrm_s_pytorch.py:930)."""
    return make_dlrm_config(4, (40, 30, 20), (8,), (8,), num_dense=4, **kw)


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """Training hyperparameters (reference flags dlrm_s_pytorch.py:952-1018)."""

    batch_size: int = 128
    test_batch_size: int = 128
    learning_rate: float = 0.1
    optimizer: str = "sgd"                 # sgd | adagrad | rwsadagrad
    loss_function: str = "bce"             # bce | mse | wbce
    loss_weights: Tuple[float, float] = (1.0, 1.0)
    nepochs: int = 1
    numpy_rand_seed: int = 123
    # LR policy (LRPolicyScheduler, dlrm_s_pytorch.py:168-202)
    lr_num_warmup_steps: int = 0
    lr_decay_start_step: int = 0
    lr_num_decay_steps: int = 0
    # eval cadence
    test_freq: int = -1
    mlperf_acc_threshold: float = 0.0
    mlperf_auc_threshold: float = 0.0
    print_freq: int = 1024
    # checkpointing
    save_model: str = ""
    load_model: str = ""
    # packed big-table layout (round 4): store tables past the VMEM-cliff
    # threshold as [N/P, P*D] for ~10x faster row gathers (EXPERIMENTS
    # §21).  train() packs before the loop and unpacks before returning,
    # so checkpoints/eval always see the logical [N, D] layout.
    pack_gather: bool = True


@dataclasses.dataclass(frozen=True)
class CacheConfig:
    """Tiered cache configuration.

    The reference splits this between runtime flags
    (dlrm_s_pytorch_C1.py:1248-1268) and C++ compile-time #defines
    (mixed_precs_caching/cache_manager.cpp:13-20).  Here it is one dataclass.
    """

    # which policy drives the C1 tier: evlfu | lfu | lru (cache_algo/)
    policy: str = "evlfu"
    n_caching_layers: int = 1              # 1 (C1), 2 (C1+C2), 3 (C1+C2+C3)
    total_size: int = 64_000               # entry budget at main precision
    size_proportion: Tuple[int, int, int] = (48, 48, 4)   # C1-C2-C3 split
    main_precision: int = 32               # 32 | 16 | 8 | 4  (C1)
    secondary_precision: int = 8           # 16 | 8 | 4       (C2)
    # EvLFU groupability policy constants (cache_algo/EvLFU_C1.py:18-19)
    flush_rate: float = 0.3
    perfect_item_cap: float = 0.95
    # C1/C2 miss-splitting heuristic (mixed_precs_caching/evlfu_8.hpp:70)
    high_agghit_threshold: int = 23
    # C3 (aprx_embedding.hpp:30-32)
    c3_io_batch: int = 50
    c3_n_batch: int = 10
    c3_eviction: str = "recency"           # fifo | recency
    approx_emb_threshold: int = -1         # EvLFU phase-1 short-circuit
    # storage backend behind the cache: dummy | file | mmap | sqlite | native
    storage_backend: str = "dummy"
    storage_path: str = ""
    n_warmup_requests: int = 0

    def tier_capacities(self) -> Tuple[int, int, int]:
        """Entry capacity per tier.  The reference scales entry counts by the
        precision ratio vs fp32 (evlfu_8.cpp:57-100): a byte budget expressed
        in main-precision entries buys 32/p more entries at precision p, and
        C3 alt-key entries are 4 bytes vs a full fp32 row (x dim).
        """
        p1, p2, p3 = self.size_proportion
        tot = p1 + p2 + p3
        c1 = int(self.total_size * p1 / tot)
        c2 = int(self.total_size * p2 / tot * (self.main_precision / max(self.secondary_precision, 1)))
        c3 = int(self.total_size * p3 / tot * 36)  # 144B row vs 4B alt-key
        if self.n_caching_layers == 1:
            return (self.total_size, 0, 0)
        if self.n_caching_layers == 2:
            p1, p2, _ = self.size_proportion
            c1 = int(self.total_size * p1 / (p1 + p2))
            c2 = int(self.total_size * p2 / (p1 + p2) * (self.main_precision / max(self.secondary_precision, 1)))
            return (c1, c2, 0)
        return (c1, c2, c3)


def to_json(cfg) -> str:
    return json.dumps(dataclasses.asdict(cfg))


def from_json(cls, s: str):
    d = json.loads(s)
    for k, v in list(d.items()):
        if isinstance(v, list):
            d[k] = tuple(v)
    return cls(**d)
