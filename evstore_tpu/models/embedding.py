"""Embedding tables: initialization, lookup, and the md/qr compressed tricks.

Reference: DLRM_Net.create_emb (dlrm_s_pytorch.py:247-294) initializes each
table uniform(-1/sqrt(n), 1/sqrt(n)); apply_emb (:407-459) looks up one row
per table per sample (bag size 1 on Criteo, dlrm_data_pytorch.py:407-408) with
optional per-sample weights; QREmbeddingBag (tricks/qr_embedding_bag.py) and
PrEmbeddingBag/md_solver (tricks/md_embedding_bag.py) are the compressed
variants.

TPU-first design: tables are plain [N, D] arrays in a pytree; the Criteo
lookup is a batched `take` along rows which XLA lowers to a dynamic-gather —
or the Pallas double-buffered gather kernel (`ops.pallas_gather`) for the
row-sharded path.  Instead of 26 module objects, the whole sparse arch is one
pytree: either a dict of per-table arrays (uneven sizes) or one stacked
[T, N, D] array (uniform sizes; enables a single fused gather and table-wise
sharding).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def init_embedding_tables(key: jax.Array, table_sizes: Sequence[int],
                          dim: int, dtype=jnp.float32) -> Dict[str, jnp.ndarray]:
    """Uniform(-1/sqrt(n), 1/sqrt(n)) per table (dlrm_s_pytorch.py:278-283)."""
    tables = {}
    keys = jax.random.split(key, len(table_sizes))
    for t, (k, n) in enumerate(zip(keys, table_sizes)):
        bound = float(np.sqrt(1.0 / n))
        tables[f"table_{t}"] = jax.random.uniform(
            k, (n, dim), dtype=dtype, minval=-bound, maxval=bound)
    return tables


def pool_bags(rows: jnp.ndarray, weights: Optional[jnp.ndarray]) -> jnp.ndarray:
    """Sum-pool a multi-hot bag: rows [B, L, D] (+ optional weights [B, L])
    -> [B, D].  This is torch.nn.EmbeddingBag(mode="sum",
    per_sample_weights=w) re-expressed with a STATIC max bag size L —
    variable-length bags pad with index 0 / weight 0 (exact for sum pooling)
    instead of torch's ragged offsets, keeping shapes XLA-static
    (reference: dlrm_s_pytorch.py:407-459 apply_emb)."""
    if weights is not None:
        rows = rows * weights[..., None].astype(rows.dtype)
    return rows.sum(axis=1)


# One-hot matmul gather cutoff.  XLA's row gather serializes (~17 ns/row
# on v5e => ~0.55 ms per table at B=32768 REGARDLESS of table size), while
# onehot(ids) @ table runs on the MXU at a cost governed by the [B, N]
# one-hot materialization (~4*B*N bytes of traffic).  Crossover at
# N ~ 2.5k for B=32k on v5e; EXACT: each output row sums exactly one
# 1.0 * row product.  Measured in the full train step (EXPERIMENTS §20).
ONEHOT_GATHER_MAX_ROWS = 2048

# Packed-gather for HBM-resident big tables.  XLA's gather from a large
# operand costs per-ROW, and the per-row cost collapses as rows widen
# (v5e, 144 MB operand, B=65536: D=36 42.6 ns/row, D=72 4.0, D=144 10.7 —
# scripts/gather_width_sweep.py + /tmp wide2 sweep).  [N, D] ->
# [N/P, D*P] is a free reshape of the same ROW-MAJOR bytes, but XLA's
# TILED device layouts differ, so reshaping in-graph costs a 2.3 ms/table
# relayout per step (measured) that eats the entire win.  The packing
# therefore must live in the STORED layout: train_loop packs big tables
# once before the step scan (train/optim.py pack_tables) and the step
# gathers via take_rows_packed_layout.  Only tables past the VMEM cliff
# (operand >~48 MB gathers ~40 ns/row; smaller operands are cached in
# VMEM by XLA and gather at 0.2-10 ns/row — scripts/gather_cliff.py)
# benefit; below it the extra select would just add VPU passes.
PACKED_GATHER_FACTOR = 2
PACKED_GATHER_MIN_BYTES = 48 << 20


def take_rows(table: jnp.ndarray, ids: jnp.ndarray) -> jnp.ndarray:
    """Row lookup with a static lowering choice: tiny tables go through the
    MXU one-hot matmul, big tables through the XLA gather."""
    n = table.shape[0]
    if n <= ONEHOT_GATHER_MAX_ROWS:
        flat = ids.reshape(-1)
        oh = (flat[:, None] == jnp.arange(n, dtype=ids.dtype)[None, :]
              ).astype(table.dtype)
        # f32 tables need HIGHEST: the default MXU precision would demote
        # the f32 rows to bf16 inside the dot, silently rounding the lookup
        # (same bug class as the interaction selection matmul).  HIGHEST's
        # bf16-split is exact for f32, and each output row sums exactly one
        # 1.0 * row product, so the result is bit-identical to jnp.take.
        # bf16 tables keep the fast default (already exact: 1.0 * bf16).
        prec = (jax.lax.Precision.HIGHEST
                if table.dtype == jnp.float32 else None)
        rows = jnp.dot(oh, table, preferred_element_type=jnp.float32,
                       precision=prec).astype(table.dtype)
        return rows.reshape(*ids.shape, table.shape[1])
    # mode="clip": the default "fill" wraps every gather in an
    # in-bounds compare + select(NaN) pass over the FULL output (visible
    # as pred[N] operands in the fused update passes); lookup ids are
    # valid by contract (reference semantics: torch would raise)
    return jnp.take(table, ids, axis=0, mode="clip")


def pick_pack_factor(n: int, d: int, itemsize: int = 4) -> int:
    """Largest pack factor (<= PACKED_GATHER_FACTOR) worth using for an
    [n, d] table: 1 below the VMEM cliff or when n doesn't divide."""
    if n * d * itemsize <= PACKED_GATHER_MIN_BYTES:
        return 1
    p = PACKED_GATHER_FACTOR
    while p > 1 and n % p:
        p //= 2
    return p


def take_rows_packed_layout(packed: jnp.ndarray, ids: jnp.ndarray, p: int,
                            d: int) -> jnp.ndarray:
    """Row lookup against a STORED packed table [N/p, p*d]: gather the
    packed row id//p at the fast wide width, then select sub-row id%p.
    EXACT: static lane slices + lax.select_n move bytes, no arithmetic."""
    flat = ids.reshape(-1)
    rows = jnp.take(packed, flat // p, axis=0, mode="clip")   # [B, p*d]
    if p == 1:
        return rows.reshape(*ids.shape, d)
    sub = jnp.broadcast_to((flat % p).astype(jnp.int32)[:, None],
                           (flat.shape[0], d))
    out = jax.lax.select_n(sub, *(rows[:, k * d:(k + 1) * d]
                                  for k in range(p)))
    return out.reshape(*ids.shape, d)


def embedding_lookup(tables: Dict[str, jnp.ndarray], idx: jnp.ndarray,
                     compute_dtype=None,
                     bag_weights: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """idx: [B, T] (one-hot) or [B, T, L] (multi-hot bags, sum-pooled with
    optional bag_weights [B, T, L]) -> [B, T, D] rows.

    One lookup per table (tables have uneven row counts); tiny tables take
    the one-hot matmul lowering (take_rows).  For the sharded/cached paths
    see parallel/ and cache/.
    """
    multi = idx.ndim == 3
    outs = []
    for t in range(idx.shape[1]):
        ids = idx[:, t]
        rows = take_rows(tables[f"table_{t}"], ids)
        if multi:
            rows = pool_bags(rows, None if bag_weights is None
                             else bag_weights[:, t])
        outs.append(rows)
    out = jnp.stack(outs, axis=1)
    if compute_dtype is not None:
        out = out.astype(compute_dtype)
    return out


# ------------------------------------------------------------------ QR trick

def init_qr_tables(key: jax.Array, num_rows: int, dim: int, collisions: int,
                   operation: str = "mult", dtype=jnp.float32) -> Dict[str, jnp.ndarray]:
    """Quotient-remainder compositional embedding (tricks/qr_embedding_bag.py:25-185):
    table_q has ceil(n/c) rows, table_r has c rows; combined by mult/add/concat."""
    num_q = -(-num_rows // collisions)
    kq, kr = jax.random.split(key)
    if operation == "concat":
        dq = dim // 2
        dr = dim - dq
    else:
        dq = dr = dim
    bq = float(np.sqrt(1.0 / num_q))
    br = float(np.sqrt(1.0 / collisions))
    return {
        "q": jax.random.uniform(kq, (num_q, dq), dtype=dtype, minval=-bq, maxval=bq),
        "r": jax.random.uniform(kr, (collisions, dr), dtype=dtype, minval=-br, maxval=br),
    }


def qr_lookup(qr: Dict[str, jnp.ndarray], idx: jnp.ndarray, collisions: int,
              operation: str = "mult") -> jnp.ndarray:
    """idx: [B] -> [B, D] (tricks/qr_embedding_bag.py:156-174)."""
    q = jnp.take(qr["q"], idx // collisions, axis=0)
    r = jnp.take(qr["r"], idx % collisions, axis=0)
    if operation == "mult":
        return q * r
    if operation == "add":
        return q + r
    if operation == "concat":
        return jnp.concatenate([q, r], axis=-1)
    raise ValueError(f"unsupported qr operation {operation}")


# ------------------------------------------------------------------ MD trick

def md_solver(sizes: np.ndarray, alpha: float, d0: Optional[int] = None,
              round_dim: bool = False) -> np.ndarray:
    """Mixed-dimension alpha-power rule (tricks/md_embedding_bag.py:20-61):
    d_i = d0 * (n_i / n_max)^(-alpha) capped at d0, where n is sorted
    descending and d0 defaults to the dim of the largest table."""
    sizes = np.asarray(sizes, dtype=np.float64)
    order = np.argsort(-sizes)
    n_sorted = sizes[order]
    if d0 is None:
        raise ValueError("d0 (base dim) required")
    p = n_sorted / n_sorted[0]
    d = d0 * np.power(p, alpha)
    d = np.maximum(d, 1)
    if round_dim:
        d = np.power(2, np.round(np.log2(d))).astype(np.int64)  # pow_2_round (:59)
    d = np.minimum(d, d0).astype(np.int64)
    out = np.empty_like(d)
    out[order] = d
    return out


def init_md_table(key: jax.Array, num_rows: int, base_dim: int, md_dim: int,
                  dtype=jnp.float32) -> Dict[str, jnp.ndarray]:
    """PrEmbeddingBag (tricks/md_embedding_bag.py:63-81): a [n, md_dim] table
    plus a [md_dim, base_dim] linear up-projection (no bias)."""
    kt, kp = jax.random.split(key)
    bt = float(np.sqrt(1.0 / num_rows))
    tab = jax.random.uniform(kt, (num_rows, md_dim), dtype=dtype, minval=-bt, maxval=bt)
    if md_dim == base_dim:
        return {"table": tab}
    bp = float(np.sqrt(2.0 / (md_dim + base_dim)))  # xavier-ish
    proj = jax.random.uniform(kp, (md_dim, base_dim), dtype=dtype, minval=-bp, maxval=bp)
    return {"table": tab, "proj": proj}


def md_lookup(md: Dict[str, jnp.ndarray], idx: jnp.ndarray) -> jnp.ndarray:
    rows = jnp.take(md["table"], idx, axis=0)
    if "proj" in md:
        rows = rows @ md["proj"]
    return rows


# --------------------------------------------------- unified sparse arch API

def init_sparse_arch(key: jax.Array, cfg) -> Dict[str, dict]:
    """Initialize the full sparse side honoring qr/md flags from DLRMConfig."""
    sizes = cfg.table_sizes
    keys = jax.random.split(key, len(sizes))
    dtype = jnp.dtype(cfg.param_dtype)
    if cfg.md_flag:
        md_dims = md_solver(np.asarray(sizes), -cfg.md_temperature,
                            d0=cfg.embedding_dim, round_dim=cfg.md_round_dims)
    params: Dict[str, dict] = {}
    for t, (k, n) in enumerate(zip(keys, sizes)):
        if cfg.qr_flag and n > cfg.qr_threshold:
            params[f"table_{t}"] = {"kind_qr": init_qr_tables(
                k, n, cfg.embedding_dim, cfg.qr_collisions, cfg.qr_operation, dtype)}
        elif cfg.md_flag and n > cfg.md_threshold:
            params[f"table_{t}"] = {"kind_md": init_md_table(
                k, n, cfg.embedding_dim, int(md_dims[t]), dtype)}
        else:
            bound = float(np.sqrt(1.0 / n))
            entry = {"kind_plain": jax.random.uniform(
                k, (n, cfg.embedding_dim), dtype=dtype, minval=-bound, maxval=bound)}
            if cfg.weighted_pooling:
                # per-row pooling weights v_W (dlrm_s_pytorch.py:284-293);
                # "learned" trains them, "fixed" keeps ones
                entry["pool_w"] = jnp.ones((n, 1), dtype)
            params[f"table_{t}"] = entry
    return params


def sparse_arch_lookup(params: Dict[str, dict], idx: jnp.ndarray, cfg,
                       bag_weights: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """idx [B, T] (or [B, T, L] multi-hot with optional bag_weights
    [B, T, L]) -> [B, T, D] honoring per-table qr/md/plain kinds.  Multi-hot
    bags are sum-pooled like torch EmbeddingBag(mode="sum") with offsets
    (dlrm_s_pytorch.py:407-459); see pool_bags."""
    multi = idx.ndim == 3
    outs = []
    for t in range(idx.shape[1]):
        p = params[f"table_{t}"]
        ids = idx[:, t]
        flat = ids.reshape(-1) if multi else ids
        if "kind_qr" in p:
            rows = qr_lookup(p["kind_qr"], flat, cfg.qr_collisions, cfg.qr_operation)
        elif "kind_md" in p:
            rows = md_lookup(p["kind_md"], flat)
        else:
            if getattr(cfg, "use_pallas_gather", False):
                from evstore_tpu.ops.pallas_gather import gather_rows_grad
                rows = gather_rows_grad(p["kind_plain"], flat)
            else:
                # tiny tables -> one-hot MXU; big tables -> packed gather
                rows = take_rows(p["kind_plain"], flat)
            if "pool_w" in p:
                # per-row pooling weights v_W ≙ per_sample_weights
                # (dlrm_s_pytorch.py:284-293,446-453)
                rows = rows * jnp.take(p["pool_w"], flat, axis=0)
        if multi:
            rows = pool_bags(rows.reshape(ids.shape[0], ids.shape[1], -1),
                             None if bag_weights is None
                             else bag_weights[:, t])
        outs.append(rows)
    return jnp.stack(outs, axis=1)
