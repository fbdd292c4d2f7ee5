"""Offline alternative-key generation for the C3 tier.

Reference pipeline (SURVEY §3.5 / script/approximate_embedding/):
cuML NearestNeighbors(n_neighbors=11, euclidean) over ALL tables' rows
concatenated (get_neighbors_GPU.ipynb), then per row pick the neighbor with
the highest workload frequency (most_popular_neighbor.ipynb, frequencies
from rankedWorkload.csv), finally packed as big-endian uint32 alt keys with
altKey = tableId + 100*rowId, tables 1-based (convert_altkeys_to_binary.py).

TPU-native: the kNN is a blocked matmul (pairwise squared distances via
||a||^2 + ||b||^2 - 2ab^T on the MXU) + top-k, jitted; runs on whatever
jax.devices() offers (TPU preferred, CPU fine for tests).
"""

from __future__ import annotations

import functools
import os
from typing import List, Optional, Sequence

import numpy as np


def _topk_neighbors_blocked(rows: np.ndarray, k: int,
                            block: int = 2048) -> np.ndarray:
    """[N, D] -> [N, k] neighbor indices (excluding self), smallest
    euclidean distance first."""
    import jax
    import jax.numpy as jnp

    N = rows.shape[0]
    rows_j = jnp.asarray(rows, jnp.float32)
    sq = jnp.sum(rows_j * rows_j, axis=1)

    @jax.jit
    def block_topk(q, q_sq, q_base):
        # distances of this query block to ALL rows
        d = q_sq[:, None] + sq[None, :] - 2.0 * jnp.dot(
            q, rows_j.T, preferred_element_type=jnp.float32)
        # mask self
        n = q.shape[0]
        row_ids = q_base + jnp.arange(n)[:, None]
        all_ids = jnp.arange(N)[None, :]
        d = jnp.where(row_ids == all_ids, jnp.inf, d)
        _, idx = jax.lax.top_k(-d, k)
        return idx

    out = np.empty((N, k), np.int64)
    for s in range(0, N, block):
        e = min(s + block, N)
        q = rows_j[s:e]
        pad = 0
        if e - s < block and s != 0:
            pad = block - (e - s)
            q = jnp.concatenate([q, jnp.zeros((pad, rows.shape[1]),
                                              jnp.float32)])
        got = np.asarray(block_topk(q, jnp.sum(q * q, axis=1),
                                    jnp.int32(s)))
        out[s:e] = got[:e - s]
    return out


def generate_altkeys(tables: Sequence[np.ndarray],
                     workload_freq: Optional[Sequence[np.ndarray]] = None,
                     n_neighbors: int = 10,
                     block: int = 2048) -> List[np.ndarray]:
    """Returns per-table arrays of uint32 alt keys.

    tables: per-table [n_t, D] fp32 EV rows.
    workload_freq: per-table [n_t] access counts (the rankedWorkload.csv
    equivalent); if given, each row's alt key is its most-popular neighbor,
    else the nearest one.
    """
    sizes = [t.shape[0] for t in tables]
    offsets = np.concatenate([[0], np.cumsum(sizes)])
    allrows = np.concatenate([np.asarray(t, np.float32) for t in tables])
    neigh = _topk_neighbors_blocked(allrows, n_neighbors, block)

    if workload_freq is not None:
        freq_all = np.concatenate([np.asarray(f, np.float64)
                                   for f in workload_freq])
        # pick the neighbor with max workload frequency (ties -> nearest)
        f = freq_all[neigh]                      # [N, k]
        choice = np.argmax(f, axis=1)
        picked = neigh[np.arange(len(neigh)), choice]
    else:
        picked = neigh[:, 0]

    # global row id -> (table, row) -> altKey = (t+1) + 100*row
    out = []
    tbl_of = np.searchsorted(offsets, picked, side="right") - 1
    row_of = picked - offsets[tbl_of]
    alt_all = ((tbl_of + 1) + 100 * row_of).astype(np.uint32)
    for t in range(len(tables)):
        out.append(alt_all[offsets[t]:offsets[t + 1]])
    return out


def write_altkeys_binary(alt_tables: Sequence[np.ndarray], out_dir: str
                         ) -> List[str]:
    """Big-endian uint32 per row (convert_altkeys_to_binary.py:27-50)."""
    os.makedirs(out_dir, exist_ok=True)
    paths = []
    for t, alts in enumerate(alt_tables):
        p = os.path.join(out_dir, f"alt-keys-{t + 1}.bin")
        np.asarray(alts, ">u4").tofile(p)
        paths.append(p)
    return paths


def workload_frequencies(trace_dir: str, table_sizes: Sequence[int]
                         ) -> List[np.ndarray]:
    """Count per-row access frequencies from a recorded workload trace
    (utils/trace.WorkloadTracer output; ≙ rankedWorkload.csv)."""
    out = []
    for t, n in enumerate(table_sizes):
        f = np.zeros(n, np.int64)
        p = os.path.join(trace_dir, f"trace-table-{t + 1}.csv")
        if os.path.exists(p):
            with open(p) as fh:
                for line in fh:
                    r = int(line)
                    if r < n:
                        f[r] += 1
        out.append(f)
    return out
