"""Equal-capacity EvLFU vs LFU vs LRU comparison at engine speed.

The reference runs its LFU/LRU baselines from the C1 driver
(dlrm_s_pytorch_C1.py:1295-1303) but only in Python; here each policy runs
both in the Python frontend and in the C++ engine (native/_POLICY), same
capacity, same zipf workload, reporting hit rate / perfect hits / requests/s.
Results go into EXPERIMENTS.md §15.

Usage: python scripts/policy_table.py [--capacity 6000] [--requests 60000]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_one(policy: str, engine: str, capacity: int, idx: np.ndarray,
            tables, dim: int):
    from evstore_tpu.cache.storage import StorageManager
    from evstore_tpu.config import CacheConfig

    n_tables = idx.shape[1]
    sm = StorageManager("dummy", dim=dim).load(tables=tables)
    ccfg = CacheConfig(policy=policy, n_caching_layers=1, total_size=capacity,
                       main_precision=32)
    if engine == "native":
        from evstore_tpu.native import NativeTieredCache
        cache = NativeTieredCache(ccfg, n_tables, dim)
        cache.load_tables(tables)
    else:
        from evstore_tpu.drivers.infer import build_cache
        cache = build_cache(ccfg, None if False else _CfgShim(n_tables, dim),
                            sm, use_native=False)
    # timed replay, batched 256 requests per call
    B = 256
    t0 = time.perf_counter()
    for k in range(0, idx.shape[0], B):
        cache.request_batch(idx[k:k + B])
    dt = time.perf_counter() - t0
    st = cache.stats()
    tier = st.get("c1") or st.get("cache") or {}
    return {
        "policy": policy, "engine": engine,
        "requests_per_s": idx.shape[0] / dt,
        "hit_rate": tier.get("hit_rate"),
        "perfect_hits": st.get("perfect_hits"),
    }


class _CfgShim:
    def __init__(self, n_tables, dim):
        self.num_tables = n_tables
        self.embedding_dim = dim


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--capacity", type=int, default=6000)
    ap.add_argument("--requests", type=int, default=60000)
    ap.add_argument("--tables", type=int, default=26)
    ap.add_argument("--rows", type=int, default=20000)
    ap.add_argument("--dim", type=int, default=36)
    ap.add_argument("--noise", type=float, default=0.1,
                    help="grouped_zipf per-table resample probability")
    args = ap.parse_args()

    from evstore_tpu.data.synthetic import RandomDataConfig, random_batches
    rng = np.random.default_rng(0)
    tables = [np.asarray(rng.uniform(-1, 1, (args.rows, args.dim)), np.float32)
              for _ in range(args.tables)]
    dcfg = RandomDataConfig(num_dense=1,
                            table_sizes=[args.rows] * args.tables,
                            batch_size=args.requests, num_batches=1, seed=7,
                            distribution="grouped_zipf",
                            group_noise=args.noise)
    _, idx, _ = next(iter(random_batches(dcfg)))
    idx = np.asarray(idx)

    rows = []
    for engine in ("python", "native"):
        for policy in ("evlfu", "lfu", "lru"):
            r = run_one(policy, engine, args.capacity, idx, tables, args.dim)
            rows.append(r)
            print(f"{engine:7s} {policy:6s}  hit_rate={r['hit_rate']:.4f}  "
                  f"perfect={r['perfect_hits']}  "
                  f"{r['requests_per_s']:>12,.0f} req/s", flush=True)
    print(json.dumps(rows))


if __name__ == "__main__":
    main()
