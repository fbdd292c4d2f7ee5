"""Terabyte-scale rehearsal: beyond-DRAM training + inference through the
tiered cache, with master tables on SSD.

The reference's Terabyte recipe (bench/dlrm_s_criteo_terabyte.sh:24: dim 64,
bs 2048, max-ind-range 10M) trains with full tables in device memory and only
*infers* beyond-DRAM.  This rehearsal exercises the evstore_tpu counterpart
at a configurable fraction of that scale with BOTH memory walls bounded:

  - HBM bound:  device holds only the C1 cache working set (capacity rows).
  - DRAM bound: master tables are np.memmap over fp32 .bin files; the OS
    page cache is the effective DRAM tier (TrainableDeviceCache.from_files).

Phases: (1) generate file-backed tables chunk-wise (never materializing a
table in RAM), (2) train N steps on a zipf stream measuring examples/s and
write-back volume, (3) export + run device-cache inference over the same
files, (4) print one JSON summary.

Usage:
  python scripts/tb_rehearsal.py                     # ~0.5 GB quick pass
  python scripts/tb_rehearsal.py --rows 10000000 --dim 64 --tables 26  # ~7 GB
"""

from __future__ import annotations

import argparse
import json
import os
import resource
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def gen_tables(workdir: str, n_tables: int, rows: int, dim: int,
               chunk_rows: int = 1 << 18, seed: int = 0) -> float:
    """Write fp32 ev-table-<t+1>.bin files chunk-wise; returns GB written."""
    os.makedirs(workdir, exist_ok=True)
    rng = np.random.default_rng(seed)
    total = 0
    for t in range(n_tables):
        p = os.path.join(workdir, f"ev-table-{t + 1}.bin")
        if os.path.exists(p) and os.path.getsize(p) == rows * dim * 4:
            total += rows * dim * 4
            continue
        with open(p, "wb") as f:
            done = 0
            while done < rows:
                n = min(chunk_rows, rows - done)
                # float32 generation end-to-end (float64 uniform is ~6x slower)
                f.write((rng.random((n, dim), dtype=np.float32) * 1.8 - 0.9)
                        .tobytes())
                done += n
        total += rows * dim * 4
    return total / 1e9


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", default="/tmp/evstore_tb")
    ap.add_argument("--tables", type=int, default=8)
    ap.add_argument("--rows", type=int, default=500_000,
                    help="rows per table (10M ≙ terabyte recipe's "
                         "max-ind-range)")
    ap.add_argument("--dim", type=int, default=64)
    ap.add_argument("--batch", type=int, default=2048)
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--cache-rows", type=int, default=200_000,
                    help="device C1 capacity (bounds HBM)")
    ap.add_argument("--zipf", type=float, default=1.05)
    ap.add_argument("--infer-batches", type=int, default=20)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    import jax
    from evstore_tpu.cache.device_cache import NativeDeviceC1Cache
    from evstore_tpu.cache.trainable import TrainableDeviceCache
    from evstore_tpu.config import CacheConfig, TrainConfig, make_dlrm_config
    from evstore_tpu.models.dlrm import init_dlrm

    t0 = time.perf_counter()
    gb = gen_tables(args.workdir, args.tables, args.rows, args.dim)
    gen_s = time.perf_counter() - t0
    print(f"tables: {args.tables} x {args.rows} x {args.dim} fp32 "
          f"= {gb:.2f} GB on disk ({gen_s:.1f}s)")

    cfg = make_dlrm_config(args.dim, [args.rows] * args.tables,
                           [512, 256], [512, 256], num_dense=13)
    tcfg = TrainConfig(batch_size=args.batch, learning_rate=0.1,
                       optimizer="rwsadagrad")
    ccfg = CacheConfig(policy="evlfu", total_size=args.cache_rows,
                       main_precision=32)
    params = init_dlrm(jax.random.PRNGKey(args.seed), cfg)

    tc = TrainableDeviceCache.from_files(cfg, tcfg, ccfg, args.workdir,
                                         [args.rows] * args.tables)
    dense = params.dense
    dstate = jax.tree_util.tree_map(
        lambda p: jax.numpy.zeros_like(p, dtype=jax.numpy.float32), dense)

    rng = np.random.default_rng(args.seed + 1)
    # zipf over the row space: heavy head, long tail — the cache-friendly
    # skew the reference's workloads exhibit
    def batch():
        z = rng.zipf(args.zipf, (args.batch, args.tables)) - 1
        idx = (z % args.rows).astype(np.int64)
        dx = rng.random((args.batch, 13), np.float32)
        y = rng.integers(0, 2, args.batch).astype(np.float32)
        return dx, idx, y

    # warm-up step (compile)
    dx, idx, y = batch()
    dense, dstate, loss = tc.train_batch(dense, dstate, 0, dx, idx, y)
    jax.block_until_ready(loss)

    t1 = time.perf_counter()
    losses = []
    for k in range(1, args.steps + 1):
        dx, idx, y = batch()
        dense, dstate, loss = tc.train_batch(dense, dstate, k, dx, idx, y)
        losses.append(loss)
    jax.block_until_ready(losses[-1])
    train_s = time.perf_counter() - t1
    train_eps = args.steps * args.batch / train_s
    tc.flush_files()
    tstats = tc.stats()
    tc.close()

    # inference over the same files through the device cache
    icc = CacheConfig(policy="evlfu", total_size=args.cache_rows,
                      main_precision=8)
    dc = NativeDeviceC1Cache(icc, args.tables, args.dim)
    dc.open_table_files(args.workdir, [args.rows] * args.tables, 32)
    _ = dc.request_batch(batch()[1][:64])        # compile
    t2 = time.perf_counter()
    n_inf = 0
    for _ in range(args.infer_batches):
        _, idx, _ = batch()
        out = dc.request_batch(idx)
        n_inf += idx.shape[0]
    infer_s = time.perf_counter() - t2
    istats = dc.stats()
    dc.close()

    rss_gb = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6
    summary = {
        "disk_gb": round(gb, 2),
        "rss_gb": round(rss_gb, 2),
        "hbm_cache_mb": round(args.cache_rows * (args.dim + 1) * 4 / 1e6, 1),
        "train_examples_per_s": round(train_eps),
        "train_loss_last": round(float(losses[-1]), 4),
        "train_hit_rate": round(tstats.get("hit_rate", 0.0), 4),
        "infer_examples_per_s": round(n_inf / infer_s),
        "infer_hit_rate": round(istats.get("hit_rate", 0.0), 4),
    }
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
