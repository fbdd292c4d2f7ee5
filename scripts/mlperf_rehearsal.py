#!/usr/bin/env python
"""MLPerf-scale single-chip rehearsal (round 5).

Runs the MLPerf DLRM recipe shape — dim 128, 26 Terabyte tables capped at
max-ind-range 40M, bot MLP 13-512-256-128, top 1024-1024-512-256-1
(reference: bench/run_and_time.sh:17) — on ONE chip:

  1. Residency math: which tables fit in HBM at fp32/bf16 and how many
     chips full residency would need.  At this shape 5 tables are 40M rows
     = 20.5 GB fp32 EACH against v5e's 16 GB: the cache tier stops being
     an optimization and becomes the only way to train on one chip.
  2. Staged packed-layout step over the RESIDENT SUBSET (every table that
     fits next to the MLPs): the dim-128 anchor for the full train path.
  3. HBM-bounded training at the FULL shape through TrainableDeviceCache:
     master tables are SPARSE fp32 files (104 GB virtual, pages materialize
     only where written) memory-mapped read-write; the device holds only
     the cache working set.  Kaggle-scale siblings: scripts/tb_rehearsal.py
     (uniform sizes), bench.py bench_cached_training.

Usage:  python scripts/mlperf_rehearsal.py [--steps 12] [--cache-rows 4000000]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

HBM_GB = {"TPU v5 lite": 16.0}
RESERVE_GB = 1.5          # MLPs + optimizer + workspace + XLA scratch


def gen_sparse_tables(workdir: str, sizes, dim: int,
                      fresh: bool = True) -> float:
    """Create fp32 ev-table files as SPARSE files (holes read as 0.0; only
    written pages consume disk).  fresh=True recreates them zeroed — a
    leftover trained state from a previous run paired with freshly-init
    MLPs produces misleading loss trajectories.  Returns virtual GB."""
    os.makedirs(workdir, exist_ok=True)
    total = 0
    for t, n in enumerate(sizes):
        p = os.path.join(workdir, f"ev-table-{t + 1}.bin")
        nbytes = n * dim * 4
        if fresh or not (os.path.exists(p)
                         and os.path.getsize(p) == nbytes):
            with open(p, "wb") as f:
                f.truncate(nbytes)
        total += nbytes
        # momenta sparse too (from_files would materialize them zeroed)
        mp = os.path.join(workdir, f"mom-{t + 1}.bin")
        if fresh or not (os.path.exists(mp)
                         and os.path.getsize(mp) == n * 4):
            with open(mp, "wb") as f:
                f.truncate(n * 4)
    return total / 1e9


def residency_report(sizes, dim: int, hbm_gb: float) -> dict:
    """Greedy largest-first fit of fp32 tables into the usable HBM budget."""
    budget = (hbm_gb - RESERVE_GB) * 1e9
    per = [(t, n, n * dim * 4) for t, n in enumerate(sizes)]
    resident, tiered, used = [], [], 0.0
    for t, n, b in sorted(per, key=lambda x: -x[2]):
        if used + b <= budget:
            resident.append(t)
            used += b
        else:
            tiered.append({"table": t, "rows": n, "gb_fp32": round(b / 1e9, 2)})
    total_gb = sum(b for _, _, b in per) / 1e9
    return {
        "total_rows": sum(sizes),
        "total_gb_fp32": round(total_gb, 1),
        "total_gb_bf16": round(total_gb / 2, 1),
        "hbm_gb": hbm_gb,
        "resident_tables": len(resident),
        "resident_gb": round(used / 1e9, 2),
        "tables_requiring_tier": sorted(tiered, key=lambda d: d["table"]),
        "chips_for_full_residency_fp32": int(np.ceil(
            total_gb / (hbm_gb - RESERVE_GB))),
    }


def staged_subset_step(sizes, B: int, n_steps: int = 10) -> dict:
    """Staged packed-layout train step over the tables that fit resident
    (the dim-128 anchor for the full-table path)."""
    import jax
    import jax.numpy as jnp
    from evstore_tpu.config import TrainConfig, make_dlrm_config
    from evstore_tpu.models.dlrm import init_dlrm
    from evstore_tpu.models.embedding import pick_pack_factor
    from evstore_tpu.train.optim import make_pack_spec, pack_tables
    from evstore_tpu.train.train_loop import init_opt_state, make_train_step
    from bench import device_sync

    import functools
    from evstore_tpu.train.train_loop import step_jit

    # default config: the D<=64 gate in models/dlrm.interact routes dim-128
    # to the XLA interaction (the Pallas blocked kernel's Mosaic build is
    # ~353 s at F=22/D=128 with nothing to win back — EXPERIMENTS §30)
    cfg = make_dlrm_config(128, tuple(sizes), (512, 256),
                           (1024, 1024, 512, 256),
                           compute_dtype="bfloat16")
    tcfg = TrainConfig(batch_size=B, learning_rate=1.0,
                       optimizer="rwsadagrad")
    params = init_dlrm(jax.random.PRNGKey(0), cfg)
    pack_spec = make_pack_spec(params, tcfg.optimizer)
    opt = init_opt_state(params, tcfg)
    step = make_train_step(cfg, tcfg, pack=pack_spec)
    rng = np.random.default_rng(0)
    dense = jnp.asarray(rng.random((B, 13)), jnp.float32)
    idx = jnp.asarray(np.stack([rng.integers(0, s, B) for s in sizes], 1),
                      jnp.int32)
    y = jnp.asarray(rng.integers(0, 2, B), jnp.float32)

    # per-call dispatch through this tunnel costs ~0.7 s/step; n steps run
    # as ONE donated jit (static unroll — the bench.py pattern, see
    # EXPERIMENTS §21) so the slope measures device time
    @functools.partial(step_jit, static_argnums=(2,), donate_argnums=(0, 1))
    def run_n(p, o, n):
        loss = None
        for _ in range(n):
            p, o, loss = step(p, o, dense, idx, y)
        return p, o, loss

    def fresh():
        p = init_dlrm(jax.random.PRNGKey(0), cfg)
        o = init_opt_state(p, tcfg)
        return pack_tables(p, o, pack_spec)

    p, o = fresh()
    device_sync(run_n(p, o, 3)[2])       # compile both unrolls + warm
    p, o = fresh()
    device_sync(run_n(p, o, 3 + n_steps)[2])
    ts = {}
    for n in (3, 3 + n_steps):
        best = float("inf")
        for _ in range(2):
            p, o = fresh()
            t0 = time.perf_counter()
            device_sync(run_n(p, o, n)[2])
            best = min(best, time.perf_counter() - t0)
        ts[n] = best
    step_s = (ts[3 + n_steps] - ts[3]) / n_steps
    return {"batch": B, "step_ms": round(step_s * 1e3, 2),
            "examples_per_s": round(B / step_s),
            "pack_factors": {f"t{t}": pick_pack_factor(s, 128)
                             for t, s in enumerate(sizes)
                             if pick_pack_factor(s, 128) > 1}}


def cached_training_full_shape(workdir: str, sizes, B: int, steps: int,
                               cache_rows: int, zipf: float,
                               seed: int = 0) -> dict:
    import jax
    from evstore_tpu.cache.trainable import TrainableDeviceCache
    from evstore_tpu.config import CacheConfig, TrainConfig, mlperf_dlrm_config

    cfg = mlperf_dlrm_config()
    assert tuple(cfg.table_sizes) == tuple(sizes)
    # lr 0.1: the recipe's lr=1.0 belongs with its warmup schedule; bare
    # rwsadagrad at 1.0 on a synthetic stream diverges
    tcfg = TrainConfig(batch_size=B, learning_rate=0.1,
                       optimizer="rwsadagrad")
    ccfg = CacheConfig(policy="evlfu", total_size=cache_rows,
                       main_precision=32)
    # insert_bucket pins the padded miss-buffer size Mp to one value across
    # steps: with the default 2048 buckets, M (~19k at this hit rate)
    # drifts across bucket boundaries and every distinct Mp recompiles a
    # 2 GB-cache dim-128 program (~40 s each — measured; that, not the
    # step, dominated the first run of this script)
    tc = TrainableDeviceCache.from_files(cfg, tcfg, ccfg, workdir,
                                         list(sizes), insert_bucket=16384)
    import jax.numpy as jnp
    from evstore_tpu.config import make_dlrm_config
    from evstore_tpu.models.dlrm import init_dlrm
    # dense MLP params only: init a 1-row-table twin (identical MLP shapes;
    # init_dlrm on the real config would materialize 104 GB of tables)
    twin = make_dlrm_config(128, tuple([1] * len(sizes)), (512, 256),
                            (1024, 1024, 512, 256))
    params = init_dlrm(jax.random.PRNGKey(seed), twin)
    dense = params.dense
    dstate = jax.tree_util.tree_map(
        lambda p: jnp.zeros_like(p, dtype=jnp.float32), dense)
    rng = np.random.default_rng(seed + 1)

    def batch():
        z = rng.zipf(zipf, (B, len(sizes))) - 1
        idx = np.stack([z[:, t] % s for t, s in enumerate(sizes)],
                       1).astype(np.int64)
        dx = rng.random((B, 13), np.float32)
        y = rng.integers(0, 2, B).astype(np.float32)
        return dx, idx, y

    # warm-up: the first steps compile one program per padded-miss tier as
    # M descends with the filling cache, and materialize fresh sparse-file
    # pages; exclude them
    warm = 5
    for k in range(warm):
        dx, idx, y = batch()
        dense, dstate, loss = tc.train_batch(dense, dstate, k, dx, idx, y)
        jax.block_until_ready(loss)
    per_step, losses = [], []
    for k in range(warm, warm + steps):
        dx, idx, y = batch()
        t1 = time.perf_counter()
        dense, dstate, loss = tc.train_batch(dense, dstate, k, dx, idx, y)
        lv = float(loss)        # real device->host readback fences the step
        per_step.append(time.perf_counter() - t1)
        losses.append(lv)
    # steady state = the back half (early steps recompile at each new
    # padded-miss tier and fill the cache)
    back = per_step[len(per_step) // 2:]
    med = float(np.median(back))
    tc.flush_files()
    st = tc.stats()
    tc.close()
    # transfer budget: what moves host<->device per step, and what the same
    # loop costs on attached hardware (the hybrid_tiers assigner-ceiling
    # methodology, bench.py:465)
    mp = 32768 if B * len(sizes) > 32768 else B * len(sizes)
    step_bytes = 2 * mp * (128 + 1) * 4        # buf+mom up, new_buf+mom down
    return {
        "batch": B, "steps": steps,
        "examples_per_s": round(B / med),
        "step_ms_median_steady": round(med * 1e3, 1),
        "step_ms_best": round(min(per_step) * 1e3, 1),
        "step_ms_all": [round(s * 1e3, 1) for s in per_step],
        "hit_rate": round(st.get("hit_rate", 0.0), 4),
        "hbm_cache_mb": round(cache_rows * (128 + 1) * 4 / 1e6, 1),
        "hbm_cache_vs_tables_pct": round(
            cache_rows * 100.0 / sum(sizes), 2),
        "transfer_mb_per_step": round(step_bytes / 1e6, 1),
        "attached_pcie_floor_ms": round(step_bytes / 16e9 * 1e3, 1),
        "loss_last": round(losses[-1], 4),
    }


def run(workdir: str, B: int, steps: int, cache_rows: int, zipf: float,
        subset_batch: int, hbm_gb: float | None = None) -> dict:
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.path.dirname(os.path.dirname(os.path.abspath(
                          __file__))) + "/.jax_cache")
    from evstore_tpu.config import mlperf_dlrm_config

    cfg = mlperf_dlrm_config()
    sizes = list(cfg.table_sizes)
    dev = jax.devices()[0]
    hbm = hbm_gb or HBM_GB.get(dev.device_kind, 16.0)
    out = {"recipe": "dim128 bot13-512-256-128 top1024-1024-512-256-1 "
                     "max-ind-range 40M (run_and_time.sh:17)"}
    out["residency"] = residency_report(sizes, 128, hbm)
    # multi-chip: 8-way ROW-sharding (parallel/sharded.py; tablewise
    # butterfly canNOT fit — one 40M table is 20.5 GB whole) holds the
    # full shape resident; per-device = table rows/8 * (row + rwsadagrad
    # scalar).  dryrun_multichip (4b) compiles+runs this program at
    # scaled rows on the virtual mesh.
    per_dev = sum(-(-s // 8) * (128 * 4 + 4) for s in sizes) / 1e9
    out["sharded_residency_8chip"] = {
        "impl": "row-sharded psum (n_model=8)",
        "per_device_gb": round(per_dev, 2),
        "fits_16gb_chip": per_dev <= hbm - RESERVE_GB,
        "note": "tablewise butterfly cannot place a 20.5 GB table whole",
    }
    resident_sizes = [s for t, s in enumerate(sizes)
                      if t not in {d["table"]
                                   for d in out["residency"]
                                   ["tables_requiring_tier"]}]
    out["staged_resident_subset"] = staged_subset_step(resident_sizes,
                                                       subset_batch)
    virt_gb = gen_sparse_tables(workdir, sizes, 128)
    out["master_tables_virtual_gb"] = round(virt_gb, 1)
    out["cached_training_full_shape"] = cached_training_full_shape(
        workdir, sizes, B, steps, cache_rows, zipf)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", default="/tmp/evstore_mlperf")
    ap.add_argument("--batch", type=int, default=2048)
    ap.add_argument("--subset-batch", type=int, default=8192)
    ap.add_argument("--steps", type=int, default=12)
    ap.add_argument("--cache-rows", type=int, default=4_000_000)
    ap.add_argument("--zipf", type=float, default=1.05)
    args = ap.parse_args()
    out = run(args.workdir, args.batch, args.steps, args.cache_rows,
              args.zipf, args.subset_batch)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
