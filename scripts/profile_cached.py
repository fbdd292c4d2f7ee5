"""Phase breakdown of HBM-bounded cached training (VERDICT r2 item 3:
BENCH_r02 shows windowed 1.10x vs per-batch where DESIGN §11 claims 2.4x —
find where window time actually goes).

Phases timed (wall, host side, with device fences where noted):
  tunnel    h2d/d2h bandwidth + roundtrip of this environment
  plan      host assigner/tracker window build (_build_window)
  fetch     DRAM miss-row gather + pack (_fetch_into)
  dispatch  _dispatch_window host time (upload + enqueue; async)
  land      _land_window wall (the packed download transfer = THE fence)
  device    inferred: window wall - plan - fetch - land

Runs the exact bench_cached_training regime (B=2048, cache 500k rows,
zipf 1.1, W=16, 7 windows).

Usage: python scripts/profile_cached.py
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))
    from bench import device_sync
    from evstore_tpu.cache.trainable import TrainableDeviceCache
    from evstore_tpu.config import (CacheConfig, TrainConfig,
                                    kaggle_small_dlrm_config)
    from evstore_tpu.data.synthetic import RandomDataConfig, random_batches
    from evstore_tpu.models.dlrm import init_dlrm

    out = {}

    # --- tunnel characterization ---
    rtt = []
    for _ in range(5):
        x = jnp.zeros((8, 128), jnp.float32) + 1
        t0 = time.perf_counter()
        np.asarray(x)
        rtt.append(time.perf_counter() - t0)
    out["tunnel_rtt_ms"] = float(np.median(rtt) * 1e3)
    for mb in (1, 16, 64):
        n = mb * (1 << 20) // 4
        h = np.random.default_rng(0).random(n).astype(np.float32)
        t0 = time.perf_counter()
        d = jax.device_put(h)
        device_sync(d[0])   # ensure it landed
        h2d = time.perf_counter() - t0
        t0 = time.perf_counter()
        np.asarray(d)
        d2h = time.perf_counter() - t0
        out[f"h2d_MBps_{mb}MB"] = mb / h2d
        out[f"d2h_MBps_{mb}MB"] = mb / d2h
        print(f"tunnel {mb:3d} MB: h2d {mb/h2d:8.1f} MB/s   "
              f"d2h {mb/d2h:8.1f} MB/s", flush=True)
    print(f"tunnel rtt {out['tunnel_rtt_ms']:.1f} ms", flush=True)

    # --- windowed cached training phases ---
    cfg = kaggle_small_dlrm_config(max_rows=1_000_000,
                                   compute_dtype="bfloat16")
    B, W, NW = 2048, 16, 7
    rng = np.random.default_rng(0)
    tables = [np.asarray(rng.uniform(-0.1, 0.1, (min(s, 500_000),
                                                 cfg.embedding_dim)),
                         np.float32) for s in cfg.table_sizes]
    sizes = [t.shape[0] for t in tables]
    tcfg = TrainConfig(batch_size=B, learning_rate=0.1,
                       optimizer="rwsadagrad")
    ccfg = CacheConfig(policy="evlfu", total_size=500_000, main_precision=32)
    tc = TrainableDeviceCache(cfg, tcfg, ccfg, tables, insert_bucket=8192)
    params = init_dlrm(jax.random.PRNGKey(0), cfg)
    dense = params.dense
    dstate = jax.tree_util.tree_map(
        lambda p: jnp.zeros_like(p, dtype=jnp.float32), params.dense)
    dcfg = RandomDataConfig(num_dense=cfg.num_dense_features,
                            table_sizes=sizes, batch_size=B,
                            num_batches=NW * W, seed=4,
                            distribution="zipf", zipf_alpha=1.1)
    batches = list(random_batches(dcfg))

    if not hasattr(tc, "_step_window"):
        tc._step_window = tc._build_step_window()
    step_idx = 1
    prev_state = {}
    pending = None
    rows = []
    for w in range(NW):
        bl = batches[w * W:(w + 1) * W]
        t_w0 = time.perf_counter()
        t0 = time.perf_counter()
        plan = tc._plan_window(bl, step_idx, prev_state)
        t_plan = time.perf_counter() - t0
        t_land = t_fetch = 0.0
        if pending is not None:
            t0 = time.perf_counter()
            tc._land_window(pending)
            t_land = time.perf_counter() - t0
            if plan["dirty"][0]:
                t0 = time.perf_counter()
                tc._fetch_into(plan["U0"], plan["Um0"], *plan["dirty"])
                t_fetch = time.perf_counter() - t0
        t0 = time.perf_counter()
        dense, dstate, pending = tc._dispatch_window(plan, dense, dstate)
        t_disp = time.perf_counter() - t0
        wall = time.perf_counter() - t_w0
        rows.append({"window": w, "plan_ms": t_plan * 1e3,
                     "land_ms": t_land * 1e3, "fetch_ms": t_fetch * 1e3,
                     "dispatch_ms": t_disp * 1e3, "wall_ms": wall * 1e3,
                     "n_fetch": int(len(plan["dirty"][0]) if plan["dirty"][0]
                                    else 0)})
        print(f"w{w}: plan {t_plan*1e3:7.1f}  land {t_land*1e3:7.1f}  "
              f"fetch {t_fetch*1e3:7.1f}  dispatch {t_disp*1e3:7.1f}  "
              f"wall {wall*1e3:7.1f} ms", flush=True)
        prev_state = plan["state"]
        step_idx += W
    t0 = time.perf_counter()
    tc._land_window(pending)
    t_last = time.perf_counter() - t0
    print(f"final land (window exec + download): {t_last*1e3:.1f} ms",
          flush=True)
    out["windows"] = rows
    out["final_land_ms"] = t_last * 1e3
    # steady-state per-batch cost estimate from the last 3 windows
    steady = rows[-3:]
    tot = sum(r["wall_ms"] for r in steady) / (3 * W)
    out["steady_per_batch_ms_host_side"] = tot
    print(f"steady host-side per-batch: {tot:.1f} ms "
          f"(+ device exec overlapped)", flush=True)
    tc.close()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
