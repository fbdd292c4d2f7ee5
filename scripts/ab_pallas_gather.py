"""A/B: Pallas DMA row-gather vs XLA gather in the MODEL path, end-to-end.

The kernel-level win (~5-10% gather bandwidth on v5e, bench.py) does not
automatically survive in the whole program — pallas_call is a fusion
barrier (see the dot-interaction postmortem, DESIGN.md §6).  This measures
the jitted train step and eval step with cfg.use_pallas_gather off/on for a
dim-128 (MLPerf-recipe, bench/run_and_time.sh:17) model where the row is
128-lane aligned.

Usage: python scripts/ab_pallas_gather.py [--batch 8192] [--steps 30]
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def bench_variant(cfg, tcfg, B, steps, seed=0):
    import jax
    import jax.numpy as jnp
    from evstore_tpu.models.dlrm import init_dlrm
    from evstore_tpu.train.train_loop import (init_opt_state, make_eval_step,
                                              make_train_step)

    params = init_dlrm(jax.random.PRNGKey(seed), cfg)
    opt = init_opt_state(params, tcfg)
    step = jax.jit(make_train_step(cfg, tcfg), donate_argnums=(0, 1))
    ev = make_eval_step(cfg)
    rng = np.random.default_rng(seed)
    dx = jnp.asarray(rng.random((B, cfg.num_dense_features), np.float32))
    idx = jnp.asarray(np.stack([rng.integers(0, s, B)
                                for s in cfg.table_sizes], 1), jnp.int32)
    y = jnp.asarray(rng.integers(0, 2, B).astype(np.float32))

    params, opt, loss = step(params, opt, dx, idx, y)   # compile
    jax.block_until_ready(loss)
    t0 = time.perf_counter()
    for _ in range(steps):
        params, opt, loss = step(params, opt, dx, idx, y)
    jax.block_until_ready(loss)
    train_eps = steps * B / (time.perf_counter() - t0)

    s = ev(params, dx, idx)
    jax.block_until_ready(s)
    t0 = time.perf_counter()
    for _ in range(steps):
        s = ev(params, dx, idx)
    jax.block_until_ready(s)
    eval_eps = steps * B / (time.perf_counter() - t0)
    return train_eps, eval_eps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8192)
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--rows", type=int, default=1_000_000)
    ap.add_argument("--tables", type=int, default=26)
    ap.add_argument("--dim", type=int, default=128)
    args = ap.parse_args()

    from evstore_tpu.config import TrainConfig, make_dlrm_config

    base = make_dlrm_config(args.dim, [args.rows] * args.tables,
                            [512, 256], [1024, 1024, 512, 256],
                            num_dense=13, compute_dtype="bfloat16")
    tcfg = TrainConfig(batch_size=args.batch, learning_rate=0.1,
                       optimizer="rwsadagrad")

    out = {}
    for name, flag in (("xla", False), ("pallas", True)):
        cfg = dataclasses.replace(base, use_pallas_gather=flag)
        tr, evl = bench_variant(cfg, tcfg, args.batch, args.steps)
        out[f"train_eps_{name}"] = round(tr)
        out[f"eval_eps_{name}"] = round(evl)
        print(f"{name}: train {tr:.0f} ex/s, eval {evl:.0f} ex/s")
    out["train_speedup"] = round(out["train_eps_pallas"]
                                 / out["train_eps_xla"], 4)
    out["eval_speedup"] = round(out["eval_eps_pallas"]
                                / out["eval_eps_xla"], 4)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
