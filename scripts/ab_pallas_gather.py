"""A/B: Pallas DMA row-gather vs XLA gather in the MODEL path, end-to-end.

The kernel-level win (~5-10% gather bandwidth on v5e, bench.py) does not
automatically survive in the whole program — pallas_call is a fusion
barrier (see the dot-interaction postmortem, DESIGN.md §6).  This measures
the jitted train step and eval step with cfg.use_pallas_gather off/on for a
dim-128 (MLPerf-recipe, bench/run_and_time.sh:17) model where the row is
128-lane aligned.

TIMING: fenced + slope (bench.py:13-27 methodology — block_until_ready
returns at enqueue-ack on this tunnel, so every window ends with a REAL
device->host transfer of a value depending on the last step, and the
reported time is the two-window slope (t_hi - t_lo)/(n_hi - n_lo), which
cancels the tunnel/dispatch constant).  The pre-round-3 version of this
script timed with bare block_until_ready; those numbers were dispatch
rates (VERDICT r2 weak #1) and have been purged from EXPERIMENTS §9.

Usage: python scripts/ab_pallas_gather.py [--batch 8192]
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

from bench import device_sync


def _slope(run_n, n_lo, n_hi, reps=3):
    run_n(n_lo)  # compile + warm
    ts = {}
    for n in (n_lo, n_hi):
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            run_n(n)
            best = min(best, time.perf_counter() - t0)
        ts[n] = best
    return (ts[n_hi] - ts[n_lo]) / (n_hi - n_lo)


def bench_variant(cfg, tcfg, B, n_lo=8, n_hi=24, seed=0):
    import jax
    import jax.numpy as jnp
    from evstore_tpu.models.dlrm import init_dlrm
    from evstore_tpu.train.train_loop import (init_opt_state, make_eval_step,
                                              make_train_step)

    step = jax.jit(make_train_step(cfg, tcfg), donate_argnums=(0, 1))
    ev = make_eval_step(cfg)
    rng = np.random.default_rng(seed)
    dx = jnp.asarray(rng.random((B, cfg.num_dense_features), np.float32))
    idx = jnp.asarray(np.stack([rng.integers(0, s, B)
                                for s in cfg.table_sizes], 1), jnp.int32)
    y = jnp.asarray(rng.integers(0, 2, B).astype(np.float32))

    def run_train(n):
        # fresh buffers each window (donation consumes them); init cost is a
        # per-window constant the slope cancels
        params = init_dlrm(jax.random.PRNGKey(seed), cfg)
        opt = init_opt_state(params, tcfg)
        loss = None
        for _ in range(n):
            params, opt, loss = step(params, opt, dx, idx, y)
        device_sync(loss)   # real transfer fences the chain

    train_eps = B / _slope(run_train, n_lo, n_hi)

    eparams = init_dlrm(jax.random.PRNGKey(seed), cfg)

    def run_eval(n):
        s = None
        for _ in range(n):
            s = ev(eparams, dx, idx)
        device_sync(s[0])

    eval_eps = B / _slope(run_eval, n_lo, n_hi)
    return train_eps, eval_eps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8192)
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
        tr, evl = bench_variant(cfg, tcfg, args.batch)
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
