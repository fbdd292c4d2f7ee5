"""A/B bf16 vs f32 embedding-table storage (param_dtype) in the full step.

TPU-first rationale: bf16 is the TPU's native storage dtype; the step's
two biggest fronts (the dense-pass sparse updates and the row gathers)
are HBM-traffic-bound in proportion to the table byte size, so halving
the tables should cut both.  RWSAdagrad state stays f32 (the state sum
is accumulated in f32 regardless of table dtype — optim.row_update).

Prints, fenced+sloped on the real chip at the headline batch:
  full-step ms for param_dtype in {float32, bfloat16}
and a quality check: final AUC on the learnable fixture for both.

Usage: python scripts/ab_param_dtype.py [--batch 65536]
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import device_sync


def slope_time(run_n, n_lo=5, n_hi=20, reps=3):
    run_n(n_lo)
    ts = {}
    for n in (n_lo, n_hi):
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            run_n(n)
            best = min(best, time.perf_counter() - t0)
        ts[n] = best
    return (ts[n_hi] - ts[n_lo]) / (n_hi - n_lo)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=65536)
    ap.add_argument("--skip-quality", action="store_true")
    args = ap.parse_args()
    B = args.batch

    import jax
    import jax.numpy as jnp
    from jax import lax
    jax.config.update("jax_compilation_cache_dir",
                      os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
                      + "/.jax_cache")
    from evstore_tpu.config import TrainConfig, kaggle_small_dlrm_config
    from evstore_tpu.models.dlrm import init_dlrm
    from evstore_tpu.train.train_loop import init_opt_state, make_train_step

    rng = np.random.default_rng(0)
    out = {}

    for pdt in ("float32", "bfloat16"):
        cfg = kaggle_small_dlrm_config(max_rows=1_000_000,
                                       compute_dtype="bfloat16",
                                       param_dtype=pdt)
        tcfg = TrainConfig(batch_size=B, learning_rate=0.1,
                           optimizer="rwsadagrad")
        dx = jnp.asarray(rng.random((B, cfg.num_dense_features), np.float32))
        idx = jnp.asarray(np.stack([rng.integers(0, s, B)
                                    for s in cfg.table_sizes], 1), jnp.int32)
        y = jnp.asarray(rng.integers(0, 2, B).astype(np.float32))
        params = init_dlrm(jax.random.PRNGKey(0), cfg)
        opt_state = init_opt_state(params, tcfg)
        step = make_train_step(cfg, tcfg)

        @functools.partial(jax.jit, static_argnums=(2,))
        def full_n(params, opt_state, n, step=step, dx=dx, idx=idx, y=y):
            def body(c, _):
                p, o = c
                p, o, loss = step(p, o, dx, idx, y)
                return (p, o), loss
            (p, o), losses = lax.scan(body, (params, opt_state), None,
                                      length=n)
            return losses[-1]

        ms = slope_time(
            lambda n: device_sync(full_n(params, opt_state, n)), 5, 20) * 1e3
        out[f"step_ms_{pdt}"] = ms
        print(f"{pdt:9s} full step {ms:8.2f} ms  "
              f"({B/ms*1e3:,.0f} ex/s)", flush=True)

    if not args.skip_quality:
        from evstore_tpu.config import tiny_dlrm_config
        from evstore_tpu.data.synthetic import RandomDataConfig, learnable_batches
        from evstore_tpu.train.train_loop import train, evaluate
        for pdt in ("float32", "bfloat16"):
            cfg = tiny_dlrm_config()
            import dataclasses
            cfg = dataclasses.replace(cfg, param_dtype=pdt)
            dcfg = RandomDataConfig(num_dense=cfg.num_dense_features,
                                    table_sizes=cfg.table_sizes,
                                    batch_size=128, num_batches=200)
            tcfg = TrainConfig(batch_size=128, learning_rate=0.2,
                               optimizer="rwsadagrad")
            params = init_dlrm(jax.random.PRNGKey(1), cfg)
            params, _, _ = train(params, cfg, tcfg, learnable_batches(dcfg))
            m = evaluate(params, cfg, learnable_batches(dcfg))
            out[f"auc_{pdt}"] = m["auc"]
            print(f"{pdt:9s} learnable-fixture AUC {m['auc']:.4f}", flush=True)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
