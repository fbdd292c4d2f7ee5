"""A/B of the fused Pallas rwsadagrad update vs the XLA rep-trick lowering,
solo table AND 5-tables-in-one-program (the flagship step shape).

Fenced + slope methodology (bench.py:13-27).  Run on the real chip.
Usage: python scripts/bench_pallas_update.py
"""
import functools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax import lax

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))

from bench import device_sync
from evstore_tpu.ops.pallas_update import (rwsadagrad_apply_sorted_ref,
                                           rwsadagrad_row_update_pallas)
from evstore_tpu.train import optim


def slope(run, lo, hi, reps=3):
    run(lo)
    ts = {}
    for n in (lo, hi):
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            run(n)
            best = min(best, time.perf_counter() - t0)
        ts[n] = best
    return (ts[hi] - ts[lo]) / (hi - lo)


def main():
    rng = np.random.default_rng(0)
    N, D, B, T5 = 1_000_000, 36, 32768, 5
    table = jnp.asarray(rng.uniform(-0.1, 0.1, (N, D)).astype(np.float32)
                        ).astype(jnp.bfloat16)
    state = jnp.zeros((N,), jnp.float32)
    ids = jnp.asarray(rng.integers(0, N, B), jnp.int32)
    g = jnp.asarray(rng.normal(0, 1e-3, (B, D)).astype(np.float32))

    # correctness on-chip vs reference
    ref_t, ref_s = jax.jit(rwsadagrad_apply_sorted_ref)(table, state, ids,
                                                        g, 0.1)
    new_s, new_t = rwsadagrad_row_update_pallas(state, table, ids, g, 0.1)
    np.testing.assert_allclose(np.asarray(new_s), np.asarray(ref_s),
                               rtol=1e-4, atol=1e-7)
    np.testing.assert_allclose(np.asarray(new_t, dtype=np.float32),
                               np.asarray(ref_t, dtype=np.float32),
                               rtol=1e-2, atol=1e-3)
    print("on-chip parity OK", flush=True)

    out = {}

    def one_table(update_fn, name):
        @functools.partial(jax.jit, static_argnums=(2,))
        def run(table, state, n):
            def body(c, _):
                t, s = c
                eps = t[0, 0].astype(jnp.float32) * 1e-30
                s2, t2 = update_fn(s, t, ids, g + eps, 0.1)
                return (t2, s2), None
            (t, s), _ = lax.scan(body, (table, state), None, length=n)
            return jnp.sum(t.astype(jnp.float32)) + jnp.sum(s)

        ms = slope(lambda n: device_sync(run(table, state, n)), 4, 16) * 1e3
        out[name] = ms
        print(f"{name:22s} {ms:8.2f} ms", flush=True)

    ids5 = {k: jnp.asarray(rng.integers(0, N, B), jnp.int32)
            for k in range(T5)}
    g5 = {k: jnp.asarray(rng.normal(0, 1e-3, (B, D)).astype(np.float32))
          for k in range(T5)}
    tabs5 = {k: (jnp.asarray(rng.uniform(-0.1, 0.1, (N, D))
                             .astype(np.float32)).astype(jnp.bfloat16))
             for k in range(T5)}
    sts5 = {k: jnp.zeros((N,), jnp.float32) for k in range(T5)}

    def five_tables(update_fn, name):
        @functools.partial(jax.jit, static_argnums=(2,))
        def run(tabs, sts, n):
            def body(c, _):
                ts_, ss_ = c
                eps = ts_[0][0, 0].astype(jnp.float32) * 1e-30
                nt, ns = {}, {}
                for k in range(T5):
                    s2, t2 = update_fn(ss_[k], ts_[k], ids5[k],
                                       g5[k] + eps, 0.1)
                    nt[k], ns[k] = t2, s2
                return (nt, ns), None
            (ts_, ss_), _ = lax.scan(body, (tabs, sts), None, length=n)
            return (sum(jnp.sum(v.astype(jnp.float32)) for v in ts_.values())
                    + sum(jnp.sum(v) for v in ss_.values()))

        ms = slope(lambda n: device_sync(run(tabs5, sts5, n)), 4, 16) * 1e3
        out[name] = ms
        print(f"{name:22s} {ms:8.2f} ms", flush=True)

    def xla_update(s, t, i, gg, lr):
        return optim.row_update("rwsadagrad", s, t, i, gg, lr)

    def pallas_update(s, t, i, gg, lr):
        return rwsadagrad_row_update_pallas(s, t, i, gg, lr)

    # sweep-only diagnostic: every update PAD -> all tiles empty; cost =
    # table+state r/w pipeline alone (the bandwidth floor of the kernel)
    pad_ids = jnp.full((B,), np.iinfo(np.int32).max, jnp.int32)

    def pallas_sweep_only(s, t, i, gg, lr):
        return rwsadagrad_row_update_pallas(s, t, pad_ids, gg, lr)

    one_table(pallas_update, "pallas_1x1M")
    one_table(pallas_sweep_only, "pallas_sweep_only")
    one_table(xla_update, "xla_1x1M")
    five_tables(pallas_update, "pallas_5x1M")
    five_tables(xla_update, "xla_5x1M")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
