"""A/B the big-table gather front of the train step (round-3 lever #1).

The §17 decomposition shows ~14 ms of the B=32768 step in 26 serialized
row gathers (~17 ns/row each, table-size independent).  Tiny tables
(N <= 2048) already take the one-hot MXU lowering; this script measures,
fenced+sloped on the real chip, the remaining candidates for the BIG
tables (N > 2048):

  sep        one jnp.take per big table (current train-step lowering)
  mega       ONE jnp.take over the concatenated [sum(N), D] mega-table
             with offset-shifted ids (one gather op instead of 12)
  pallas_sep one pallas gather_rows call per big table
  pallas_mega ONE pallas gather_rows call over the mega-table
  onehot_mid one-hot MXU matmul for the MID tables (2048 < N <= 16384)
             + jnp.take for the rest (crossover probe at this B)

Usage: python scripts/ab_gather_front.py [--batch 65536]
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
    ap.add_argument("--max-rows", type=int, default=1_000_000)
    args = ap.parse_args()
    B = args.batch

    import jax
    import jax.numpy as jnp
    from jax import lax
    jax.config.update("jax_compilation_cache_dir",
                      os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
                      + "/.jax_cache")
    from evstore_tpu.config import kaggle_small_dlrm_config
    from evstore_tpu.models.embedding import ONEHOT_GATHER_MAX_ROWS
    from evstore_tpu.ops import pallas_gather

    cfg = kaggle_small_dlrm_config(max_rows=args.max_rows)
    D = cfg.embedding_dim
    big = [(t, n) for t, n in enumerate(cfg.table_sizes)
           if n > ONEHOT_GATHER_MAX_ROWS]
    print(f"big tables: {len(big)} of {cfg.num_tables}; "
          f"rows {sum(n for _, n in big):,}", flush=True)

    rng = np.random.default_rng(0)
    tabs = [jnp.asarray(rng.standard_normal((n, D), np.float32) * 0.01)
            for _, n in big]
    ids = [jnp.asarray(rng.integers(0, n, B, np.int64).astype(np.int32))
           for _, n in big]

    offs = np.concatenate([[0], np.cumsum([n for _, n in big])])
    mega = jnp.concatenate(tabs, axis=0)
    gids = jnp.concatenate([i + int(o) for i, o in zip(ids, offs[:-1])])

    out = {}

    def run(name, fn, *xs, n_lo=5, n_hi=20):
        @functools.partial(jax.jit, static_argnums=(len(xs),))
        def n_steps(*a):
            *arrs, n = a

            def body(acc, _):
                z = jnp.int32(acc * 1e-30)
                return acc + fn(z, *arrs) * 1e-20, None
            acc, _ = lax.scan(body, jnp.float32(0), None, length=n)
            return acc
        ms = slope_time(lambda n: device_sync(n_steps(*xs, n)),
                        n_lo, n_hi) * 1e3
        out[name] = ms
        print(f"{name:12s} {ms:8.2f} ms", flush=True)

    # --- sep: one take per big table
    def sep(z, *arrs):
        k = len(big)
        s = jnp.float32(0)
        for t in range(k):
            rows = jnp.take(arrs[t], arrs[k + t] + z, axis=0)
            s = s + jnp.sum(rows)
        return s
    run("sep", sep, *tabs, *ids)

    # --- mega: one take over the concatenated table
    def megaf(z, mega, gids):
        rows = jnp.take(mega, gids + z, axis=0)
        return jnp.sum(rows)
    run("mega", megaf, mega, gids)

    # --- pallas sep / mega (pad D to 128 lanes is NOT needed: gather_rows
    # DMAs [1, D] fp32 rows; D=36 rows are sublane-aligned for f32)
    def psep(z, *arrs):
        k = len(big)
        s = jnp.float32(0)
        for t in range(k):
            rows = pallas_gather.gather_rows(arrs[t], arrs[k + t] + z)
            s = s + jnp.sum(rows)
        return s
    try:
        run("pallas_sep", psep, *tabs, *ids)
    except Exception as e:  # noqa: BLE001
        print(f"pallas_sep failed: {type(e).__name__}: {e}", flush=True)

    def pmega(z, mega, gids):
        rows = pallas_gather.gather_rows(mega, gids + z)
        return jnp.sum(rows)
    try:
        run("pallas_mega", pmega, mega, gids)
    except Exception as e:  # noqa: BLE001
        print(f"pallas_mega failed: {type(e).__name__}: {e}", flush=True)

    # --- one-hot for the mid tables
    for cut in (8192, 16384):
        def oh_mid(z, *arrs, cut=cut):
            k = len(big)
            s = jnp.float32(0)
            for t, (_, n) in enumerate(big):
                tab, i = arrs[t], arrs[k + t] + z
                if n <= cut:
                    ohm = (i[:, None] == jnp.arange(n, dtype=jnp.int32)[None, :]
                           ).astype(tab.dtype)
                    rows = jnp.dot(ohm, tab,
                                   preferred_element_type=jnp.float32)
                else:
                    rows = jnp.take(tab, i, axis=0)
                s = s + jnp.sum(rows)
            return s
        run(f"onehot<={cut}", oh_mid, *tabs, *ids)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
