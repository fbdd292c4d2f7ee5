"""Fine-grained breakdown of the sparse-update cost (VERDICT r2 item 1).

The B=32768 kaggle-small(1M) step spends ~37 ms (in-program) / ~80 ms
(standalone) in the 26-table rwsadagrad update.  This script times, fenced
+slope (bench.py methodology), each lowering component on the real chip:

  small_all      the 21 dense-grad tables (N*D*4 <= 64 MB), full update
  big_all        the 5 rep-trick tables (1M rows each), full update
  big_slot       [1M] slot-map build only (D=1 scatter of 32k ids)
  big_coalesce   slot + rep + segment_sum (the dedup) only
  big_apply      full-pass apply only (precomputed position map + Gc)
  small_G        dense-grad G construction only (zeros.at[ids].add)
  small_apply    full-pass apply from precomputed G
  big_bf16       rep-trick with bf16 G pipeline (halved G traffic)

Every scan body is carry-perturbed and fully reduced (no hoisting/DCE —
see profile_train_step.py).

Usage: python scripts/profile_update.py [--batch 32768]
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


def slope_time(run_n, n_lo, n_hi, reps=3):
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
    ap.add_argument("--batch", type=int, default=32768)
    args = ap.parse_args()
    B = args.batch

    import jax
    import jax.numpy as jnp
    from jax import lax
    jax.config.update("jax_compilation_cache_dir",
                      os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
                      + "/.jax_cache")
    from evstore_tpu.config import kaggle_small_dlrm_config
    from evstore_tpu.train import optim

    cfg = kaggle_small_dlrm_config(max_rows=1_000_000,
                                   compute_dtype="bfloat16")
    D = cfg.embedding_dim
    sizes = list(cfg.table_sizes)
    lim = optim.DENSE_GRAD_LIMIT_BYTES
    small_ts = [i for i, s in enumerate(sizes) if s * D * 4 <= lim]
    big_ts = [i for i, s in enumerate(sizes) if s * D * 4 > lim]
    print(f"small(dense-grad): {len(small_ts)} tables, "
          f"{sum(sizes[i] for i in small_ts):,} rows; "
          f"big(rep-trick): {len(big_ts)} tables, "
          f"{sum(sizes[i] for i in big_ts):,} rows", flush=True)

    rng = np.random.default_rng(0)
    idx = {i: jnp.asarray(rng.integers(0, sizes[i], B), jnp.int32)
           for i in range(len(sizes))}
    g0 = {i: jnp.asarray(rng.normal(0, 1e-3, (B, D)).astype(np.float32))
          for i in range(len(sizes))}
    tabs0 = {i: jnp.asarray(rng.uniform(-0.01, 0.01, (sizes[i], D))
                            .astype(np.float32)).astype(jnp.bfloat16)
             for i in range(len(sizes))}
    st0 = {i: jnp.zeros((sizes[i],), jnp.float32) for i in range(len(sizes))}

    out = {}

    def timed(name, fn, n_lo=4, n_hi=16):
        out[name] = slope_time(fn, n_lo, n_hi) * 1e3
        print(f"{name:14s} {out[name]:8.2f} ms", flush=True)

    def full_update_group(group):
        @functools.partial(jax.jit, static_argnums=(2,))
        def run(tabs, sts, n):
            def body(c, _):
                t_, s_ = c
                eps = (t_[group[0]][0, 0].astype(jnp.float32)) * 1e-30
                nt, ns = {}, {}
                for i in group:
                    s2, t2 = optim.row_update("rwsadagrad", s_[i], t_[i],
                                              idx[i], g0[i] + eps, 0.1)
                    nt[i], ns[i] = t2, s2
                return (nt, ns), None
            (t_, s_), _ = lax.scan(body, (tabs, sts), None, length=n)
            return (sum(jnp.sum(v.astype(jnp.float32)) for v in t_.values())
                    + sum(jnp.sum(v) for v in s_.values()))
        tt = {i: tabs0[i] for i in group}
        ss = {i: st0[i] for i in group}
        return lambda n: device_sync(run(tt, ss, n))

    timed("small_all", full_update_group(small_ts))
    timed("big_all", full_update_group(big_ts))

    # ---- big-table sub-components (per the rep-trick lowering) ----
    bi = big_ts[0]
    N = sizes[bi]

    @functools.partial(jax.jit, static_argnums=(1,))
    def big_slot_n(acc0, n):
        def body(acc, _):
            z = jnp.int32(acc * 1e-30)
            slots = []
            for i in big_ts:
                slot = jnp.full((sizes[i],), B, jnp.int32).at[idx[i] + z].set(
                    jnp.arange(B, dtype=jnp.int32), mode="drop")
                slots.append(jnp.sum(slot))
            return acc + sum(slots).astype(jnp.float32) * 1e-20, None
        acc, _ = lax.scan(body, acc0, None, length=n)
        return acc

    timed("big_slot", lambda n: device_sync(big_slot_n(jnp.float32(0), n)))

    @functools.partial(jax.jit, static_argnums=(1,))
    def big_coalesce_n(acc0, n):
        def body(acc, _):
            z = jnp.int32(acc * 1e-30)
            tot = jnp.float32(0)
            for i in big_ts:
                ids = idx[i] + z
                slot = jnp.full((sizes[i],), B, jnp.int32).at[ids].set(
                    jnp.arange(B, dtype=jnp.int32), mode="drop")
                rep = slot.at[ids].get(mode="fill", fill_value=B)
                Gc = jax.ops.segment_sum(g0[i], rep, num_segments=B + 1)[:B]
                tot = tot + jnp.sum(Gc)
            return acc + tot * 1e-20, None
        acc, _ = lax.scan(body, acc0, None, length=n)
        return acc

    timed("big_coalesce",
          lambda n: device_sync(big_coalesce_n(jnp.float32(0), n)))

    # precomputed slot/Gc: apply passes only
    pre = {}
    for i in big_ts:
        slot = jnp.full((sizes[i],), B, jnp.int32).at[idx[i]].set(
            jnp.arange(B, dtype=jnp.int32), mode="drop")
        rep = slot.at[idx[i]].get(mode="fill", fill_value=B)
        Gc = jax.ops.segment_sum(g0[i], rep, num_segments=B + 1)[:B]
        pre[i] = (jnp.minimum(slot, B), Gc)

    @functools.partial(jax.jit, static_argnums=(2,))
    def big_apply_n(tabs, sts, n):
        def body(c, _):
            t_, s_ = c
            eps = t_[big_ts[0]][0, 0].astype(jnp.float32) * 1e-30
            nt, ns = {}, {}
            for i in big_ts:
                slot, Gc = pre[i]
                g_pad = jnp.concatenate([Gc + eps,
                                         jnp.zeros((1, D), jnp.float32)])
                G = jnp.take(g_pad, slot, axis=0)
                new_st = s_[i] + jnp.mean(G * G, axis=1)
                upd = 0.1 * G / (jnp.sqrt(new_st) + 1e-10)[:, None]
                nt[i] = (t_[i].astype(jnp.float32) - upd).astype(t_[i].dtype)
                ns[i] = new_st
            return (nt, ns), None
        (t_, s_), _ = lax.scan(body, (tabs, sts), None, length=n)
        return (sum(jnp.sum(v.astype(jnp.float32)) for v in t_.values())
                + sum(jnp.sum(v) for v in s_.values()))

    tt = {i: tabs0[i] for i in big_ts}
    ss = {i: st0[i] for i in big_ts}
    timed("big_apply", lambda n: device_sync(big_apply_n(tt, ss, n)))

    # ---- small-table sub-components (dense-grad lowering) ----
    @functools.partial(jax.jit, static_argnums=(1,))
    def small_G_n(acc0, n):
        def body(acc, _):
            z = jnp.int32(acc * 1e-30)
            tot = jnp.float32(0)
            for i in small_ts:
                G = jnp.zeros((sizes[i], D), jnp.float32).at[idx[i] + z].add(
                    g0[i], mode="drop")
                tot = tot + jnp.sum(G)
            return acc + tot * 1e-20, None
        acc, _ = lax.scan(body, acc0, None, length=n)
        return acc

    timed("small_G", lambda n: device_sync(small_G_n(jnp.float32(0), n)))

    preG = {i: jnp.zeros((sizes[i], D), jnp.float32).at[idx[i]].add(
        g0[i], mode="drop") for i in small_ts}

    @functools.partial(jax.jit, static_argnums=(2,))
    def small_apply_n(tabs, sts, n):
        def body(c, _):
            t_, s_ = c
            eps = t_[small_ts[0]][0, 0].astype(jnp.float32) * 1e-30
            nt, ns = {}, {}
            for i in small_ts:
                G = preG[i] + eps
                new_st = s_[i] + jnp.mean(G * G, axis=1)
                upd = 0.1 * G / (jnp.sqrt(new_st) + 1e-10)[:, None]
                nt[i] = (t_[i].astype(jnp.float32) - upd).astype(t_[i].dtype)
                ns[i] = new_st
            return (nt, ns), None
        (t_, s_), _ = lax.scan(body, (tabs, sts), None, length=n)
        return (sum(jnp.sum(v.astype(jnp.float32)) for v in t_.values())
                + sum(jnp.sum(v) for v in s_.values()))

    tt = {i: tabs0[i] for i in small_ts}
    ss = {i: st0[i] for i in small_ts}
    timed("small_apply", lambda n: device_sync(small_apply_n(tt, ss, n)))

    print(json.dumps(out))


if __name__ == "__main__":
    main()
