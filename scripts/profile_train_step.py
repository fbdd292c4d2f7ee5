"""Fenced+slope breakdown of the B=32768 train step (VERDICT r2 item 1).

Times, on the real chip with the bench.py methodology (device->host fence +
two-window slope), the components of the flagship train step:

  full         the current make_train_step (fwd+bwd+update)
  fwd          eval forward only
  fwd_bwd      loss + grads only (no optimizer apply)
  gather       the 26-table row gather alone
  update       optimizer apply only (fixed precomputed row grads)
and mega-table update prototypes over ONE concatenated [sum(N), D] table:
  mega_rep     rep-trick coalesce + full-pass rwsadagrad apply
  mega_scatter direct .at[ids].add scatter (sgd semantics, for the cliff)
  mega_sort    sort-based coalesce + row scatter

MEASUREMENT HYGIENE (why v1 of this script printed negative times): a
`lax.scan` whose body does not depend on the carry is loop-invariant —
XLA hoists the entire body out of the loop and the "n steps" window runs
the computation once; similarly, returning `tab["table_0"][0, 0]` lets XLA
dead-code-eliminate the other 25 tables.  Every body below therefore
(a) perturbs its inputs by `carry * 1e-30` (numerically nil, not foldable)
so each iteration re-executes, and (b) folds a full-tensor reduction of
every output into the carried scalar so nothing is DCE'd.

Usage: python scripts/profile_train_step.py [--batch 32768]
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

from bench import device_sync  # fenced transfer helper


def slope_time(run_n, n_lo, n_hi, reps=3):
    """run_n(n) must execute n steps and end with a device fence."""
    run_n(n_lo)  # warm/compile
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
    from evstore_tpu.config import TrainConfig, kaggle_small_dlrm_config
    from evstore_tpu.models.dlrm import DLRMParams, init_dlrm, dlrm_forward, dlrm_loss
    from evstore_tpu.train.train_loop import init_opt_state, make_train_step
    from evstore_tpu.train import optim

    cfg = kaggle_small_dlrm_config(max_rows=1_000_000, compute_dtype="bfloat16")
    tcfg = TrainConfig(batch_size=B, learning_rate=0.1, optimizer="rwsadagrad")
    T, D = cfg.num_tables, cfg.embedding_dim

    rng = np.random.default_rng(0)
    dx = jnp.asarray(rng.random((B, cfg.num_dense_features), np.float32))
    idx = jnp.asarray(np.stack([rng.integers(0, s, B) for s in cfg.table_sizes], 1),
                      jnp.int32)
    y = jnp.asarray(rng.integers(0, 2, B).astype(np.float32))

    params = init_dlrm(jax.random.PRNGKey(0), cfg)
    opt_state = init_opt_state(params, tcfg)
    step = make_train_step(cfg, tcfg)

    def tsum(tree):
        """Cheap full-tree reduction (DCE guard)."""
        return sum(jnp.sum(l).astype(jnp.float32)
                   for l in jax.tree_util.tree_leaves(tree))

    out = {}

    # ---- full step (params/opt carried: genuinely loop-dependent)
    @functools.partial(jax.jit, static_argnums=(2,))
    def full_n(params, opt_state, n):
        def body(c, _):
            p, o = c
            p, o, loss = step(p, o, dx, idx, y)
            return (p, o), loss
        (p, o), losses = lax.scan(body, (params, opt_state), None, length=n)
        return losses[-1]

    out["full_ms"] = slope_time(
        lambda n: device_sync(full_n(params, opt_state, n)), 5, 20) * 1e3
    print(f"full step:        {out['full_ms']:8.2f} ms", flush=True)

    # ---- fwd only
    @functools.partial(jax.jit, static_argnums=(1,))
    def fwd_n(params, n):
        def body(acc, _):
            dxi = dx + acc * 1e-30
            logits = dlrm_forward(params, dxi, idx, cfg)
            return acc + jnp.sum(logits) * 1e-20, None
        acc, _ = lax.scan(body, jnp.float32(0), None, length=n)
        return acc

    out["fwd_ms"] = slope_time(
        lambda n: device_sync(fwd_n(params, n)), 5, 20) * 1e3
    print(f"fwd only:         {out['fwd_ms']:8.2f} ms", flush=True)

    # ---- gather only (26 takes; carry-perturbed ids, full reduction out)
    @functools.partial(jax.jit, static_argnums=(1,))
    def gather_n(params, n):
        plain = {k: v["kind_plain"] for k, v in params.sparse.items()}

        def body(acc, _):
            z = jnp.int32(acc * 1e-30)  # provably-unknown zero
            s = jnp.float32(0)
            for k, t in plain.items():
                rows = jnp.take(t, idx[:, int(k.split("_")[1])] + z, axis=0)
                s = s + jnp.sum(rows.astype(jnp.float32))
            return acc + s * 1e-20, None
        acc, _ = lax.scan(body, jnp.float32(0), None, length=n)
        return acc

    out["gather_ms"] = slope_time(
        lambda n: device_sync(gather_n(params, n)), 5, 20) * 1e3
    print(f"gather only:      {out['gather_ms']:8.2f} ms", flush=True)

    # ---- fwd+bwd only
    def loss_and_rowgrads(params, dense_x, idx, labels):
        plain = {k: v["kind_plain"] for k, v in params.sparse.items()}
        rows = {k: jnp.take(t, idx[:, int(k.split("_")[1])], axis=0)
                for k, t in plain.items()}

        def loss_fn(dense_params, rows_in):
            emb = jnp.stack([rows_in[f"table_{t}"] for t in range(T)], 1)
            logits = dlrm_forward(DLRMParams(dense_params, params.sparse),
                                  dense_x, idx, cfg, emb_rows=emb)
            return dlrm_loss(logits, labels)

        loss, (gd, gr) = jax.value_and_grad(loss_fn, argnums=(0, 1))(
            params.dense, rows)
        return loss, gd, gr

    @functools.partial(jax.jit, static_argnums=(1,))
    def fwdbwd_n(params, n):
        def body(acc, _):
            dxi = dx + acc * 1e-30
            loss, gd, gr = loss_and_rowgrads(params, dxi, idx, y)
            return acc + (loss + tsum(gd) + tsum(gr)) * 1e-20, None
        acc, _ = lax.scan(body, jnp.float32(0), None, length=n)
        return acc

    out["fwd_bwd_ms"] = slope_time(
        lambda n: device_sync(fwdbwd_n(params, n)), 5, 20) * 1e3
    print(f"fwd+bwd only:     {out['fwd_bwd_ms']:8.2f} ms", flush=True)

    # ---- update only (fixed grads perturbed by carry, tables carried)
    _, gd0, gr0 = jax.jit(loss_and_rowgrads)(params, dx, idx, y)

    @functools.partial(jax.jit, static_argnums=(2,))
    def update_n(params, opt_state, n):
        plain = {k: v["kind_plain"] for k, v in params.sparse.items()}

        def body(c, _):
            tabs, sstate = c
            eps = tabs["table_0"][0, 0].astype(jnp.float32) * 1e-30
            new_t, new_s = {}, {}
            for name, tab in tabs.items():
                t = int(name.split("_")[1])
                st, nt = optim.row_update(tcfg.optimizer, sstate[name], tab,
                                          idx[:, t], gr0[name] + eps, 0.1)
                new_t[name], new_s[name] = nt, st
            return (new_t, new_s), None
        (tabs, sstate), _ = lax.scan(body, (plain, opt_state.sparse), None,
                                     length=n)
        return tsum(tabs) + tsum(sstate)

    out["update_ms"] = slope_time(
        lambda n: device_sync(update_n(params, opt_state, n)), 5, 20) * 1e3
    print(f"update only:      {out['update_ms']:8.2f} ms", flush=True)

    # ---- mega-table prototypes
    sizes = np.asarray(cfg.table_sizes, np.int64)
    offs = np.concatenate([[0], np.cumsum(sizes)])
    total = int(offs[-1])
    print(f"[mega] total rows {total:,} ({total*D*4/1e6:.0f} MB fp32 / "
          f"{total*D*2/1e6:.0f} MB bf16)", flush=True)
    mega = jnp.asarray(rng.uniform(-0.01, 0.01, (total, D)).astype(np.float32)
                       ).astype(jnp.bfloat16)
    mstate = jnp.zeros((total,), jnp.float32)
    gids = jnp.asarray((np.asarray(idx) + offs[None, :T]).reshape(-1).astype(np.int32))
    g0 = jnp.asarray(rng.normal(0, 1e-3, (B * T, D)).astype(np.float32))

    # rep-trick coalesce + full-pass rwsadagrad apply
    @functools.partial(jax.jit, static_argnums=(2,))
    def mega_rep_n(mega, mstate, n):
        bt = gids.shape[0]

        def body(c, _):
            tab, st = c
            g = g0 + tab[0, 0].astype(jnp.float32) * 1e-30
            slot = jnp.full((total,), bt, jnp.int32).at[gids].set(
                jnp.arange(bt, dtype=jnp.int32), mode="drop")
            rep = slot.at[gids].get(mode="fill", fill_value=bt)
            Gc = jax.ops.segment_sum(g, rep, num_segments=bt + 1)[:bt]
            g_pad = jnp.concatenate([Gc, jnp.zeros((1, D), jnp.float32)])
            G = jnp.take(g_pad, jnp.minimum(slot, bt), axis=0)
            new_st = st + jnp.mean(G * G, axis=1)
            upd = 0.1 * G / (jnp.sqrt(new_st) + 1e-10)[:, None]
            return ((tab.astype(jnp.float32) - upd).astype(tab.dtype),
                    new_st), None
        (tab, st), _ = lax.scan(body, (mega, mstate), None, length=n)
        return jnp.sum(tab.astype(jnp.float32)) + jnp.sum(st)

    out["mega_rep_ms"] = slope_time(
        lambda n: device_sync(mega_rep_n(mega, mstate, n)), 3, 12) * 1e3
    print(f"mega rep-trick:   {out['mega_rep_ms']:8.2f} ms", flush=True)

    # direct dup-tolerant scatter-add (sgd-style)
    @functools.partial(jax.jit, static_argnums=(1,))
    def mega_scatter_n(mega, n):
        def body(tab, _):
            g = g0 + tab[0, 0].astype(jnp.float32) * 1e-30
            return tab.at[gids].add((-0.1 * g).astype(tab.dtype),
                                    mode="drop"), None
        tab, _ = lax.scan(body, mega, None, length=n)
        return jnp.sum(tab.astype(jnp.float32))

    out["mega_scatter_ms"] = slope_time(
        lambda n: device_sync(mega_scatter_n(mega, n)), 2, 6) * 1e3
    print(f"mega scatter-add: {out['mega_scatter_ms']:8.2f} ms", flush=True)

    # sort-based coalesce + segment apply
    @functools.partial(jax.jit, static_argnums=(2,))
    def mega_sort_n(mega, mstate, n):
        bt = gids.shape[0]

        def body(c, _):
            tab, st = c
            g = g0 + tab[0, 0].astype(jnp.float32) * 1e-30
            order = jnp.argsort(gids)
            sid = gids[order]
            sg = jnp.take(g, order, axis=0)
            first = jnp.concatenate([jnp.ones((1,), bool), sid[1:] != sid[:-1]])
            seg = jnp.cumsum(first.astype(jnp.int32)) - 1
            Gc = jax.ops.segment_sum(sg, seg, num_segments=bt,
                                     indices_are_sorted=True)
            uid = jnp.where(first, sid, jnp.int32(optim.PAD_ROW))
            uniq = jnp.full((bt,), optim.PAD_ROW, jnp.int32).at[seg].min(
                uid, mode="drop")
            inc = jnp.mean(Gc * Gc, axis=1)
            srows = st.at[uniq].get(mode="fill", fill_value=0.0) + inc
            new_st = st.at[uniq].add(inc, mode="drop")
            upd = 0.1 * Gc / (jnp.sqrt(srows) + 1e-10)[:, None]
            new_tab = tab.at[uniq].add(-upd.astype(tab.dtype), mode="drop")
            return (new_tab, new_st), None
        (tab, st), _ = lax.scan(body, (mega, mstate), None, length=n)
        return jnp.sum(tab.astype(jnp.float32)) + jnp.sum(st)

    out["mega_sort_ms"] = slope_time(
        lambda n: device_sync(mega_sort_n(mega, mstate, n)), 2, 6) * 1e3
    print(f"mega sort+scatter:{out['mega_sort_ms']:8.2f} ms", flush=True)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
