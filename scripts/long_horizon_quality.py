"""Long-horizon quality of HBM-bounded cached training (VERDICT r4 item 6).

Trains the same DLRM from the same init on the same stream three ways —
full-table rwsadagrad, TrainableDeviceCache fp32 rows, and int8 rows
(stochastic-rounding stores) — at a capacity well below the distinct-key
count (evictions + write-back active, windowed megastep W=4), for 3
epochs, evaluating held-out AUC every 90 steps.  This is the accuracy
curve behind SURVEY §7's hard part (iii): *training* through a bounded
cache tier, which the reference forbids outright
(dlrm_s_pytorch_C1.py:1321-1323).

Output: one JSON with the three AUC-vs-step curves and final deltas.
Representative run (v5e host, seed 11):
  full-table final AUC 0.81628
  cached fp32 (cap 2000/5300 keys, hit 0.42): 0.81628 (delta +0.0000)
  cached int8 (same cap):                     0.82354 (delta +0.0073)

Usage: python scripts/long_horizon_quality.py [--epochs 3]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=3)
    ap.add_argument("--eval-every", type=int, default=90)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from evstore_tpu.config import CacheConfig, TrainConfig, make_dlrm_config
    from evstore_tpu.data.synthetic import RandomDataConfig, learnable_batches
    from evstore_tpu.models.dlrm import DLRMParams, dlrm_forward, init_dlrm
    from evstore_tpu.train.metrics import binary_metrics
    from evstore_tpu.train.train_loop import init_opt_state, make_train_step
    from evstore_tpu.cache.trainable import TrainableDeviceCache

    cfg = make_dlrm_config(8, (2000, 1500, 1000, 800), (16,), (16,),
                           num_dense=4)
    tcfg = TrainConfig(batch_size=128, learning_rate=0.1,
                       optimizer="rwsadagrad")
    n_train, n_eval = 120, 12
    dcfg = RandomDataConfig(num_dense=4, table_sizes=cfg.table_sizes,
                            batch_size=128, num_batches=n_train + n_eval,
                            seed=11)
    batches = list(learnable_batches(dcfg))
    train_b, eval_b = batches[:n_train], batches[n_train:]
    params = init_dlrm(jax.random.PRNGKey(0), cfg)
    T = cfg.num_tables

    def auc_of(scores, labels):
        return binary_metrics(np.concatenate(scores),
                              np.concatenate(labels))["auc"]

    def eval_full(p):
        s, l = [], []
        for dx, idx, y in eval_b:
            s.append(np.asarray(jax.nn.sigmoid(dlrm_forward(
                p, jnp.asarray(dx), jnp.asarray(idx), cfg))))
            l.append(y)
        return auc_of(s, l)

    out = {"config": {"table_rows": sum(cfg.table_sizes),
                      "epochs": args.epochs, "steps_per_epoch": n_train}}

    step = jax.jit(make_train_step(cfg, tcfg))
    p, o = params, init_opt_state(params, tcfg)
    k, curve = 0, []
    for _ in range(args.epochs):
        for dx, idx, y in train_b:
            p, o, _ = step(p, o, jnp.asarray(dx), jnp.asarray(idx),
                           jnp.asarray(y))
            k += 1
            if k % args.eval_every == 0:
                curve.append([k, eval_full(p)])
    out["full_table"] = {"curve": curve, "final_auc": eval_full(p)}
    print("full-table:", out["full_table"]["final_auc"], file=sys.stderr)

    for prec in (32, 8):
        ccfg = CacheConfig(policy="evlfu", total_size=2000,
                           main_precision=prec)
        tc = TrainableDeviceCache(
            cfg, tcfg, ccfg,
            [np.asarray(params.sparse[f"table_{t}"]["kind_plain"])
             for t in range(T)])
        dense = params.dense
        dstate = jax.tree_util.tree_map(
            lambda q: jnp.zeros_like(q, jnp.float32), params.dense)

        def eval_cached():
            tc.flush_to_host()
            s, l = [], []
            for dx, idx, y in eval_b:
                rows = np.stack([tc.host_tables[t][np.asarray(idx)[:, t]]
                                 for t in range(T)], axis=1)
                s.append(np.asarray(jax.nn.sigmoid(dlrm_forward(
                    DLRMParams(dense, {}), jnp.asarray(dx), None, cfg,
                    emb_rows=jnp.asarray(rows)))))
                l.append(y)
            return auc_of(s, l)

        # eval only at CHUNK boundaries: the windowed generator pipelines
        # one batch ahead, so flush_to_host mid-stream reads in-flight
        # device state and corrupts the host masters (measured on the
        # real chip: -0.11 final AUC; run_cached_training chunks its
        # stream for exactly this reason, drivers/train.py)
        k, curve = 0, []
        for _ in range(args.epochs):
            for lo in range(0, len(train_b), args.eval_every):
                chunk = train_b[lo:lo + args.eval_every]
                for dense, dstate, _ in tc.train_batches_windowed(
                        dense, dstate, iter(chunk), window=4,
                        start_step=k + 1):
                    k += 1
                curve.append([k, eval_cached()])
        fin = eval_cached()
        st = tc.stats()
        out[f"cached_p{prec}"] = {
            "curve": curve, "final_auc": fin,
            "final_delta_vs_full": fin - out["full_table"]["final_auc"],
            "hit_rate": st["hit_rate"],
            "capacity_over_keys": 2000 / sum(cfg.table_sizes)}
        print(f"cached p{prec}:", fin, file=sys.stderr)
        tc.close()

    print(json.dumps(out))


if __name__ == "__main__":
    main()
