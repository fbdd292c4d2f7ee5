"""Training driver: the baseline DLRM train+eval loop with checkpointing and
EV export.

Reference: dlrm_s_pytorch.py run() (:922-1990): epoch loop, periodic eval
(test_freq), checkpoint + per-table EV export on every new-best eval, mlperf
threshold early-exit, resume with skip-upto fast-forward.
"""

from __future__ import annotations

import dataclasses
import time
from typing import Callable, Iterable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from evstore_tpu.config import DLRMConfig, TrainConfig
from evstore_tpu.models.dlrm import DLRMParams, init_dlrm
from evstore_tpu.train.metrics import binary_metrics
from evstore_tpu.train.train_loop import (evaluate, init_opt_state,
                                          make_eval_step, make_train_step)
from evstore_tpu.utils.checkpoint import (export_ev_tables, latest_step,
                                          restore_checkpoint, save_checkpoint)
from evstore_tpu.utils.logging import MLPerfLogger


@dataclasses.dataclass
class TrainResult:
    params: DLRMParams
    best_metric: float
    steps: int
    history: dict


def run_training(cfg: DLRMConfig, tcfg: TrainConfig,
                 make_train_batches: Callable[[], Iterable],
                 make_test_batches: Optional[Callable[[], Iterable]] = None,
                 ckpt_dir: Optional[str] = None,
                 ev_export_dir: Optional[str] = None,
                 resume: bool = False,
                 seed: int = 0,
                 mesh=None,
                 dedup_exchange: bool = False,
                 alltoall_impl: str = "psum",
                 multihot: bool = False,
                 log_fn=print) -> TrainResult:
    """Full training run.  make_*_batches are zero-arg callables returning a
    fresh batch iterator (epochs re-iterate).  With `mesh` (a 2D
    jax.sharding.Mesh over (data, model)) the SPMD sharded step is used:
    row-sharded tables + psum exchange, batch DP (parallel/sharded.py);
    dedup_exchange ships unique rows only.

    alltoall_impl selects the exchange (≙ the reference's
    DLRM_ALLTOALL_IMPL env switch, extend_distributed.py:34,559-576):
    "psum" = row-sharded masked-gather + psum (the default);
    "butterfly"/"alltoall" = table-wise sharding + lax.all_to_all over a 1D
    mesh of all the mesh's devices (parallel/butterfly.py; requires plain
    near-uniform tables)."""
    mll = MLPerfLogger(log_fn=log_fn)
    mll.event("init_start")
    params = init_dlrm(jax.random.PRNGKey(seed), cfg)
    opt_state = init_opt_state(params, tcfg)
    start_step = 0
    if resume and ckpt_dir:
        s = latest_step(ckpt_dir)
        if s is not None:
            params, opt_state, extra = restore_checkpoint(
                ckpt_dir, s, params, opt_state)
            start_step = s
            log_fn(f"resumed from checkpoint step {s}")

    sync_params = lambda p: p   # butterfly mode reconstructs on demand
    sync_pair = lambda p, o: (p, o)   # logical view for checkpoints
    if mesh is not None and alltoall_impl in ("butterfly", "alltoall"):
        from jax.sharding import Mesh as _Mesh
        from evstore_tpu.parallel.butterfly import (
            AXIS, init_butterfly_state, make_butterfly_train_step,
            unstack_tables)
        from evstore_tpu.parallel.planner import plan_table_shards
        bmesh = _Mesh(np.asarray(mesh.devices).reshape(-1), (AXIS,))
        # LPT-balanced table placement (vs the reference's contiguous
        # get_my_slice split) — a pure layout choice, numerically identical
        order, imb = plan_table_shards(cfg.table_sizes,
                                       bmesh.shape[AXIS])
        log_fn(f"butterfly placement: order {order} (imbalance {imb:.2f})")
        bstate = list(init_butterfly_state(params, tcfg, bmesh,
                                           table_order=order))
        bstep = make_butterfly_train_step(
            cfg, tcfg, bmesh, tcfg.batch_size,
            dedup_exchange=dedup_exchange, table_order=order,
            multihot=multihot)(*bstate)
        kcount = jnp.zeros((), jnp.int32)

        def step_fn(p, o, dx, ix, y, bw=None):
            nonlocal kcount
            if multihot:
                # the shard_map signature is fixed at build time: weightless
                # bags get unit per-sample weights (exact for sum pooling)
                extra = (jnp.ones(ix.shape, jnp.float32)
                         if bw is None else bw,)
            else:
                extra = ()
            (bstate[0], bstate[1], bstate[2], bstate[3],
             loss) = bstep(*bstate, kcount, dx, ix, y, *extra)
            kcount = kcount + 1
            return p, o, loss

        def sync_params(p):
            return DLRMParams(bstate[0], unstack_tables(
                bstate[1], p, table_order=order).sparse)

        def sync_pair(p, o):
            # butterfly keeps the trained state in bstate (step_fn returns
            # p unchanged); the final eval/save must reconstruct from it or
            # it would persist the INITIAL params (round-4 advisor finding)
            return sync_params(p), o

        eval_step = make_eval_step(cfg) if make_test_batches else None
    elif mesh is not None:
        from evstore_tpu.parallel.sharded import (make_sharded_eval_step,
                                                  make_sharded_train_step,
                                                  shard_dlrm_params)
        params, opt_state, _, _ = shard_dlrm_params(params, mesh, opt_state)
        step_fn = make_sharded_train_step(
            cfg, tcfg, mesh, tcfg.batch_size,
            dedup_exchange=dedup_exchange, multihot=multihot)(params,
                                                              opt_state)
        eval_step = (make_sharded_eval_step(
            cfg, mesh, dedup_exchange=dedup_exchange,
            multihot=multihot)(params)
            if make_test_batches else None)
    else:
        from evstore_tpu.train.optim import (make_pack_spec, pack_tables,
                                             unpack_tables)
        pack_spec = (make_pack_spec(params, tcfg.optimizer)
                     if getattr(tcfg, "pack_gather", True) else {})
        from evstore_tpu.train.train_loop import step_jit
        step_fn = step_jit(make_train_step(cfg, tcfg, pack=pack_spec),
                           donate_argnums=(0, 1))
        if pack_spec:
            params, opt_state = pack_tables(params, opt_state, pack_spec)

            def sync_params(p):
                # logical [N, D] view for eval/EV-export; the packed
                # training state is untouched
                return unpack_tables(p, opt_state, pack_spec)[0]

            def sync_pair(p, o):
                # checkpoints always persist the LOGICAL layout so
                # resume is layout-independent
                return unpack_tables(p, o, pack_spec)
        eval_step = make_eval_step(cfg) if make_test_batches else None

    best = -float("inf")
    history = {"loss": [], "eval": []}
    step = 0
    should_stop = False
    mll.event("init_stop")
    mll.event("run_start")
    t0 = time.perf_counter()
    n_since = 0
    from evstore_tpu.train.train_loop import unpack_batch
    for epoch in range(tcfg.nepochs):
        mll.event("epoch_start", {"epoch": epoch})
        for batch in make_train_batches():
            dense_x, idx, y, bw = unpack_batch(batch)
            step += 1
            if step <= start_step:
                continue   # skip-upto fast-forward (dlrm_s_pytorch.py:1605)
            args = (jnp.asarray(dense_x), jnp.asarray(idx), jnp.asarray(y))
            if bw is not None:
                params, opt_state, loss = step_fn(params, opt_state, *args,
                                                  jnp.asarray(bw))
            else:
                params, opt_state, loss = step_fn(params, opt_state, *args)
            n_since += 1
            if step % max(tcfg.print_freq, 1) == 0:
                jax.block_until_ready(loss)
                dt = time.perf_counter() - t0
                lv = float(loss)
                history["loss"].append((step, lv))
                log_fn(f"step {step}: loss {lv:.6f} "
                       f"({n_since * dense_x.shape[0] / max(dt, 1e-9):.0f} "
                       "examples/s)")
                t0, n_since = time.perf_counter(), 0
            if (make_test_batches and tcfg.test_freq > 0
                    and step % tcfg.test_freq == 0):
                eval_p = sync_params(params)
                metrics = evaluate(eval_p, cfg, make_test_batches(), eval_step)
                history["eval"].append((step, metrics))
                mll.event("eval_accuracy", {"step": step, **metrics})
                log_fn(f"eval @ {step}: auc {metrics['auc']:.4f} "
                       f"acc {metrics['accuracy']:.4f}")
                score = metrics["auc"] if not np.isnan(metrics["auc"]) \
                    else metrics["accuracy"]
                if score > best:
                    best = score
                    if ckpt_dir:
                        _, ck_state = sync_pair(params, opt_state)
                        save_checkpoint(ckpt_dir, step, eval_p, ck_state,
                                        extra={"metrics": metrics})
                    if ev_export_dir:
                        export_ev_tables(eval_p, ev_export_dir,
                                         table_sizes=cfg.table_sizes)
                if (tcfg.mlperf_auc_threshold > 0
                        and metrics["auc"] >= tcfg.mlperf_auc_threshold):
                    mll.event("run_stop", {"status": "success"})
                    log_fn(f"hit target AUC {tcfg.mlperf_auc_threshold}")
                    should_stop = True
                if (tcfg.mlperf_acc_threshold > 0
                        and metrics["accuracy"] >= tcfg.mlperf_acc_threshold):
                    should_stop = True
            if should_stop:
                break
        mll.event("epoch_stop", {"epoch": epoch})
        if should_stop:
            break

    # final eval + save
    params, opt_state = sync_pair(params, opt_state)
    if make_test_batches:
        metrics = evaluate(params, cfg, make_test_batches(), eval_step)
        history["eval"].append((step, metrics))
        score = metrics["auc"] if not np.isnan(metrics["auc"]) \
            else metrics["accuracy"]
        if score > best:
            best = score
            if ckpt_dir:
                save_checkpoint(ckpt_dir, step, params, opt_state,
                                extra={"metrics": metrics})
            if ev_export_dir:
                export_ev_tables(params, ev_export_dir,
                                         table_sizes=cfg.table_sizes)
    mll.event("run_stop", {"status": "done"})
    return TrainResult(params=params, best_metric=best, steps=step,
                       history=history)


def _cached_eval(tc, cfg, dense, make_test_batches, eval_fwd):
    """Eval through the cached trainer: flush dirty HBM rows to the DRAM
    masters, then score test batches with host-gathered rows injected into
    the device forward — HBM stays bounded (no full-table upload).  Mirrors
    run_training's periodic eval (≙ dlrm_s_pytorch.py:1743-1796)."""
    import jax.numpy as jnp
    tc.flush_to_host()
    scores, labels = [], []
    for batch in make_test_batches():
        dense_x, idx, y = batch[0], batch[1], batch[-1]
        idx_np = np.asarray(idx)
        rows = np.stack([tc.host_tables[t][idx_np[:, t]]
                         for t in range(cfg.num_tables)], axis=1)
        scores.append(np.asarray(eval_fwd(dense, jnp.asarray(dense_x),
                                          jnp.asarray(rows))))
        labels.append(np.asarray(y))
    return binary_metrics(np.concatenate(scores), np.concatenate(labels))


def _save_dense_npz(dense, dstate, out_dir, step, metrics):
    """Dense-side (MLP) checkpoint next to the cache's table/momentum .npy
    files — together with TrainableDeviceCache.save this is the full
    checkpoint-on-best state of cached training."""
    import json
    import os
    os.makedirs(out_dir, exist_ok=True)
    flat = {f"p{jax.tree_util.keystr(p)}": np.asarray(l)
            for p, l in jax.tree_util.tree_leaves_with_path(dense)}
    flat.update({f"s{jax.tree_util.keystr(p)}": np.asarray(l)
                 for p, l in jax.tree_util.tree_leaves_with_path(dstate)})
    np.savez(os.path.join(out_dir, "dense_params.npz"), **flat)
    with open(os.path.join(out_dir, "best.json"), "w") as f:
        json.dump({"step": step, "metrics": metrics}, f)


def restore_dense_npz(dense_template, dstate_template, out_dir):
    """Inverse of _save_dense_npz (leaves order = tree_structure order)."""
    import os
    z = np.load(os.path.join(out_dir, "dense_params.npz"))

    def rebuild(template, prefix):
        import jax.numpy as jnp
        leaves = jax.tree_util.tree_leaves_with_path(template)
        vals = [jnp.asarray(z[f"{prefix}{jax.tree_util.keystr(p)}"])
                for p, _ in leaves]
        return jax.tree_util.tree_unflatten(
            jax.tree_util.tree_structure(template), vals)

    return rebuild(dense_template, "p"), rebuild(dstate_template, "s")


def run_cached_training(cfg: DLRMConfig, tcfg: TrainConfig, ccfg,
                        make_train_batches: Callable[[], Iterable],
                        tables=None, ev_table_dir: Optional[str] = None,
                        table_sizes=None,
                        save_dir: Optional[str] = None,
                        mesh=None,
                        seed: int = 0,
                        window: int = 0,
                        make_test_batches: Optional[Callable] = None,
                        ev_export_dir: Optional[str] = None,
                        log_fn=print) -> TrainResult:
    """HBM-bounded training through the device cache tier (beyond the
    reference, which forbids training with EVStore —
    dlrm_s_pytorch_C1.py:1321-1323).  Embedding masters live in host DRAM
    (`tables`) or on SSD (`ev_table_dir` + `table_sizes`, the terabyte
    configuration); HBM holds only the cache working set.  With `mesh` the
    working set shards over the model axis (ShardedTrainableDeviceCache).

    With make_test_batches + tcfg.test_freq > 0 the quality loop mirrors
    run_training (≙ dlrm_s_pytorch.py:1743-1796): periodic AUC eval through
    the cache, checkpoint-on-best (cache .npy + dense npz into save_dir),
    and EV export on best into ev_export_dir."""
    import jax.numpy as jnp
    from evstore_tpu.cache.trainable import (ShardedTrainableDeviceCache,
                                             TrainableDeviceCache)

    import os
    params = init_dlrm(jax.random.PRNGKey(seed), cfg)
    if ev_table_dir and not os.path.exists(
            os.path.join(ev_table_dir, "ev-table-1.bin")):
        ev_table_dir = None   # no .bin masters there: in-DRAM mode
    if ev_table_dir:
        if mesh is not None:
            tc = ShardedTrainableDeviceCache.from_files(
                cfg, tcfg, ccfg, ev_table_dir, table_sizes, mesh=mesh)
        else:
            tc = TrainableDeviceCache.from_files(cfg, tcfg, ccfg,
                                                 ev_table_dir, table_sizes)
    else:
        if tables is None:
            tables = [np.asarray(params.sparse[f"table_{t}"]["kind_plain"])
                      for t in range(cfg.num_tables)]
        if mesh is not None:
            tc = ShardedTrainableDeviceCache(cfg, tcfg, ccfg, tables, mesh)
        else:
            tc = TrainableDeviceCache(cfg, tcfg, ccfg, tables)
    dense = params.dense
    dstate = jax.tree_util.tree_map(
        lambda p: jnp.zeros_like(p, dtype=jnp.float32), params.dense)
    history = {"loss": [], "eval": []}
    step = 0
    t0 = time.perf_counter()
    n_since = 0
    last_loss = float("nan")
    best = -float("inf")
    do_eval = make_test_batches is not None and tcfg.test_freq > 0

    @jax.jit
    def eval_fwd(dparams, dense_x, rows):
        from evstore_tpu.models.dlrm import dlrm_forward as _fwd
        logits = _fwd(DLRMParams(dparams, {}), dense_x, None, cfg,
                      emb_rows=rows)
        return jax.nn.sigmoid(logits)

    def eval_and_track():
        nonlocal best
        metrics = _cached_eval(tc, cfg, dense, make_test_batches, eval_fwd)
        history["eval"].append((step, metrics))
        log_fn(f"eval @ {step}: auc {metrics['auc']:.4f} "
               f"acc {metrics['accuracy']:.4f}")
        score = (metrics["auc"] if not np.isnan(metrics["auc"])
                 else metrics["accuracy"])
        if score > best:
            best = score
            if save_dir:
                tc.save(save_dir)
                _save_dense_npz(dense, dstate, save_dir, step, metrics)
            if ev_export_dir:
                tc.export_ev_tables(ev_export_dir)
        return metrics

    def progress(loss, bsize):
        nonlocal last_loss, t0, n_since
        last_loss = float(loss)
        dt = time.perf_counter() - t0
        history["loss"].append((step, last_loss))
        s = tc.stats()
        log_fn(f"step {step}: loss {last_loss:.6f} "
               f"({n_since * bsize / max(dt, 1e-9):.0f}"
               f" examples/s, hit rate {s['hit_rate']:.3f}, "
               f"cache hbm {s['hbm_bytes'] / 1e6:.1f} MB)")
        t0, n_since = time.perf_counter(), 0

    pipelined = isinstance(tc, TrainableDeviceCache) and not isinstance(
        tc, ShardedTrainableDeviceCache)
    for epoch in range(tcfg.nepochs):
        if pipelined:
            # PIPELINED loop: batch k+1's policy/fetch host work overlaps
            # batch k's device step; write-backs ride one packed transfer
            # (cache/trainable.py train_batches).  window>1 runs the
            # windowed megastep instead: K batches per device call
            # (train_batches_windowed), bit-identical trajectories.
            # Periodic eval chunks the stream at test_freq batches: the
            # generator drains cleanly at a chunk boundary, so the flush in
            # _cached_eval sees fully-landed state.
            import itertools
            batch_iter = iter(make_train_batches())
            while True:
                if do_eval:
                    chunk = list(itertools.islice(batch_iter,
                                                  tcfg.test_freq))
                    if not chunk:
                        break
                else:
                    chunk = batch_iter
                if window and window > 1:
                    stream = tc.train_batches_windowed(
                        dense, dstate, chunk, window=window,
                        start_step=step + 1)
                else:
                    stream = tc.train_batches(dense, dstate, chunk,
                                              start_step=step + 1)
                for dense, dstate, loss in stream:
                    step += 1
                    n_since += 1
                    if step % max(tcfg.print_freq, 1) == 0:
                        progress(loss, tcfg.batch_size)
                if do_eval:
                    eval_and_track()
                else:
                    break
            continue
        for dense_x, idx, y in make_train_batches():
            step += 1
            dense, dstate, loss = tc.train_batch(dense, dstate, step,
                                                 dense_x, idx, y)
            n_since += 1
            if step % max(tcfg.print_freq, 1) == 0:
                jax.block_until_ready(loss)
                progress(loss, np.asarray(dense_x).shape[0])
            if do_eval and step % tcfg.test_freq == 0:
                eval_and_track()
    if do_eval:  # final eval (mirrors run_training's)
        metrics = eval_and_track()
    if ev_table_dir:
        tc.flush_files()
    elif save_dir and not do_eval:
        tc.save(save_dir)
    else:
        tc.flush_to_host()
    stats = tc.stats()
    tc.close()
    log_fn(f"cached training done: steps={step} cache={stats} "
           f"best={best if best > -float('inf') else float('nan'):.4f}")
    return TrainResult(params=DLRMParams(dense, params.sparse),
                       best_metric=(best if best > -float("inf")
                                    else float("nan")),
                       steps=step, history=history)
