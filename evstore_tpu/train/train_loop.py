"""Single-device training/eval steps and the training driver.

Reference: the epoch loop of dlrm_s_pytorch.py:1574-1854 (forward, BCE loss,
backward, optimizer.step, LR policy, periodic eval + checkpoint-on-best and
per-table EV export).

TPU-first: one jitted `train_step(params, opt_state, batch) -> (params,
opt_state, loss)` — forward, backward, and the optimizer update fused into a
single XLA program with donated buffers.  The embedding gradient never
materializes as a dense [N, D] array: autodiff runs to the *gathered rows*
only, the per-batch row grads are coalesced by segment-sum (static shapes)
and scatter-applied to the tables (see train/optim.py), which is how
rwsAdagrad's sparse path is expressed without torch sparse tensors.
"""

from __future__ import annotations

import functools
import time
from typing import Dict, Iterable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from evstore_tpu.config import DLRMConfig, TrainConfig
from evstore_tpu.models.dlrm import DLRMParams, dlrm_forward, dlrm_loss
from evstore_tpu.models.embedding import md_lookup, qr_lookup
from evstore_tpu.train.metrics import binary_metrics
from evstore_tpu.train.optim import (dedup_rows, lr_schedule,
                                     make_optimizer, row_update,
                                     OptState)


def _split_sparse(sparse: Dict) -> Tuple[Dict, Dict]:
    """Split sparse params into plain big tables (row-wise sparse updates) and
    factorized qr/md params (small by construction; dense-updated)."""
    plain, fact = {}, {}
    for name, p in sparse.items():
        if "kind_plain" in p:
            plain[name] = p["kind_plain"]
        else:
            fact[name] = p
    return plain, fact


def _pool_weights(sparse: Dict) -> Dict:
    """Per-row pooling weight vectors v_W of weighted-pooling tables."""
    return {name: p["pool_w"] for name, p in sparse.items()
            if "pool_w" in p}


def _merge_sparse(plain: Dict, fact: Dict, pool_w: Dict = None) -> Dict:
    out = {name: {"kind_plain": t} for name, t in plain.items()}
    if pool_w:
        for name, w in pool_w.items():
            out[name]["pool_w"] = w
    out.update(fact)
    return out


def _rows_for_table(name: str, fact: Dict, plain_rows: Dict, idx_t, cfg):
    if name in plain_rows:
        return plain_rows[name]
    p = fact[name]
    if "kind_qr" in p:
        return qr_lookup(p["kind_qr"], idx_t, cfg.qr_collisions, cfg.qr_operation)
    return md_lookup(p["kind_md"], idx_t)


def make_train_step(cfg: DLRMConfig, tcfg: TrainConfig,
                    pack: Optional[Dict[str, int]] = None):
    """Builds the jitted train step.  Returned signature:
    (params, opt_state, dense_x[B,nd], idx[B,T], labels[B],
     bag_weights=None) -> (params, opt_state, loss).

    idx may be [B, T, L] for multi-hot bags (sum-pooled, optional
    bag_weights [B, T, L] ≙ EmbeddingBag per_sample_weights,
    dlrm_s_pytorch.py:407-459); row grads then coalesce over all B*L
    looked-up rows.

    pack: optional {table name -> P} from optim.make_pack_spec — those
    tables (and their rwsadagrad accumulators) must arrive in the packed
    [N/P, P*D] layout (optim.pack_tables); the step then gathers them at
    the ~10x-faster wide row width (models/embedding.py packed-gather
    notes) and updates them in-layout (optim.row_update_packed).
    """
    opt_init, dense_update, sparse_update = make_optimizer(tcfg.optimizer)
    pack = pack or {}
    lr_fn = lr_schedule(tcfg.learning_rate, tcfg.lr_num_warmup_steps,
                        tcfg.lr_decay_start_step, tcfg.lr_num_decay_steps)

    learned_pool = cfg.weighted_pooling == "learned"

    def train_step(params: DLRMParams, opt_state: OptState,
                   dense_x, idx, labels, bag_weights=None):
        multi = idx.ndim == 3

        def flat_ids(t):
            col = idx[:, t]
            return col.reshape(-1) if multi else col

        plain, fact = _split_sparse(params.sparse)
        pool_w = _pool_weights(params.sparse)
        # gather rows for plain tables (the only autodiff entry point into
        # them).  Always the XLA gather here: the Pallas DMA gather loses
        # END-TO-END on v5e (honest fenced A/B, dim 128 B 8192: eval
        # 0.35x, train ~1.0x — pallas_call is a fusion/scheduling
        # barrier; scripts/ab_pallas_gather.py, EXPERIMENTS §9), so
        # cfg.use_pallas_gather is an off-by-default knob for inference
        # paths (models/embedding.py) on other TPU generations.
        from evstore_tpu.models.embedding import (take_rows,
                                                  take_rows_packed_layout)
        plain_rows = {}
        for name, tab in plain.items():
            ids_t = flat_ids(int(name.split("_")[1]))
            if name in pack:
                plain_rows[name] = take_rows_packed_layout(
                    tab, ids_t, pack[name], cfg.embedding_dim)
            else:
                plain_rows[name] = take_rows(tab, ids_t)
        w_rows = {name: jnp.take(w, flat_ids(int(name.split("_")[1])), axis=0)
                  for name, w in pool_w.items()}

        def loss_fn(dense_params, fact_params, plain_rows_in, w_rows_in):
            rows = []
            for t in range(cfg.num_tables):
                name = f"table_{t}"
                r = _rows_for_table(name, fact_params, plain_rows_in,
                                    flat_ids(t), cfg)
                if name in w_rows_in:
                    r = r * w_rows_in[name]
                if multi:
                    from evstore_tpu.models.embedding import pool_bags
                    r = pool_bags(r.reshape(idx.shape[0], idx.shape[2], -1),
                                  None if bag_weights is None
                                  else bag_weights[:, t])
                rows.append(r)
            emb = jnp.stack(rows, axis=1)
            logits = dlrm_forward(DLRMParams(dense_params, params.sparse),
                                  dense_x, idx, cfg, emb_rows=emb)
            return dlrm_loss(logits, labels, tcfg.loss_function,
                             tcfg.loss_weights)

        # (round 5: an emb-level autodiff fast path — one [B, T, D]
        # cotangent instead of the per-table dict — and a bf16 pre-cast of
        # the gathered rows were both A/B'd at 45.7/48.0 vs 45.6 ms and
        # rejected: the [B,1,36] cotangent slices XLA materializes are the
        # same either way, and the pre-cast pushed the f32 upcast into
        # slower slice_convert fusions.)
        loss, (g_dense, g_fact, g_rows, g_w) = jax.value_and_grad(
            loss_fn, argnums=(0, 1, 2, 3))(params.dense, fact, plain_rows,
                                           w_rows)

        lr = lr_fn(opt_state.step)

        # dense params (MLPs) + factorized tables: dense optimizer branch
        dense_like = {"mlp": params.dense, "fact": fact}
        g_dense_like = {"mlp": g_dense, "fact": g_fact}
        st_dense_like = opt_state.dense if opt_state.dense else {}
        new_dstate, new_dense_like = dense_update(st_dense_like, dense_like,
                                                  g_dense_like, lr)
        new_dense = new_dense_like["mlp"]
        new_fact = new_dense_like["fact"]

        # plain tables: one-shot coalesce+apply per table, lowering chosen
        # statically by table size (optim.row_update) — XLA's row scatter
        # serializes per update on TPU, so small/medium tables take
        # bandwidth-bound dense passes instead
        new_plain, new_sstate = {}, {}
        for name, tab in plain.items():
            t = int(name.split("_")[1])
            st = opt_state.sparse.get(name) if opt_state.sparse else None
            if name in pack:
                from evstore_tpu.train.optim import row_update_packed
                new_st, new_tab = row_update_packed(
                    tcfg.optimizer, st, tab, flat_ids(t), g_rows[name],
                    pack[name], lr)
            else:
                new_st, new_tab = row_update(tcfg.optimizer, st, tab,
                                             flat_ids(t), g_rows[name], lr)
            new_plain[name] = new_tab
            if new_st is not None:
                new_sstate[name] = new_st

        # learned pooling weights: the same row-wise sparse update on [n, 1]
        new_pool = dict(pool_w)
        if learned_pool:
            for name, w in pool_w.items():
                t = int(name.split("_")[1])
                st = (opt_state.sparse.get(name + "__pool_w")
                      if opt_state.sparse else None)
                new_st, new_w = row_update(tcfg.optimizer, st, w,
                                           flat_ids(t), g_w[name], lr)
                new_pool[name] = new_w
                if new_st is not None:
                    new_sstate[name + "__pool_w"] = new_st

        new_params = DLRMParams(dense=new_dense,
                                sparse=_merge_sparse(new_plain, new_fact,
                                                     new_pool))
        new_opt = OptState(step=opt_state.step + 1, dense=new_dstate,
                           sparse={**opt_state.sparse, **new_sstate}
                           if opt_state.sparse else {})
        return new_params, new_opt, loss

    return train_step


def step_jit(fn, **jit_kwargs):
    """jax.jit for the train step with the TPU compile option the step
    needs: the blocked interaction kernels (pallas_interaction) reserve
    scoped VMEM, and at the default scoped-vmem limit XLA then stops
    promoting the update path's [b+1, P*d+P] take operands to VMEM —
    turning 1.35 ns/row takes into ~10 ns/row HBM gathers (round-5 trace:
    the 5 big-table takes went 3.4 -> 21.8 ms/step).  Raising
    xla_tpu_scoped_vmem_limit_kib to 64 MiB restores the promotion
    (v5e has 128 MiB VMEM); measured step 63.3 -> 45.5 ms.  Harmless when
    no Pallas kernel is present (same flag measured 52.3 vs 50.8 — within
    fusion-reshuffle noise) and ignored off-TPU."""
    try:
        import jax as _jax
        if _jax.default_backend() == "tpu":
            return _jax.jit(fn, compiler_options={
                "xla_tpu_scoped_vmem_limit_kib": 65536}, **jit_kwargs)
    except Exception:     # pragma: no cover - conservative fallback
        pass
    return jax.jit(fn, **jit_kwargs)


def init_opt_state(params: DLRMParams, tcfg: TrainConfig) -> OptState:
    opt_init, _, _ = make_optimizer(tcfg.optimizer)
    plain, fact = _split_sparse(params.sparse)
    shim_sparse = dict(plain)
    for name, w in _pool_weights(params.sparse).items():
        shim_sparse[name + "__pool_w"] = w
    # state layout must mirror what make_train_step's update path uses
    shim = DLRMParams(dense={"mlp": params.dense, "fact": fact},
                      sparse=shim_sparse)
    st = opt_init(shim)
    return st


def unpack_batch(batch):
    """Normalize a data batch to (dense, idx, labels, bag_weights).
    3-tuples are one-hot (dense, idx, y); 4-tuples are multi-hot
    (dense, idx[B,T,L], bag_weights[B,T,L], y)."""
    if len(batch) == 4:
        d, i, w, y = batch
        return d, i, y, w
    d, i, y = batch
    return d, i, y, None


def make_eval_step(cfg: DLRMConfig):
    @jax.jit
    def eval_step(params: DLRMParams, dense_x, idx, bag_weights=None):
        logits = dlrm_forward(params, dense_x, idx, cfg,
                              bag_weights=bag_weights)
        return jax.nn.sigmoid(logits)
    return eval_step


def evaluate(params: DLRMParams, cfg: DLRMConfig,
             batches: Iterable, eval_step=None) -> Dict[str, float]:
    """Run inference over batches and compute the reference's metric block
    (dlrm_s_pytorch.py:760-866)."""
    if eval_step is None:
        eval_step = make_eval_step(cfg)
    scores, labels = [], []
    for batch in batches:
        dense_x, idx, y, bw = unpack_batch(batch)
        if bw is None:
            s = eval_step(params, jnp.asarray(dense_x), jnp.asarray(idx))
        else:
            s = eval_step(params, jnp.asarray(dense_x), jnp.asarray(idx),
                          jnp.asarray(bw))
        scores.append(np.asarray(s))
        labels.append(np.asarray(y))
    return binary_metrics(np.concatenate(scores), np.concatenate(labels))


def train(params: DLRMParams, cfg: DLRMConfig, tcfg: TrainConfig,
          train_batches: Iterable, test_batches=None,
          log_fn=print) -> Tuple[DLRMParams, OptState, Dict]:
    """Simple epoch driver (the big loop of dlrm_s_pytorch.py:1574-1854).
    train_batches: iterable of (dense, idx, labels) numpy batches."""
    from evstore_tpu.train.optim import (make_pack_spec, pack_tables,
                                         unpack_tables)
    pack_spec = (make_pack_spec(params, tcfg.optimizer)
                 if getattr(tcfg, "pack_gather", True) else {})
    step_fn = step_jit(make_train_step(cfg, tcfg, pack=pack_spec),
                       donate_argnums=(0, 1))
    opt_state = init_opt_state(params, tcfg)
    if pack_spec:
        params, opt_state = pack_tables(params, opt_state, pack_spec)
    history = {"loss": [], "it_per_s": None}
    losses = []
    t0 = time.perf_counter()
    n = 0
    for batch in train_batches:
        dense_x, idx, y, bw = unpack_batch(batch)
        if bw is None:
            params, opt_state, loss = step_fn(
                params, opt_state, jnp.asarray(dense_x), jnp.asarray(idx),
                jnp.asarray(y))
        else:
            params, opt_state, loss = step_fn(
                params, opt_state, jnp.asarray(dense_x), jnp.asarray(idx),
                jnp.asarray(y), jnp.asarray(bw))
        n += 1
        if n % max(tcfg.print_freq, 1) == 0:
            lv = float(loss)
            losses.append(lv)
            log_fn(f"step {n}: loss {lv:.6f}")
    jax.block_until_ready(params.dense)
    dt = time.perf_counter() - t0
    if pack_spec:
        params, opt_state = unpack_tables(params, opt_state, pack_spec)
    history["loss"] = losses
    history["it_per_s"] = n / dt if dt > 0 else float("inf")
    if test_batches is not None:
        history["eval"] = evaluate(params, cfg, test_batches)
    return params, opt_state, history
