"""SPMD sharded DLRM: row-sharded embedding tables + data-parallel MLPs.

The reference's multi-node path (DLRM_Net.distributed_forward,
dlrm_s_pytorch.py:529-578) keeps a table slice per rank, looks up the FULL
batch locally, then all-to-alls the looked-up rows so each rank holds all
tables x its batch slice, overlapped with the bottom MLP
(extend_distributed.py:389-486).

TPU-first re-design (one jitted SPMD program, collectives over ICI):

- 2D mesh (data, model).  MLP params replicated; embedding tables
  concatenated into per-table row-sharded arrays over "model"; batch sharded
  over "data".
- Lookup: every model-shard holds rows [r0, r0+Nl); each device resolves the
  indices that fall in its range (masked local gather) and the full rows are
  combined with a single `psum` over "model" — the exchange of looked-up rows.
  XLA overlaps this collective with the bottom MLP the same way the
  reference hand-overlaps its async all-to-all (latency-hiding scheduler).
- Backward: the psum's cotangent is masked back to local rows; row gradients
  are all-gathered over "data" (every replica of a table shard must apply the
  identical update), coalesced by segment-sum, and scatter-applied with the
  row-wise sparse optimizer (train/optim.py) — no dense [N, D] gradient ever
  exists.
- A `butterfly` variant (parallel/butterfly.py) reproduces the reference's
  table-wise sharding + lax.all_to_all exchange for uniform-size tables.
"""

from __future__ import annotations

import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from evstore_tpu.config import DLRMConfig, TrainConfig
from evstore_tpu.models.dlrm import (DLRMParams, dlrm_forward, dlrm_loss)
from evstore_tpu.models.embedding import md_lookup, qr_lookup
from evstore_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS, pad_rows_for_mesh
from evstore_tpu.train.optim import (OptState, PAD_ROW, dedup_rows,
                                     lr_schedule, make_optimizer,
                                     row_update)
from evstore_tpu.train.train_loop import (_merge_sparse, _pool_weights,
                                          _rows_for_table, _split_sparse)


def _params_specs(params: DLRMParams) -> DLRMParams:
    """PartitionSpecs mirroring the params pytree: MLPs + factorized tables
    replicated, plain tables row-sharded over the model axis."""
    dense_spec = jax.tree_util.tree_map(lambda _: P(), params.dense)
    def spec_for(p):
        out = {}
        for k, v in p.items():
            if k == "kind_plain":
                out[k] = P(MODEL_AXIS, None)
            else:
                out[k] = jax.tree_util.tree_map(lambda _: P(), v)
        return out
    sparse_spec = {name: spec_for(p) for name, p in params.sparse.items()}
    return DLRMParams(dense=dense_spec, sparse=sparse_spec)


def _opt_specs(opt_state: OptState, params_spec: DLRMParams) -> OptState:
    dense_spec = jax.tree_util.tree_map(lambda _: P(), opt_state.dense)
    sparse_spec = {}
    for name, st in opt_state.sparse.items():
        if name.endswith("__pool_w"):
            # pooling-weight state mirrors the replicated weights
            sparse_spec[name] = P()
        else:
            # row-wise state is sharded like the table's rows
            sparse_spec[name] = (P(MODEL_AXIS) if st.ndim == 1
                                 else P(MODEL_AXIS, None))
    return OptState(step=P(), dense=dense_spec, sparse=sparse_spec)


def shard_dlrm_params(params: DLRMParams, mesh: Mesh,
                      opt_state: OptState = None):
    """Pad plain tables to the model-axis size and device_put everything with
    its NamedSharding.  Returns (params, opt_state?, specs...)."""
    n_model = mesh.shape[MODEL_AXIS]
    new_sparse = {}
    for name, p in params.sparse.items():
        if "kind_plain" in p:
            entry = dict(p)   # keep pool_w etc. (replicated)
            entry["kind_plain"] = pad_rows_for_mesh(p["kind_plain"], n_model)
            new_sparse[name] = entry
        else:
            new_sparse[name] = p
    params = DLRMParams(dense=params.dense, sparse=new_sparse)
    pspec = _params_specs(params)
    params = jax.device_put(
        params, jax.tree_util.tree_map(lambda s: NamedSharding(mesh, s), pspec,
                                       is_leaf=lambda x: isinstance(x, P)))
    if opt_state is None:
        return params, pspec
    new_sp = {}
    for name, st in opt_state.sparse.items():
        if name.endswith("__pool_w"):
            pass   # replicated, unpadded
        elif st.ndim == 1:
            target = params.sparse[name]["kind_plain"].shape[0]
            pad = target - st.shape[0]
            st = jnp.concatenate([st, jnp.zeros((pad,), st.dtype)]) if pad else st
        else:
            st = pad_rows_for_mesh(st, n_model)
        new_sp[name] = st
    opt_state = OptState(opt_state.step, opt_state.dense, new_sp)
    ospec = _opt_specs(opt_state, pspec)
    opt_state = jax.device_put(
        opt_state, jax.tree_util.tree_map(lambda s: NamedSharding(mesh, s), ospec,
                                          is_leaf=lambda x: isinstance(x, P)))
    return params, opt_state, pspec, ospec


def _local_masked_gather(local_table: jnp.ndarray, idx: jnp.ndarray,
                         n_local: int) -> jnp.ndarray:
    """Gather rows owned by this model shard; zeros elsewhere.  Combined with
    psum over MODEL_AXIS this implements the looked-up-row exchange."""
    shard = jax.lax.axis_index(MODEL_AXIS)
    r0 = shard * n_local
    pos = idx - r0
    in_range = (pos >= 0) & (pos < n_local)
    rows = jnp.take(local_table, jnp.clip(pos, 0, n_local - 1), axis=0)
    return jnp.where(in_range[:, None], rows, 0.0)


def _sharded_lookup(plain_local: Dict, fact: Dict, idx: jnp.ndarray,
                    plain_rows_in: Dict, cfg: DLRMConfig,
                    pool_w: Dict = None, inv: Dict = None,
                    bag_weights: jnp.ndarray = None) -> jnp.ndarray:
    """Post-exchange assembly of [Bl, T, D].  idx may be [Bl, T] or
    [Bl, T, L] (multi-hot); exchanged plain rows arrive FLAT ([Bl*L, D] or
    unique) and are sum-pooled here — pooling commutes with the psum
    exchange, so bags need no protocol change."""
    multi = idx.ndim == 3
    rows = []
    for t in range(cfg.num_tables):
        name = f"table_{t}"
        ids = idx[:, t]
        flat = ids.reshape(-1) if multi else ids
        if name in plain_rows_in:
            r = plain_rows_in[name]
            if inv and name in inv:
                # dedup exchange shipped unique rows; expand to per-sample
                r = jnp.take(r, inv[name], axis=0)
            if pool_w and name in pool_w:
                # pooling weights are replicated; apply post-exchange
                r = r * jnp.take(pool_w[name], flat, axis=0)
        else:
            r = _rows_for_table(name, fact, {}, flat, cfg)
        if multi:
            from evstore_tpu.models.embedding import pool_bags
            r = pool_bags(r.reshape(ids.shape[0], ids.shape[1], -1),
                          None if bag_weights is None else bag_weights[:, t])
        rows.append(r)
    return jnp.stack(rows, axis=1)


def _dedup_unique(idx_col: jnp.ndarray, n_rows_global: int):
    """Static-shape per-table dedup: [Bl] ids -> (uniq[U], inv[Bl]) with
    U = min(Bl, n_rows_global) and PAD_ROW filling unused slots.  The exchange
    then ships U unique rows instead of Bl duplicated ones (SURVEY §7 hard
    part v: dedup the row exchange to stay near speed-of-light bandwidth —
    for Criteo most tables have n_rows << batch, so U << Bl)."""
    u_cap = min(int(idx_col.shape[0]), n_rows_global)
    return jnp.unique(idx_col, return_inverse=True, size=u_cap,
                      fill_value=PAD_ROW)


def make_sharded_train_step(cfg: DLRMConfig, tcfg: TrainConfig, mesh: Mesh,
                            global_batch: int, dedup_exchange: bool = False,
                            multihot: bool = False):
    """Returns a jitted SPMD train step over global (sharded) arrays:
    (params, opt_state, dense_x[B], idx[B,T], labels[B]) ->
    (params, opt_state, loss).

    dedup_exchange=True ships min(Bl, n_rows) UNIQUE rows per table through
    the psum exchange instead of Bl duplicated rows, expanding to per-sample
    rows after the collective.  The backward pass then all-gathers coalesced
    unique-row grads over the data axis (smaller than per-sample grads).

    multihot=True adds a trailing bag_weights[B, T, L] arg and takes
    idx[B, T, L]: each of the B*L looked-up rows rides the same exchange
    (sum-pooling commutes with psum), ≙ the reference's EmbeddingBag bags
    through its all-to-all (dlrm_s_pytorch.py:407-459 + :564-570)."""
    opt_init, dense_update, sparse_update = make_optimizer(tcfg.optimizer)
    lr_fn = lr_schedule(tcfg.learning_rate, tcfg.lr_num_warmup_steps,
                        tcfg.lr_decay_start_step, tcfg.lr_num_decay_steps)
    n_data = mesh.shape[DATA_AXIS]
    n_model = mesh.shape[MODEL_AXIS]

    def local_step(params: DLRMParams, opt_state: OptState,
                   dense_x, idx, labels, bag_weights=None):
        # shapes here are per-device: dense_x [Bl, nd], idx [Bl, T(, L)]
        L = idx.shape[2] if multihot else 1

        def flat_ids(t):
            col = idx[:, t]
            return col.reshape(-1) if multihot else col

        plain_local, fact = _split_sparse(params.sparse)

        # --- forward-visible lookup: masked local gather + psum exchange ---
        inv_map = {}           # table -> [Bl*L] positions into unique rows
        uniq_map = {}          # table -> [U] unique global row ids

        def gather_rows(plain_tabs):
            parts = {}
            for name, tab in plain_tabs.items():
                t = int(name.split("_")[1])
                if dedup_exchange:
                    uniq, inv = _dedup_unique(flat_ids(t),
                                              tab.shape[0] * n_model)
                    uniq_map[name], inv_map[name] = uniq, inv
                    parts[name] = _local_masked_gather(tab, uniq,
                                                       tab.shape[0])
                else:
                    parts[name] = _local_masked_gather(tab, flat_ids(t),
                                                       tab.shape[0])
            # one fused collective for all tables (vs 26 tiny ones)
            return jax.lax.psum(parts, MODEL_AXIS)

        plain_rows = gather_rows(plain_local)

        def loss_fn(dense_params, fact_params, plain_rows_in):
            emb = _sharded_lookup(plain_local, fact_params, idx,
                                  plain_rows_in, cfg,
                                  _pool_weights(params.sparse), inv_map,
                                  bag_weights)
            logits = dlrm_forward(DLRMParams(dense_params, params.sparse),
                                  dense_x, idx, cfg, emb_rows=emb)
            return dlrm_loss(logits, labels, tcfg.loss_function,
                             tcfg.loss_weights)

        local_loss, (g_dense, g_fact, g_rows) = jax.value_and_grad(
            loss_fn, argnums=(0, 1, 2))(params.dense, fact, plain_rows)

        # global loss / dense grads: mean over data axis (DDP all-reduce ≙
        # extend_distributed DDP wrap)
        loss = jax.lax.pmean(local_loss, DATA_AXIS)
        g_dense = jax.lax.pmean(g_dense, DATA_AXIS)
        g_fact = jax.lax.pmean(g_fact, DATA_AXIS)

        lr = lr_fn(opt_state.step)
        dense_like = {"mlp": params.dense, "fact": fact}
        g_dense_like = {"mlp": g_dense, "fact": g_fact}
        new_dstate, new_dense_like = dense_update(
            opt_state.dense if opt_state.dense else {}, dense_like,
            g_dense_like, lr)

        # --- sparse row updates ---
        # every data-replica of a table shard must apply the identical update:
        # all-gather (idx, row-grad) over the data axis, then dedup + scatter.
        new_plain, new_sstate = {}, {}
        global_rows = global_batch * L   # all looked-up rows across bags
        for name, tab in plain_local.items():
            t = int(name.split("_")[1])
            if dedup_exchange:
                # grads are already coalesced per local-unique row; gather the
                # (smaller) unique set across data replicas
                ids_local = uniq_map[name]
                n_uniq = n_data * ids_local.shape[0]
            else:
                ids_local = flat_ids(t)
                n_uniq = global_rows
            g_full = jax.lax.all_gather(g_rows[name], DATA_AXIS, tiled=True)
            idx_full = jax.lax.all_gather(ids_local, DATA_AXIS, tiled=True)
            # grads of the mean over local batch -> scale to global mean
            g_full = g_full / n_data
            # map to local row space; out-of-shard rows -> PAD_ROW (dropped
            # by every row_update lowering)
            shard = jax.lax.axis_index(MODEL_AXIS)
            n_local = tab.shape[0]
            pos = idx_full - shard * n_local
            pos = jnp.where((pos >= 0) & (pos < n_local), pos, PAD_ROW)
            st = opt_state.sparse.get(name) if opt_state.sparse else None
            new_st, new_tab = row_update(tcfg.optimizer, st, tab, pos,
                                         g_full, lr)
            new_plain[name] = new_tab
            if new_st is not None:
                new_sstate[name] = new_st

        new_params = DLRMParams(dense=new_dense_like["mlp"],
                                sparse=_merge_sparse(
                                    new_plain, new_dense_like["fact"],
                                    _pool_weights(params.sparse)))
        new_opt = OptState(step=opt_state.step + 1, dense=new_dstate,
                           sparse={**opt_state.sparse, **new_sstate}
                           if opt_state.sparse else {})
        return new_params, new_opt, loss

    def build(params: DLRMParams, opt_state: OptState):
        pspec = _params_specs(params)
        ospec = _opt_specs(opt_state, pspec)
        data_spec = P(DATA_AXIS)
        in_specs = (pspec, ospec, data_spec, data_spec, data_spec)
        if multihot:
            in_specs = in_specs + (data_spec,)
        shard_fn = jax.shard_map(
            local_step, mesh=mesh,
            in_specs=in_specs,
            out_specs=(pspec, ospec, P()),
            check_vma=False)
        return jax.jit(shard_fn, donate_argnums=(0, 1))

    return build


def make_sharded_eval_step(cfg: DLRMConfig, mesh: Mesh,
                           dedup_exchange: bool = False,
                           multihot: bool = False):
    """Sharded inference: same exchange, no updates. Returns probabilities."""
    n_model = mesh.shape[MODEL_AXIS]

    def local_fwd(params: DLRMParams, dense_x, idx, bag_weights=None):
        def flat_ids(t):
            col = idx[:, t]
            return col.reshape(-1) if multihot else col

        plain_local, fact = _split_sparse(params.sparse)
        parts, inv_map = {}, {}
        for name, tab in plain_local.items():
            t = int(name.split("_")[1])
            if dedup_exchange:
                uniq, inv = _dedup_unique(flat_ids(t), tab.shape[0] * n_model)
                inv_map[name] = inv
                parts[name] = _local_masked_gather(tab, uniq, tab.shape[0])
            else:
                parts[name] = _local_masked_gather(tab, flat_ids(t),
                                                   tab.shape[0])
        plain_rows = jax.lax.psum(parts, MODEL_AXIS)
        emb = _sharded_lookup(plain_local, fact, idx, plain_rows, cfg,
                              _pool_weights(params.sparse), inv_map,
                              bag_weights)
        logits = dlrm_forward(params, dense_x, idx, cfg, emb_rows=emb)
        return jax.nn.sigmoid(logits)

    def build(params: DLRMParams):
        pspec = _params_specs(params)
        in_specs = (pspec, P(DATA_AXIS), P(DATA_AXIS))
        if multihot:
            in_specs = in_specs + (P(DATA_AXIS),)
        shard_fn = jax.shard_map(
            local_fwd, mesh=mesh,
            in_specs=in_specs,
            out_specs=P(DATA_AXIS),
            check_vma=False)
        return jax.jit(shard_fn)

    return build
