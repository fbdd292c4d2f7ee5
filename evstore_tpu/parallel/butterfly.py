"""Table-wise sharded embedding with lax.all_to_all exchange — the
reference's butterfly.

Reference: DLRM_Net.distributed_forward (dlrm_s_pytorch.py:529-578): each
rank owns a contiguous slice of the tables, looks up the FULL batch for its
local tables, then an all-to-all redistributes so each rank holds ALL tables
x ITS batch slice, overlapped with the bottom MLP
(extend_distributed.py:389-486).

TPU-native: a 1D mesh; tables stacked [T_pad, N_max, D] and sharded on the
table axis; `jax.lax.all_to_all(ly, axis, split_axis=batch, concat_axis=
table)` is the butterfly; XLA's latency-hiding scheduler overlaps it with
the bottom MLP automatically (the reference does this by hand with async
NCCL requests).  Gradients flow through the transposed all-to-all for free.

This mode requires near-uniform table sizes (the stack pads every table to
N_max); the row-sharded mode (parallel/sharded.py) is the one for skewed
tables like Criteo Kaggle.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from evstore_tpu.config import DLRMConfig, TrainConfig
from evstore_tpu.models.dlrm import DLRMParams, dlrm_forward, dlrm_loss
from evstore_tpu.train.optim import (OptState, PAD_ROW, dedup_rows,
                                     lr_schedule, make_optimizer)

AXIS = "devices"


def _default_order(T: int, n_devices: int) -> Tuple[int, ...]:
    T_pad = -(-T // n_devices) * n_devices
    return tuple(list(range(T)) + [-1] * (T_pad - T))


def stack_tables(params: DLRMParams, n_devices: int,
                 table_order: Tuple[int, ...] = None
                 ) -> Tuple[jnp.ndarray, int]:
    """[T_pad, N_max, D] stacked tables (zero-padded); returns (stack, T).

    table_order (e.g. from parallel/planner.plan_table_shards) places table
    table_order[i] in stack slot i (-1 = empty padded slot); shard s owns
    slots [s*Tl, (s+1)*Tl)."""
    tabs = []
    for t in range(len(params.sparse)):
        p = params.sparse[f"table_{t}"]
        if "kind_plain" not in p:
            raise ValueError("butterfly mode requires plain tables")
        tabs.append(p["kind_plain"])
    T = len(tabs)
    order = table_order or _default_order(T, n_devices)
    n_max = max(t.shape[0] for t in tabs)
    D = tabs[0].shape[1]
    T_pad = -(-T // n_devices) * n_devices
    if len(order) != T_pad or sorted(o for o in order if o >= 0) != list(
            range(T)):
        raise ValueError("table_order must place each table exactly once "
                         f"in {T_pad} slots")
    stack = jnp.zeros((T_pad, n_max, D), tabs[0].dtype)
    for slot, t in enumerate(order):
        if t >= 0:
            stack = stack.at[slot, :tabs[t].shape[0]].set(tabs[t])
    return stack, T


def unstack_tables(stack: jnp.ndarray, params: DLRMParams,
                   table_order: Tuple[int, ...] = None) -> DLRMParams:
    T = len(params.sparse)
    order = table_order if table_order is not None else tuple(range(T))
    pos_of = {t: slot for slot, t in enumerate(order) if t >= 0}
    new_sparse = {}
    for t in range(T):
        n = params.sparse[f"table_{t}"]["kind_plain"].shape[0]
        new_sparse[f"table_{t}"] = {"kind_plain": stack[pos_of[t], :n]}
    return DLRMParams(params.dense, new_sparse)


def make_butterfly_train_step(cfg: DLRMConfig, tcfg: TrainConfig, mesh: Mesh,
                              global_batch: int, dedup_exchange: bool = False,
                              table_order: Tuple[int, ...] = None,
                              multihot: bool = False):
    """Returns build(params) -> jitted step over
    (dense_params, stack, opt_dense, row_state[T_pad, N_max... no:
    rwsadagrad row state is [T_pad, N_max]], step, dense_x, idx, labels).

    Simplified state layout: (dense, stack, opt) explicit tuple.

    dedup_exchange=True ships, per (local table, destination shard), only the
    U = min(Bl, N_max) UNIQUE rows of that destination's batch slice through
    the all_to_all instead of the full [B, Tl, D] block — cutting exchange
    bytes by Bl/U (large for small/skewed Criteo tables).  Both sides run
    the same deterministic jnp.unique, so only rows travel: the destination
    reconstructs per-sample rows from its locally recomputed inverse map.
    The backward all_to_all then carries per-unique-row grads (already
    coalesced within each destination slice) — the sparse-update gather
    shrinks by the same factor.  (SURVEY §7 hard part v, butterfly form.)

    multihot=True accepts idx [B, T, L] bags + bag_weights [B, T, L]
    (EmbeddingBag per_sample_weights, dlrm_s_pytorch.py:407-459, riding the
    reference's a2a at :564-570).  Sum-pooling commutes with the exchange,
    so the dense path pools each bag BEFORE the all_to_all (wire format
    unchanged: [B, Tl, D] pooled rows); the dedup path instead ships unique
    rows of the flattened bag ids and pools on the destination after
    reconstruction (weights are applied inside the loss, so autodiff
    delivers per-unique-row grads directly).
    """
    opt_init, dense_update, sparse_update = make_optimizer(tcfg.optimizer)
    lr_fn = lr_schedule(tcfg.learning_rate, tcfg.lr_num_warmup_steps,
                        tcfg.lr_decay_start_step, tcfg.lr_num_decay_steps)
    n_dev = mesh.shape[AXIS]
    T = cfg.num_tables
    B = global_batch
    Bl = B // n_dev
    order = (table_order if table_order is not None
             else _default_order(T, n_dev))
    # slot -> table id (clamped for padded slots; their grads are zero) and
    # table -> slot (static, for the destination-side reorder)
    order_np = np.asarray([max(o, 0) for o in order], np.int32)
    pos_of = [order.index(t) for t in range(T)]

    def local_step_dedup(dense_params, stack_local, dstate, row_state_local,
                         step, dense_x, idx_full, labels, bag_weights=None):
        # stack_local: [Tl, N_max, D]; idx_full: [B, T] (or [B, T, L] bags)
        # replicated; bag_weights: [B, T, L] replicated (multihot only)
        Tl, n_max, D = stack_local.shape
        shard = jax.lax.axis_index(AXIS)
        L = idx_full.shape[2] if multihot else 1
        U = min(Bl * L, n_max)

        # --- source side: per (local table, dest shard) unique rows over
        # the FLATTENED bag ids of that dest's batch slice ---
        order_arr = jnp.asarray(order_np)
        uniq_src = []                       # [Tl][n_dev] each [U] global ids
        parts = []
        for tl in range(Tl):
            ot = order_arr[shard * Tl + tl]     # slot -> table id
            col = jnp.take(idx_full, ot, axis=1)
            col2 = col.reshape(n_dev, Bl * L)   # dest-major batch slices
            per_dest_rows, per_dest_ids = [], []
            for d in range(n_dev):
                uniq = jnp.unique(col2[d], size=U, fill_value=PAD_ROW)
                rows = jnp.take(stack_local[tl],
                                jnp.clip(uniq, 0, n_max - 1), axis=0)
                rows = jnp.where((uniq != PAD_ROW)[:, None], rows, 0.0)
                per_dest_rows.append(rows)
                per_dest_ids.append(uniq)
            parts.append(jnp.stack(per_dest_rows, 0))      # [n_dev, U, D]
            uniq_src.append(per_dest_ids)
        ly_u = jnp.stack(parts, 1)          # [n_dev(dest), Tl, U, D]

        # --- dest side: inverse maps over OUR batch slice (same unique) ---
        inv_rows = []
        for t in range(T):
            col_l = jnp.take(idx_full[:, t].reshape(n_dev, Bl * L), shard,
                             axis=0)
            _, inv = jnp.unique(col_l, return_inverse=True, size=U,
                                fill_value=PAD_ROW)
            inv_rows.append(inv.reshape(-1))
        inv_mat = jnp.stack(inv_rows, 0)    # [T, Bl*L]

        def loss_fn(dparams, ly_in):
            recv = jax.lax.all_to_all(ly_in, AXIS, split_axis=0,
                                      concat_axis=0, tiled=True)
            recv = recv.reshape(n_dev * Tl, U, D)          # slot-major
            recv = jnp.take(recv, jnp.asarray(pos_of, jnp.int32),
                            axis=0)                        # [T, U, D]
            ly = jax.vmap(lambda r, i: jnp.take(r, i, axis=0))(recv, inv_mat)
            if multihot:
                ly = ly.reshape(T, Bl, L, D).transpose(1, 0, 2, 3)
                w_l = (None if bag_weights is None else
                       jnp.take(bag_weights.reshape(n_dev, Bl, T, L), shard,
                                axis=0))
                if w_l is not None:
                    ly = ly * w_l[..., None].astype(ly.dtype)
                ly = ly.sum(axis=2)                        # [Bl, T, D]
            else:
                ly = jnp.moveaxis(ly, 0, 1)                # [Bl, T, D]
            logits = dlrm_forward(DLRMParams(dparams, {}), dense_x, None,
                                  cfg, emb_rows=ly)
            return dlrm_loss(logits, labels, tcfg.loss_function,
                             tcfg.loss_weights)

        loss, (g_dense, g_u) = jax.value_and_grad(loss_fn, argnums=(0, 1))(
            dense_params, ly_u)
        loss = jax.lax.pmean(loss, AXIS)
        g_dense = jax.lax.pmean(g_dense, AXIS)

        lr = lr_fn(step)
        new_dstate, new_dense = dense_update(dstate if dstate else {},
                                             dense_params, g_dense, lr)

        # sparse updates: g_u [n_dev, Tl, U, D] is already coalesced per
        # unique row within each dest slice; coalesce across slices and
        # scatter-apply.  Scale local-mean -> global-mean loss.
        g_u = g_u / n_dev
        new_stack = stack_local
        new_row_state = row_state_local
        for tl in range(Tl):
            ids = jnp.concatenate(uniq_src[tl])            # [n_dev*U]
            g = g_u[:, tl].reshape(n_dev * U, D)
            uniq, summed, valid = dedup_rows(ids, g, min(n_dev * U, B * L))
            st = (new_row_state[tl] if new_row_state is not None else None)
            new_st, new_tab = sparse_update(st, new_stack[tl], uniq, summed,
                                            valid, lr)
            new_stack = new_stack.at[tl].set(new_tab)
            if new_st is not None:
                new_row_state = new_row_state.at[tl].set(new_st)
        return new_dense, new_stack, new_dstate, new_row_state, loss

    def local_step(dense_params, stack_local, dstate, row_state_local, step,
                   dense_x, idx_full, labels, bag_weights=None):
        # stack_local: [Tl, N_max, D]; idx_full: [B, T] (or [B, T, L] bags)
        # replicated; bag_weights: [B, T, L] replicated (multihot only)
        Tl = stack_local.shape[0]
        shard = jax.lax.axis_index(AXIS)
        L = idx_full.shape[2] if multihot else 1

        order_arr = jnp.asarray(order_np)

        def lookup(stack_l):
            outs = []
            for tl in range(Tl):
                # slot -> table id (padded slots clamp to 0; zero rows)
                ot = order_arr[shard * Tl + tl]
                col = jnp.take(idx_full, ot, axis=1)
                rows = jnp.take(stack_l[tl], col, axis=0)
                if multihot:
                    # sum-pooling commutes with the a2a: pool the bag BEFORE
                    # the exchange so the wire format stays [B, Tl, D]
                    from evstore_tpu.models.embedding import pool_bags
                    w = (None if bag_weights is None
                         else jnp.take(bag_weights, ot, axis=1))
                    rows = pool_bags(rows, w)
                outs.append(rows)
            return jnp.stack(outs, axis=1)         # [B, Tl, D]

        ly_local = lookup(stack_local)

        def loss_fn(dparams, ly_loc):
            # butterfly: full batch x local tables -> local batch x all tables
            ly = jax.lax.all_to_all(ly_loc, AXIS, split_axis=0, concat_axis=1,
                                    tiled=True)    # [Bl, T_pad, D] slot-major
            ly = jnp.take(ly, jnp.asarray(pos_of, jnp.int32), axis=1)
            logits = dlrm_forward(DLRMParams(dparams, {}), dense_x, None,
                                  cfg, emb_rows=ly)
            return dlrm_loss(logits, labels, tcfg.loss_function,
                             tcfg.loss_weights)

        loss, (g_dense, g_ly) = jax.value_and_grad(loss_fn, argnums=(0, 1))(
            dense_params, ly_local)
        loss = jax.lax.pmean(loss, AXIS)
        g_dense = jax.lax.pmean(g_dense, AXIS)

        lr = lr_fn(step)
        new_dstate, new_dense = dense_update(dstate if dstate else {},
                                             dense_params, g_dense, lr)

        # sparse updates on the local table stack: g_ly [B, Tl, D] covers the
        # FULL batch for local tables (no all-gather needed — this mode's
        # advantage), scaled from local-mean to global-mean loss
        g_ly = g_ly / n_dev
        new_stack = stack_local
        new_row_state = row_state_local
        n_max = stack_local.shape[1]
        for tl in range(Tl):
            ot = order_arr[shard * Tl + tl]
            col = jnp.take(idx_full, ot, axis=1)
            if multihot:
                # pooled-row grad -> per-bag-entry grads (chain rule of the
                # pre-exchange sum-pool: g_row[b,l] = g_pooled[b] * w[b,l])
                gt = g_ly[:, tl, :][:, None, :]            # [B, 1, D]
                if bag_weights is not None:
                    w = jnp.take(bag_weights, ot, axis=1)  # [B, L]
                    gt = gt * w[..., None].astype(gt.dtype)
                else:
                    gt = jnp.broadcast_to(gt, (B, L, gt.shape[2]))
                col = col.reshape(-1)
                uniq, summed, valid = dedup_rows(
                    col, gt.reshape(B * L, -1), min(B * L, n_max))
            else:
                uniq, summed, valid = dedup_rows(col, g_ly[:, tl, :], B)
            st = (new_row_state[tl] if new_row_state is not None else None)
            new_st, new_tab = sparse_update(st, new_stack[tl], uniq, summed,
                                            valid, lr)
            new_stack = new_stack.at[tl].set(new_tab)
            if new_st is not None:
                new_row_state = new_row_state.at[tl].set(new_st)
        return new_dense, new_stack, new_dstate, new_row_state, loss

    def build(dense_params, stack, dstate, row_state):
        dense_spec = jax.tree_util.tree_map(lambda _: P(), dense_params)
        dstate_spec = jax.tree_util.tree_map(lambda _: P(), dstate)
        stack_spec = P(AXIS, None, None)
        row_spec = (P(AXIS, None) if row_state is not None else None)
        in_specs = (dense_spec, stack_spec, dstate_spec, row_spec, P(),
                    P(AXIS), P(), P(AXIS))
        if multihot:
            in_specs = in_specs + (P(),)   # bag_weights: full-batch, replic.
        out_specs = (dense_spec, stack_spec, dstate_spec, row_spec, P())
        body = local_step_dedup if dedup_exchange else local_step
        fn = jax.shard_map(body, mesh=mesh, in_specs=in_specs,
                           out_specs=out_specs, check_vma=False)
        return jax.jit(fn, donate_argnums=(1, 3))

    return build


def init_butterfly_state(params: DLRMParams, tcfg: TrainConfig, mesh: Mesh,
                         table_order: Tuple[int, ...] = None):
    """(dense_params, stack, dense_opt_state, row_state) device_put with
    shardings."""
    opt_init, _, _ = make_optimizer(tcfg.optimizer)
    n_dev = mesh.shape[AXIS]
    stack, T = stack_tables(params, n_dev, table_order)
    if tcfg.optimizer == "sgd":
        dstate = {}
        row_state = None
    else:
        dstate = jax.tree_util.tree_map(
            lambda p: jnp.zeros_like(p, dtype=jnp.float32), params.dense)
        if tcfg.optimizer == "rwsadagrad":
            row_state = jnp.zeros(stack.shape[:2], jnp.float32)
        else:
            row_state = jnp.zeros(stack.shape, jnp.float32)
    dense = jax.device_put(params.dense, NamedSharding(mesh, P()))
    stack = jax.device_put(stack, NamedSharding(mesh, P(AXIS, None, None)))
    if row_state is not None:
        spec = P(AXIS, None) if row_state.ndim == 2 else P(AXIS, None, None)
        row_state = jax.device_put(row_state, NamedSharding(mesh, spec))
    return dense, stack, dstate, row_state
