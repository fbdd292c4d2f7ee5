"""Optimizers and LR policy for DLRM training.

Reference: SGD/Adagrad/RWSAdagrad selection (dlrm_s_pytorch.py:1383-1410) and
LRPolicyScheduler (:168-202); row-wise sparse Adagrad in optim/rwsadagrad.py.

TPU-first design: instead of torch sparse tensors, the embedding update path
receives *per-batch row gradients* (the gradient w.r.t. the gathered rows,
deduplicated by segment-sum) and applies a scatter update touching only the
rows seen in the batch.  MLP ("dense") params get the plain dense update.
Everything is jittable; the optimizer state is an explicit pytree.

rwsAdagrad semantics (optim/rwsadagrad.py:109-118):
  sparse rows:  momentum[row] += mean(grad_row^2);  p[row] -= lr*grad_row /
                (sqrt(momentum[row]) + eps)
  dense params: sum += grad^2;  p -= lr*grad/(sqrt(sum)+eps)
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp


def lr_schedule(base_lr: float, num_warmup_steps: int, decay_start_step: int,
                num_decay_steps: int):
    """Returns step -> lr, matching LRPolicyScheduler (dlrm_s_pytorch.py:180-202):
    linear warmup to base over warmup steps; then flat; then quadratic decay
    over num_decay_steps with floor 1e-7; frozen at the floor afterwards."""
    decay_end_step = decay_start_step + num_decay_steps

    def lr(step):
        step = jnp.asarray(step, jnp.float32)
        warm = jnp.float32(max(num_warmup_steps, 1))
        warm_lr = base_lr * (1.0 - (warm - step) / warm)
        dec = jnp.clip((decay_end_step - step) / jnp.float32(max(num_decay_steps, 1)), 0.0, 1.0)
        decay_lr = jnp.maximum(1e-7, base_lr * dec * dec)
        out = jnp.where(step < num_warmup_steps, warm_lr, base_lr)
        if num_decay_steps > 0:
            out = jnp.where(step >= decay_start_step, decay_lr, out)
        return out

    return lr


class OptState(NamedTuple):
    step: jnp.ndarray
    dense: Dict       # per-dense-param state (adagrad sums), {} for sgd
    sparse: Dict      # per-table row-wise accumulators, {} for sgd


def _zeros_like_tree(tree):
    return jax.tree_util.tree_map(lambda p: jnp.zeros_like(p, dtype=jnp.float32), tree)


def make_optimizer(name: str, eps: float = 1e-10):
    """Returns (init_fn, dense_update_fn, sparse_row_update_fn).

    dense_update_fn(state_tree, params_tree, grads_tree, lr) -> (new_state, new_params)
    sparse_row_update_fn(row_state[N], table[N,D], rows_idx[K], row_grads[K,D],
                         count[K], lr) -> (new_row_state, new_table)
    where rows_idx may contain a padding row (count==0 entries are masked out).
    """
    name = name.lower()
    if name not in ("sgd", "adagrad", "rwsadagrad"):
        raise ValueError(f"unsupported optimizer {name}")

    def init(params) -> OptState:
        if name == "sgd":
            return OptState(jnp.zeros((), jnp.int32), {}, {})
        dense_state = _zeros_like_tree(params.dense)
        if name == "adagrad":
            # full elementwise accumulators for embeddings too
            sparse_state = _zeros_like_tree(params.sparse)
        else:  # rwsadagrad: one scalar accumulator per row
            sparse_state = jax.tree_util.tree_map(
                lambda p: jnp.zeros((p.shape[0],), jnp.float32)
                if p.ndim == 2 else jnp.zeros_like(p, dtype=jnp.float32),
                params.sparse)
        return OptState(jnp.zeros((), jnp.int32), dense_state, sparse_state)

    def dense_update(state_tree, params_tree, grads_tree, lr):
        if name == "sgd":
            new_params = jax.tree_util.tree_map(
                lambda p, g: (p - lr * g.astype(jnp.float32)).astype(p.dtype),
                params_tree, grads_tree)
            return state_tree, new_params
        # adagrad / rwsadagrad dense branch are identical (rwsadagrad.py:115-118)
        new_state = jax.tree_util.tree_map(
            lambda s, g: s + g.astype(jnp.float32) ** 2, state_tree, grads_tree)
        new_params = jax.tree_util.tree_map(
            lambda p, g, s: (p - lr * g.astype(jnp.float32) / (jnp.sqrt(s) + eps)).astype(p.dtype),
            params_tree, grads_tree, new_state)
        return new_state, new_params

    def sparse_row_update(row_state, table, rows_idx, row_grads, valid, lr):
        """Row update touching only `rows_idx` (one entry per unique row
        in the batch).  Padding entries carry rows_idx == INT32_MAX (see
        PAD_ROW): genuinely out-of-bounds for any table, so mode="drop"
        discards their writes (note: negative indices WRAP in XLA scatter,
        they are not dropped — never use -1 as the padding sentinel); `valid`
        also masks their contribution defensively.

        The apply goes through `scatter_rows_add`, which picks (statically)
        between a real scatter and a bandwidth-bound dense pass — XLA's TPU
        row scatter serializes per update (~135 ns/row into an HBM-resident
        [1M, 36] operand, measured on v5e) while a full-table gather-add
        pass runs at HBM bandwidth."""
        g = row_grads.astype(jnp.float32) * valid[:, None]
        if name == "sgd":
            new_table = scatter_rows_add(table, rows_idx, -lr * g)
            return row_state, new_table
        if name == "adagrad":
            # elementwise accumulator rows
            acc_rows = row_state.at[rows_idx].get(mode="fill", fill_value=0.0) + g * g
            new_state = scatter_rows_add(row_state, rows_idx, g * g)
            upd = -lr * g / (jnp.sqrt(acc_rows) + eps)
            new_table = scatter_rows_add(table, rows_idx, upd)
            return new_state, new_table
        # rwsadagrad: scalar accumulator per row = mean over dim of grad^2
        mom_inc = jnp.mean(g * g, axis=1) * valid
        mom_rows = row_state.at[rows_idx].get(mode="fill", fill_value=0.0) + mom_inc
        new_state = scatter_rows_add(row_state, rows_idx, mom_inc)
        std = jnp.sqrt(mom_rows) + eps
        upd = -lr * g / std[:, None]
        new_table = scatter_rows_add(table, rows_idx, upd)
        return new_state, new_table

    return init, dense_update, sparse_row_update


def scatter_rows_add(table: jnp.ndarray, rows_idx: jnp.ndarray,
                     upd: jnp.ndarray) -> jnp.ndarray:
    """table[rows_idx] += upd with UNIQUE indices (PAD_ROW entries dropped),
    choosing the implementation statically by shape:

    - XLA's TPU scatter serializes row updates into HBM (~135 ns/row for
      [N=1M, D=36] fp32, measured on v5e regardless of unique/sorted flags),
      costing U * t_row.
    - A dense pass — build a [N] position map with a cheap D=1 scatter
      (~0.1 ms for 32k ids), then `table + take(upd_padded, pos)` — rewrites
      the whole table at HBM bandwidth, costing 2*N*rowbytes/BW, and XLA
      fuses the gather into the add.

    Crossover at N ≈ 256*U for D=36 on v5e (t_row*BW/rowbytes ≈ 135e-9 *
    560e9 / 288 ≈ 262), so small/medium tables take the dense pass and
    terabyte-scale tables keep the scatter.  Identical math either way
    (duplicate-free adds), so this is purely a lowering choice."""
    n = table.shape[0]
    u = rows_idx.shape[0]
    if upd.ndim == 1:
        upd2, tab2 = upd[:, None], table[:, None]
    else:
        upd2, tab2 = upd, table
    if n <= u * 256:
        pos = jnp.full((n,), u, jnp.int32).at[rows_idx].set(
            jnp.arange(u, dtype=jnp.int32), mode="drop")
        upd_pad = jnp.concatenate(
            [upd2.astype(jnp.float32),
             jnp.zeros((1, upd2.shape[1]), jnp.float32)])
        # pos is clamped by construction; clip skips the fill-select pass
        out = (tab2 + jnp.take(upd_pad, pos, axis=0, mode="clip")
               ).astype(table.dtype)
    else:
        out = tab2.at[rows_idx].add(upd2.astype(table.dtype), mode="drop",
                                    unique_indices=False)
    return out[:, 0] if upd.ndim == 1 else out


# Padding sentinel for row indices: out-of-bounds for every table, so
# mode="drop" scatters discard it and mode="fill" gathers return the fill.
# (XLA wraps negative indices in scatters, so -1 must NOT be used.)
PAD_ROW = jnp.iinfo(jnp.int32).max


# dense-grad lowering cutoff: above this the [N, D] zero+scatter-add grad
# buffer costs more than the rep-trick's D=1 map (v5e-measured crossover)
DENSE_GRAD_LIMIT_BYTES = 64 << 20

# Above DENSE_GRAD_LIMIT_BYTES the Pallas tile-sweep kernel
# (ops/pallas_update.py) replaces the rep-trick for rwsadagrad: XLA's row
# scatter/take serialize (~135 ns/row; ~13 ms per 1M-row table in the
# 5-table program, scripts/profile_update.py) while the sweep runs at HBM
# bandwidth.  The sweep reads+writes the WHOLE table though, so huge
# (terabyte-shard) tables fall back to the sort path when the sweep bytes
# exceed the scatter's serialized cost: one scattered row ~135 ns buys
# ~75.6 kB of sequential HBM traffic on v5e.
SWEEP_BYTES_PER_SCATTERED_ROW = 75_600


# The sweep wins its isolated A/B 2.74x (scripts/bench_pallas_update.py:
# 23.9 vs 65.6 ms for 5x1M tables) but currently LOSES in the full train
# step (60.8 vs 49.1 ms — scheduling interaction under investigation,
# scripts/profile_pallas_integration.py), so it is opt-in until the
# in-program number wins: ESV_PALLAS_SWEEP=1.
import os as _os
PALLAS_SWEEP_ENABLED = _os.environ.get("ESV_PALLAS_SWEEP", "0") == "1"


def _use_pallas_sweep(n: int, d: int, b: int, name: str) -> bool:
    if not PALLAS_SWEEP_ENABLED:
        return False
    if name != "rwsadagrad" or d > 128:
        return False
    if n * d * 4 <= DENSE_GRAD_LIMIT_BYTES:
        return False
    if n * d * 8 > b * SWEEP_BYTES_PER_SCATTERED_ROW:
        return False
    try:
        import jax
        return jax.default_backend() == "tpu"
    except Exception:   # pragma: no cover
        return False


def row_update(name: str, state, table: jnp.ndarray, ids: jnp.ndarray,
               grads: jnp.ndarray, lr, eps: float = 1e-10):
    """One-shot per-table sparse update: coalesce duplicate ids AND apply the
    optimizer, choosing the lowering statically by table size (all measured
    on v5e at B=32k, D=36):

    - dense-grad (N*D*4 <= 64 MB): G = zeros[N,D].at[ids].add(grads) — the
      dup-tolerant scatter-add is fast for VMEM-friendly operands — then
      bandwidth-bound full passes apply the optimizer.  No sort, no unique.
    - rep-trick (N <= 256*B): a D=1 scatter picks one representative
      occurrence per distinct row; segment-sum over representatives
      coalesces; a position map + full passes apply.  No sort.
    - sort path (huge/terabyte tables): jnp.unique dedup + row scatter —
      cost scales with B, not N.

    ids may contain PAD_ROW entries (dropped) and duplicates (coalesced);
    semantics identical across paths (exactness tests cross-check them).
    state: None (sgd) | [N, D] (adagrad) | [N] (rwsadagrad).
    """
    name = name.lower()
    n = table.shape[0]
    b = ids.shape[0]
    d = table.shape[1]
    g = grads.astype(jnp.float32)

    if _use_pallas_sweep(n, d, b, name):
        from evstore_tpu.ops.pallas_update import rwsadagrad_row_update_pallas
        return rwsadagrad_row_update_pallas(state, table, ids, g, lr)

    if n * d * 4 <= DENSE_GRAD_LIMIT_BYTES:
        G = jnp.zeros((n, d), jnp.float32).at[ids].add(g, mode="drop")
    elif n <= b * 256:
        slot = jnp.full((n,), b, jnp.int32).at[ids].set(
            jnp.arange(b, dtype=jnp.int32), mode="drop")
        rep = slot.at[ids].get(mode="fill", fill_value=b)
        Gc = jax.ops.segment_sum(g, rep, num_segments=b + 1)[:b]
        g_pad = jnp.concatenate([Gc, jnp.zeros((1, d), jnp.float32)])
        G = jnp.take(g_pad, jnp.minimum(slot, b), axis=0, mode="clip")
    else:
        uniq, summed, valid = dedup_rows(ids, g, b)
        st, tab = make_optimizer(name, eps)[2](state, table, uniq, summed,
                                               valid, lr)
        return st, tab

    # full-pass apply over the dense per-row grad G (0 for untouched rows)
    if name == "sgd":
        return state, (table.astype(jnp.float32) - lr * G).astype(table.dtype)
    if name == "adagrad":
        new_state = state + G * G
        upd = lr * G / (jnp.sqrt(new_state) + eps)
        return new_state, (table.astype(jnp.float32) - upd).astype(table.dtype)
    # rwsadagrad: row-scalar accumulator; untouched rows get +0 and upd 0
    new_state = state + jnp.mean(G * G, axis=1)
    upd = lr * G / (jnp.sqrt(new_state) + eps)[:, None]
    return new_state, (table.astype(jnp.float32) - upd).astype(table.dtype)


# ------------------------------------------------- packed big-table layout
#
# XLA's gather from an HBM-resident table costs per ROW and collapses as
# rows widen (v5e, 144 MB f32 operand, B=65536: D=36 42.6 ns/row vs D=72
# 4.0 — scripts/gather_width_sweep.py).  Storing a big table as
# [N/P, P*D] (same row-major bytes; P=2 on v5e) makes the forward gather
# ~10x faster; the sub-row id%P is selected with exact lane slices
# (models/embedding.py take_rows_packed_layout).  An in-graph reshape
# does NOT work — tiled device layouts differ and XLA inserts a 2.3
# ms/table relayout per step — so the packing lives in the STORED layout:
# pack once before the step scan, unpack after.


def make_pack_spec(params, optimizer: str) -> Dict[str, int]:
    """name -> P for plain tables worth packing (see
    models/embedding.pick_pack_factor).  All three optimizers are
    supported: sgd/adagrad updates are elementwise (packing-transparent);
    rwsadagrad's row-mean is handled by row_update_packed."""
    from evstore_tpu.models.embedding import pick_pack_factor
    spec = {}
    for name, p in params.sparse.items():
        if "kind_plain" not in p or "pool_w" in p:
            continue
        tab = p["kind_plain"]
        f = pick_pack_factor(tab.shape[0], tab.shape[1], tab.dtype.itemsize)
        if f > 1:
            spec[name] = f
    return spec


def pack_tables(params, opt_state: OptState, spec: Dict[str, int]):
    """Device-side relayout of the spec'd tables (and their optimizer
    state) into the packed shapes.  One-time cost.

    rwsadagrad tables become AUGMENTED packed arrays [N/P, P*d + P]: the
    P per-logical-row accumulators ride as extra lanes of the same row.
    The whole update is then ONE fused elementwise pass
    (aug - taken * signs, see row_update_packed) instead of a separate
    state pass that re-read the [N/P, P*d+P] take output for 2 lanes
    (~1.1 ms/table at B=65536); the gather cost is unchanged (74 lanes
    pad to the same 128-lane tile as 72).  opt_state keeps a [0]-shaped
    placeholder so the pytree structure survives.
    adagrad state mirrors the packed table shape; sgd has no state."""
    sparse = dict(params.sparse)
    sp_state = dict(opt_state.sparse)
    for name, f in spec.items():
        tab = sparse[name]["kind_plain"]
        n, d = tab.shape
        packed = tab.reshape(n // f, d * f)
        st = sp_state.get(name)
        if st is not None and getattr(st, "ndim", 0) == 1:   # rwsadagrad
            if packed.dtype == jnp.float32:
                # augmented lanes: exact, since the accumulator stays f32
                aug = jnp.concatenate(
                    [packed, st.reshape(n // f, f)], axis=1)
                sparse[name] = {"kind_plain": aug}
                sp_state[name] = jnp.zeros((0,), jnp.float32)  # placeholder
            else:
                # bf16 (or other) tables: the augmented trick would hold the
                # adagrad second moment in the table dtype and round away
                # small increments (round-4 advisor finding) — keep a
                # separate f32 [N/P, P] accumulator instead
                sparse[name] = {"kind_plain": packed}
                sp_state[name] = st.reshape(n // f, f)
        else:
            sparse[name] = {"kind_plain": packed}
            if st is not None and getattr(st, "ndim", 0) == 2:  # adagrad
                sp_state[name] = st.reshape(n // f, d * f)
    return (params._replace(sparse=sparse),
            opt_state._replace(sparse=sp_state))


def unpack_tables(params, opt_state: OptState, spec: Dict[str, int]):
    sparse = dict(params.sparse)
    sp_state = dict(opt_state.sparse)
    for name, f in spec.items():
        aug = sparse[name]["kind_plain"]
        np_, dpa = aug.shape
        st = sp_state.get(name)
        if st is not None and getattr(st, "shape", None) == (0,):
            # augmented rwsadagrad: split the accumulator lanes back out
            dp = dpa - f
            sparse[name] = {"kind_plain":
                            aug[:, :dp].reshape(np_ * f, dp // f)}
            sp_state[name] = aug[:, dp:].reshape(np_ * f).astype(jnp.float32)
        elif (st is not None and getattr(st, "ndim", 0) == 2
              and st.shape == (np_, f) and st.shape != aug.shape):
            # separate-accumulator rwsadagrad (non-f32 tables)
            sparse[name] = {"kind_plain": aug.reshape(np_ * f, dpa // f)}
            sp_state[name] = st.reshape(np_ * f)
        else:
            dp = dpa
            sparse[name] = {"kind_plain": aug.reshape(np_ * f, dp // f)}
            if st is not None and getattr(st, "ndim", 0) == 2:
                sp_state[name] = st.reshape(np_ * f, dp // f)
    return (params._replace(sparse=sparse),
            opt_state._replace(sparse=sp_state))


def row_update_packed(name: str, state, packed: jnp.ndarray,
                      ids: jnp.ndarray, grads: jnp.ndarray, pack: int,
                      lr, eps: float = 1e-10):
    """row_update against the packed layout.

    Logical semantics identical to row_update on the [N, d] view: the
    logical row grads [B, d] are widened into their sub-slot (exact: a
    0/1 one-hot product) and coalesced by PACKED row q = id//P; sub-slots
    never overlap, so summing widened grads of colliding logical rows is
    the same as updating each separately.

    sgd/adagrad are elementwise and go straight through row_update on the
    [N/P, P*d] packed array.  rwsadagrad receives the AUGMENTED array
    [N/P, P*d + P] (accumulator lanes ride the table rows, see
    pack_tables; `state` is the [0] placeholder): all statistics run on
    [b, .]-sized coalesced temps, the update rows AND accumulator
    increments ride one [b+1, P*d+P] row-take, and the whole apply is a
    single fused elementwise pass  aug - taken * signs  (signs = +1 on
    value lanes, -1 on accumulator lanes).  Trace-driven: the previous
    separate state pass re-read the take output for 2 lanes at ~1.1
    ms/table per step."""
    name = name.lower()
    b = ids.shape[0]
    q = jnp.where(ids == PAD_ROW, PAD_ROW, ids // pack)
    g = grads.astype(jnp.float32)

    def make_g_wide():
        # sub-slot widened grads [B, P*d] (each sample's grad lands in its
        # id%P block; exact — a 0/1 one-hot product).  Only the non-hot
        # fallback paths materialize this; the hot rep-trick path coalesces
        # on the interleaved [(b+1)*P, d] domain instead (below)
        oh = ((ids % pack)[:, None] ==
              jnp.arange(pack, dtype=jnp.int32)[None, :]).astype(jnp.float32)
        return jnp.concatenate([g * oh[:, k:k + 1] for k in range(pack)],
                               axis=1)

    if name in ("sgd", "adagrad"):
        return row_update(name, state, packed, q, make_g_wide(), lr, eps)

    if getattr(state, "ndim", 0) == 2:
        # separate f32 accumulator [N/P, P] (non-f32 tables — the augmented
        # lanes would round the second moment to the table dtype)
        return _row_update_packed_sepstate(state, packed, q, make_g_wide(),
                                           pack, lr, eps)

    npk, dpa = packed.shape            # augmented: dpa = P*d + P
    dp = dpa - pack
    d = dp // pack
    signs = jnp.concatenate([jnp.ones((dp,), jnp.float32),
                             -jnp.ones((pack,), jnp.float32)])[None, :]
    # per-logical-row mean of the coalesced grads (same values the logical
    # path's jnp.mean(G*G, axis=1) produces for touched rows)
    if npk > b * 256:
        # huge tables: dedup + augmented row scatter
        uniq, summed, valid = dedup_rows(q, make_g_wide(), b)
        gm = summed * valid[:, None]
        A = _block_mean_matrix(pack, d)
        mom_inc = jnp.dot(gm * gm, A, precision=jax.lax.Precision.HIGHEST)
        acc_old = packed.at[uniq].get(mode="fill",
                                      fill_value=0.0)[:, dp:]   # [U, P]
        new_acc = acc_old + mom_inc
        std = jnp.sqrt(new_acc) + eps
        scale = jnp.repeat(std, d, axis=1)
        delta = jnp.concatenate([-lr * gm / scale, mom_inc], axis=1)
        new_aug = scatter_rows_add(packed, uniq, delta)
        return state, new_aug

    # rep-trick: coalesce by PACKED row into [b, P*d] (tiny), stats on
    # [b, P], one wide row-take, ONE fused pass over the augmented array.
    # (An interleaved [(b+1)*P, d] segment-sum was tried in round 5 to
    # avoid materializing g_wide: 4.2 vs 2.5 ms — the narrow 36-lane
    # target pads 3.5x in VMEM and loses the scatter promotion.)
    slot = jnp.full((npk,), b, jnp.int32).at[q].set(
        jnp.arange(b, dtype=jnp.int32), mode="drop")
    rep = slot.at[q].get(mode="fill", fill_value=b)
    Gc = jax.ops.segment_sum(make_g_wide(), rep,
                             num_segments=b + 1)[:b]        # [b, P*d]
    mom_inc = jnp.stack(
        [jnp.mean(Gc[:, k * d:(k + 1) * d] ** 2, axis=1)
         for k in range(pack)], axis=1)                     # [b, P]
    # acc gathered as B rows from the aug carry — bounded, unlike the
    # forbidden [N]-scale carry gathers
    acc_c = jnp.take(packed, jnp.minimum(q, npk - 1), axis=0,
                     mode="clip")[:, dp:]
    std_c = jnp.sqrt(acc_c + mom_inc) + eps                 # [b, P]
    upd_c = jnp.concatenate(
        [lr * Gc[:, k * d:(k + 1) * d] / std_c[:, k:k + 1]
         for k in range(pack)], axis=1)                     # [b, P*d] tiny
    # signs folded into comb_pad on the tiny [b+1, .] domain so the wide
    # row-take feeds the subtract with no interior ops between them
    comb_pad = jnp.concatenate([
        jnp.concatenate([upd_c, -mom_inc], axis=1),
        jnp.zeros((1, dpa), jnp.float32)])                  # [b+1, P*d+P]
    taken = jnp.take(comb_pad, jnp.minimum(slot, b), axis=0,
                     mode="clip")                             # [npk, dpa]
    new_aug = (packed.astype(jnp.float32) - taken).astype(packed.dtype)
    return state, new_aug

def _row_update_packed_sepstate(state, packed, q, g_wide, pack, lr, eps):
    """rwsadagrad on a packed [N/P, P*d] table with a SEPARATE f32
    accumulator [N/P, P] (used when the table dtype is not f32, where the
    augmented-lane layout would silently hold the second moment in the
    table dtype).  Same math as the augmented path; two passes instead of
    the single fused one — this is the correctness fallback, not the hot
    configuration (f32 tables + augmented lanes)."""
    npk, dp = packed.shape
    b = q.shape[0]
    d = dp // pack
    if npk > b * 256:
        uniq, summed, valid = dedup_rows(q, g_wide, b)
        gm = summed * valid[:, None]
        A = _block_mean_matrix(pack, d)
        mom_inc = jnp.dot(gm * gm, A, precision=jax.lax.Precision.HIGHEST)
        acc_old = state.at[uniq].get(mode="fill", fill_value=0.0)   # [U, P]
        std = jnp.sqrt(acc_old + mom_inc) + eps
        scale = jnp.repeat(std, d, axis=1)
        new_state = scatter_rows_add(state, uniq, mom_inc)
        new_tab = scatter_rows_add(packed, uniq, -lr * gm / scale)
        return new_state, new_tab
    slot = jnp.full((npk,), b, jnp.int32).at[q].set(
        jnp.arange(b, dtype=jnp.int32), mode="drop")
    rep = slot.at[q].get(mode="fill", fill_value=b)
    Gc = jax.ops.segment_sum(g_wide, rep, num_segments=b + 1)[:b]  # [b, P*d]
    mom_inc = jnp.stack(
        [jnp.mean(Gc[:, k * d:(k + 1) * d] ** 2, axis=1)
         for k in range(pack)], axis=1)                     # [b, P]
    # per-sample acc rows; only representative samples' rows are consumed
    # by the final slot-take, so duplicate q entries are harmless
    acc_c = jnp.take(state, jnp.minimum(q, npk - 1), axis=0, mode="clip")
    std_c = jnp.sqrt(acc_c + mom_inc) + eps                 # [b, P]
    upd_c = jnp.concatenate(
        [lr * Gc[:, k * d:(k + 1) * d] / std_c[:, k:k + 1]
         for k in range(pack)], axis=1)                     # [b, P*d]
    upd_pad = jnp.concatenate([upd_c, jnp.zeros((1, dp), jnp.float32)])
    taken = jnp.take(upd_pad, jnp.minimum(slot, b), axis=0, mode="clip")
    new_tab = (packed.astype(jnp.float32) - taken).astype(packed.dtype)
    inc_pad = jnp.concatenate([mom_inc, jnp.zeros((1, pack), jnp.float32)])
    new_state = state + jnp.take(inc_pad, jnp.minimum(slot, b), axis=0,
                                 mode="clip")
    return new_state, new_tab


import functools as _functools


@_functools.lru_cache(maxsize=None)
def _block_mean_matrix_np(pack: int, d: int):
    # cache numpy, never jnp (a jnp array cached inside a jit trace would
    # leak a tracer); jnp.asarray at the use site is free
    import numpy as _np
    a = _np.zeros((pack * d, pack), _np.float32)
    for k in range(pack):
        a[k * d:(k + 1) * d, k] = 1.0 / d
    return a


def _block_mean_matrix(pack: int, d: int):
    """[P*d, P] 0/1-scaled matrix: (G @ A)[:, k] = mean of G's k-th
    d-block — the per-logical-row mean without a 3D reshape."""
    return jnp.asarray(_block_mean_matrix_np(pack, d))


def dedup_rows(idx: jnp.ndarray, grads: jnp.ndarray, num_unique: int
               ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Coalesce duplicate row indices within a batch (the torch sparse-grad
    `coalesce()` equivalent, rwsadagrad.py:97) with static shapes.

    idx: [B] row ids, with PAD_ROW marking entries to ignore; grads: [B, D]
    per-sample row grads.  Returns (unique_idx[num_unique],
    summed_grads[num_unique, D], valid[num_unique]) — padded entries keep
    PAD_ROW in unique_idx and have valid==0.
    """
    uniq, inv = jnp.unique(idx, return_inverse=True, size=num_unique,
                           fill_value=PAD_ROW)
    summed = jax.ops.segment_sum(grads, inv.reshape(-1), num_segments=num_unique)
    valid = (uniq != PAD_ROW).astype(jnp.float32)
    return uniq, summed, valid
