"""Training DLRM with HBM bounded by the C1 cache tier.

The reference only *infers* through EVStore; its training path holds full
tables in device memory.  The BASELINE north star asks for **training at
bounded HBM**: sparse updates must write through the tier.  This module
implements that:

- Embedding master copies live in host DRAM (numpy tables + rwsAdagrad row
  accumulators) — the "storage tier" for training.
- The device holds ONLY the C1 working set: `cache_values [C, D]` fp32 and
  `cache_mom [C]` (the rows' optimizer state travels with them).
- Per batch: the native assigner (evstore_core esv_assign_batch_train) runs
  the EvLFU policy with *deferred slot reuse* and reports evictions; the
  host (1) snapshots evicted rows+momenta from the device cache and writes
  them back to DRAM, (2) fetches miss rows+momenta, then (3) one jitted step
  scatters misses in, runs forward/backward from the cached rows, and
  applies the row-wise rwsAdagrad update *in HBM*.
- Gradient targets come from the assigner: a key's update lands on its cache
  slot if resident, on its miss-buffer copy if not (written back to DRAM
  after the step), or on its dying pre-eviction cell (carried to DRAM by a
  second post-step write-back) — no update is dropped.

Exactness: cached training equals full-table rwsAdagrad training except for
one rare interleaving — a key EVICTED and RE-MISSED within the same batch
has its gradient applied as two partial updates (early positions to the
dying cell, late positions to the new home) instead of one summed update.
Tests measure the resulting drift; it is below fp noise for realistic
capacities.

HBM footprint: C*(D+1)*4 bytes + MLPs — independent of total table size.
"""

from __future__ import annotations

import functools
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from evstore_tpu.config import CacheConfig, DLRMConfig, TrainConfig
from evstore_tpu.models.dlrm import DLRMParams, dlrm_forward, dlrm_loss
from evstore_tpu.train.optim import lr_schedule


# --- int8 row codec (training tier) -------------------------------------
# The reference's 8-bit inference codec: enc round(((x+1)/2)*254), dec
# (v/254)*2-1 (script/reduce_precision.py:270,283; evlfu_8.cpp:375).  For
# TRAINING through the tier the store must not lose the tiny per-step
# updates to round-to-nearest bias, so re-encodes of updated rows use
# STOCHASTIC rounding (unbiased: E[dec(enc_sr(x))] = clip(x)); untouched
# rows keep their exact bytes.  Momenta stay fp32 alongside.

def _q8_decode(v: jnp.ndarray) -> jnp.ndarray:
    return (v.astype(jnp.float32) / 254.0) * 2.0 - 1.0


def _q8_encode_det(x: jnp.ndarray) -> jnp.ndarray:
    y = (jnp.clip(x, -1.0, 1.0) + 1.0) * 0.5 * 254.0
    return jnp.round(y).astype(jnp.uint8)


def _q8_encode_sr(x: jnp.ndarray, key) -> jnp.ndarray:
    y = (jnp.clip(x, -1.0, 1.0) + 1.0) * 0.5 * 254.0
    u = jax.random.uniform(key, x.shape, jnp.float32)
    return jnp.clip(jnp.floor(y + u), 0, 254).astype(jnp.uint8)


class TrainableDeviceCache:
    """HBM-bounded embedding training state + the jitted cached train step."""

    def __init__(self, cfg: DLRMConfig, tcfg: TrainConfig, ccfg: CacheConfig,
                 tables: Sequence[np.ndarray], insert_bucket: int = 2048,
                 eps: float = 1e-10, copy_tables: bool = True):
        if tcfg.optimizer != "rwsadagrad":
            raise ValueError("cached training supports rwsadagrad (the "
                             "reference's sparse optimizer)")
        if ccfg.main_precision not in (32, 16, 8):
            raise ValueError("trainable cache rows are fp32, bf16 or int8 "
                             "(main_precision 32/16/8); the int4 codec is "
                             "inference-tier only")
        from evstore_tpu.native import NativeAssigner, NativeTieredCache
        self.cfg = cfg
        self.tcfg = tcfg
        self.capacity = ccfg.total_size
        self.dim = cfg.embedding_dim
        self.n_tables = cfg.num_tables
        self.insert_bucket = insert_bucket
        self.eps = eps
        # bf16 cached rows halve the cache HBM (TPU-native 16-bit: bf16
        # matches the MXU input format, unlike the reference's custom ushort
        # codec, evlfu_16.cpp:332-347 — a CPU-decode format).  int8 rows
        # quarter it using the reference's codec with stochastic-rounding
        # stores (see _q8_* above).  Updates compute in fp32; momenta stay
        # fp32.  Master (DRAM) copies stay fp32 — write-backs upcast/decode.
        self.cache_dtype = {32: jnp.float32, 16: jnp.bfloat16,
                            8: jnp.uint8}[ccfg.main_precision]
        # Master copies: host DRAM (owned, writable — np.asarray of a jax
        # array yields a read-only view) or, with copy_tables=False, the
        # caller's writable buffers IN PLACE — typically np.memmap over the
        # .bin EV files, which is the Terabyte configuration: master tables
        # live on SSD, the OS page cache is the DRAM tier, and the device
        # cache bounds HBM (see from_files()).
        if copy_tables:
            # order="C" is LOAD-BEARING: np.array's default order='K'
            # preserves the SOURCE strides, and np.asarray of a TPU jax
            # array is non-C-contiguous (tiled device layout) — the
            # engine's zero-copy borrow below would then silently copy,
            # freezing the masters at their initial values and serving
            # every miss stale (round-5: -0.11 held-out AUC on the real
            # chip while CPU runs were exact)
            self.host_tables = [np.array(t, np.float32, copy=True,
                                         order="C")
                                for t in tables]
        else:
            for t in tables:
                if (t.dtype != np.float32 or not t.flags["C_CONTIGUOUS"]
                        or not t.flags["WRITEABLE"]):
                    raise ValueError("copy_tables=False requires writable "
                                     "C-contiguous float32 buffers")
            self.host_tables = list(tables)
        self.host_mom = [np.zeros(t.shape[0], np.float32) for t in tables]
        # native assigner over an engine backed by the host tables
        eng_cfg = CacheConfig(policy="evlfu", n_caching_layers=1, total_size=1)
        self.engine = NativeTieredCache(eng_cfg, cfg.num_tables, self.dim, 4)
        # zero-copy borrow: misses must observe the write-backs that mutate
        # host_tables between batches
        self.engine.borrow_tables(self.host_tables)
        for t, (mine, theirs) in enumerate(
                zip(self.host_tables, self.engine._borrowed_refs)):
            if mine.ctypes.data != theirs.ctypes.data:
                raise RuntimeError(
                    f"table {t}: engine borrow is not aliased to "
                    "host_tables (non-contiguous input?) — write-backs "
                    "would be invisible to miss fetches")
        self.assigner = NativeAssigner(self.engine, self.capacity,
                                       ccfg.flush_rate, ccfg.perfect_item_cap)
        # device working set
        self.cache_values = jnp.zeros((self.capacity, self.dim),
                                      self.cache_dtype)
        self.cache_mom = jnp.zeros((self.capacity,), jnp.float32)
        self.lr_fn = lr_schedule(tcfg.learning_rate, tcfg.lr_num_warmup_steps,
                                 tcfg.lr_decay_start_step,
                                 tcfg.lr_num_decay_steps)
        self.dropped_updates = 0
        self._step_fn = self._build_step()

    @classmethod
    def from_files(cls, cfg: DLRMConfig, tcfg: TrainConfig, ccfg: CacheConfig,
                   bin_dir: str, table_sizes: Sequence[int], **kw):
        """Terabyte configuration: memory-map the fp32 `ev-table-<t+1>.bin`
        files (write_ev_tables_binary format) read-write as the master
        tables, and `mom-<t+1>.bin` row-accumulator files (created zeroed if
        absent).  DRAM holds only the OS page cache's working set; training
        write-backs land in the mapped pages and persist via save()/flush.

        The reference's beyond-DRAM story stops at inference (RocksDB/mmap
        backends, emb_storage/mmap_file_read.py); this extends it to
        TRAINING at bounded HBM *and* bounded DRAM."""
        import os
        D = cfg.embedding_dim
        tables, moms = [], []
        for t, n in enumerate(table_sizes):
            p = os.path.join(bin_dir, f"ev-table-{t + 1}.bin")
            tables.append(np.memmap(p, np.float32, mode="r+", shape=(n, D)))
            mp = os.path.join(bin_dir, f"mom-{t + 1}.bin")
            if not os.path.exists(mp):
                np.zeros(n, np.float32).tofile(mp)
            moms.append(np.memmap(mp, np.float32, mode="r+", shape=(n,)))
        obj = cls(cfg, tcfg, ccfg, tables, copy_tables=False, **kw)
        obj.host_mom = moms
        obj._file_backed = True
        return obj

    def flush_files(self):
        """Persist file-backed master tables/momenta to disk (no-op for the
        in-DRAM configuration)."""
        self.flush_to_host()
        for arr in list(self.host_tables) + list(self.host_mom):
            if isinstance(arr, np.memmap):
                arr.flush()

    # ------------------------------------------------------------ jit step

    def _build_step(self):
        return functools.partial(jax.jit, donate_argnums=(0, 1))(
            self._build_raw_step())

    def _build_raw_step(self):
        cfg, tcfg, eps = self.cfg, self.tcfg, self.eps
        C = self.capacity

        def step(cache, mom_c, dense_params, dstate, gather_idx, scat_slots,
                 scat_m, buf, buf_mom, dense_x, labels, lr, seed):
            """gather_idx [B, T] indexes concat-space [cache | buf]: the
            assigner's final residency target per position, so the forward
            read and the gradient write hit the SAME cell — the cache slot
            when resident (the scatter made it equal to the buffer copy),
            the buffer row when not (written back to DRAM after the step),
            and the dying pre-apply slot for mid-batch-evicted keys (their
            update is intentionally dropped with the cell)."""
            # scatter miss rows (+ their momenta) into their cache slots
            store_dt = cache.dtype    # fp32 / bf16 / uint8 cache HBM
            q8 = store_dt == jnp.uint8
            ins = (_q8_encode_det(buf[scat_m]) if q8
                   else buf[scat_m].astype(store_dt))
            cache = cache.at[scat_slots].set(ins, mode="drop")
            mom_c = mom_c.at[scat_slots].set(buf_mom[scat_m], mode="drop")

            in_cache = gather_idx < C
            safe_c = jnp.where(in_cache, gather_idx, 0)
            safe_b = jnp.where(in_cache, 0, gather_idx - C)

            # grads/updates in fp32 regardless of the storage dtype; the
            # round-trip is exact for untouched rows (bf16->f32->bf16;
            # int8 rows only re-encode when touched, keeping exact bytes)
            cache_f = _q8_decode(cache) if q8 else cache.astype(jnp.float32)

            def loss_fn(dparams, cache_in, buf_in):
                emb = jnp.where(in_cache[..., None],
                                cache_in[safe_c], buf_in[safe_b])
                logits = dlrm_forward(DLRMParams(dparams, {}), dense_x, None,
                                      cfg, emb_rows=emb)
                return dlrm_loss(logits, labels, tcfg.loss_function,
                                 tcfg.loss_weights)

            loss, (g_dense, g_cache, g_buf) = jax.value_and_grad(
                loss_fn, argnums=(0, 1, 2))(dense_params, cache_f, buf)
            # g_cache/g_buf are dense over the working set (C and Mp rows) —
            # tiny next to the tables; duplicate positions accumulate
            # automatically in autodiff (the torch-sparse coalesce).
            mom_inc_c = jnp.mean(g_cache * g_cache, axis=1)
            touched_c = mom_inc_c > 0
            mom_c2 = mom_c + mom_inc_c
            std_c = jnp.sqrt(mom_c2) + eps
            upd_f = (cache_f - (lr * g_cache / std_c[:, None])
                     * touched_c[:, None])
            if q8:
                enc = _q8_encode_sr(upd_f, jax.random.PRNGKey(seed))
                cache = jnp.where(touched_c[:, None], enc, cache)
            else:
                cache = upd_f.astype(store_dt)

            mom_inc_b = jnp.mean(g_buf * g_buf, axis=1)
            touched_b = mom_inc_b > 0
            buf_mom2 = buf_mom + mom_inc_b
            std_b = jnp.sqrt(buf_mom2) + eps
            buf = buf - (lr * g_buf / std_b[:, None]) * touched_b[:, None]

            # dense params: plain rwsadagrad dense branch
            new_dstate = jax.tree_util.tree_map(
                lambda s, g: s + g.astype(jnp.float32) ** 2, dstate, g_dense)
            dense_params = jax.tree_util.tree_map(
                lambda p, g, s: (p - lr * g / (jnp.sqrt(s) + eps)
                                 ).astype(p.dtype),
                dense_params, g_dense, new_dstate)

            return (cache, jnp.where(touched_c, mom_c2, mom_c), dense_params,
                    new_dstate, buf, jnp.where(touched_b, buf_mom2, buf_mom),
                    loss)

        return step

    def _build_step_packed(self):
        """Pipelined variant of the step: same math, but the host<->device
        traffic is packed at BOTH ends.  In: all nine per-batch inputs
        (gather/scatter indices, miss rows + momenta, dense features,
        labels, lr, seed, dying-slot list) travel as ONE int32 upload —
        float payloads ride as raw bits and are bitcast back inside jit;
        on remote-dispatch backends each transfer has a ~30 ms floor, so
        one upload instead of nine is most of the pipelined speedup.
        Out: the dying-cell snapshot + updated buffer rows + both momenta
        come back as ONE packed [Ep + Mp, D+1] array (vs three fetches).
        Static shape info rides as hashable static args — the (Mp, Ep)
        bucketing keeps the retrace count identical to the unpacked step."""
        base = self._build_raw_step()
        C = self.capacity
        D = self.dim

        @functools.partial(jax.jit, donate_argnums=(0, 1),
                           static_argnums=(5, 6, 7, 8, 9))
        def step(cache, mom_c, dense_params, dstate, packed_in,
                 gshape, xshape, lshape, Mp, Ep):
            ng = int(np.prod(gshape))
            ni = ng + 2 * Mp + Ep + 1
            ints = packed_in[:ni]
            flts = jax.lax.bitcast_convert_type(packed_in[ni:], jnp.float32)
            gather_idx = ints[:ng].reshape(gshape)
            o = ng
            scat_slots = ints[o:o + Mp]
            o += Mp
            scat_m = ints[o:o + Mp]
            o += Mp
            ev_slots_pad = ints[o:o + Ep]
            o += Ep
            seed = ints[o]
            buf = flts[:Mp * D].reshape(Mp, D)
            o = Mp * D
            buf_mom = flts[o:o + Mp]
            o += Mp
            nx = int(np.prod(xshape))
            dense_x = flts[o:o + nx].reshape(xshape)
            o += nx
            nl = int(np.prod(lshape))
            labels = flts[o:o + nl].reshape(lshape)
            o += nl
            lr = flts[o]
            (cache, mom_c, dense_params, dstate, buf, buf_mom,
             loss) = base(cache, mom_c, dense_params, dstate, gather_idx,
                          scat_slots, scat_m, buf, buf_mom, dense_x,
                          labels, lr, seed)
            ev_rows = cache[jnp.clip(ev_slots_pad, 0, C - 1)]
            ev_rows = (_q8_decode(ev_rows) if ev_rows.dtype == jnp.uint8
                       else ev_rows.astype(jnp.float32))
            ev_mom = mom_c[jnp.clip(ev_slots_pad, 0, C - 1)]
            rows = jnp.concatenate([ev_rows, buf], axis=0)
            moms = jnp.concatenate([ev_mom, buf_mom], axis=0)
            packed = jnp.concatenate([rows, moms[:, None]], axis=1)
            return cache, mom_c, dense_params, dstate, loss, packed

        return step

    # ------------------------------------------------------- windowed mode

    def _build_step_window(self):
        """K batches per device call: one packed upload, a lax.scan over the
        K per-batch steps, one packed download.  On remote-dispatch backends
        every host<->device round trip has a ~30 ms floor, so the per-batch
        pipeline (train_batches) is transfer-bound at ~2 round trips/batch;
        the window amortizes them to ~2 round trips per K batches.

        Within-window data hazards are resolved WITHOUT changing the policy:

        - all K batches share ONE window-unique miss buffer U [Up, D] — a
          key missed in several batches gets a single U row, so later
          batches observe earlier batches' buffer updates (exactly what the
          per-batch path reads back from DRAM);
        - a key evicted in batch i and re-missed in batch j>i is filled
          on-device from the eviction snapshot buffer (`fille`); evicted and
          re-missed in the SAME batch, from its pre-step dying cell
          (`fillc`) — matching the per-batch path's DRAM round trip /
          store-forward values bit-for-bit;
        - each iteration ends by snapshotting its dying cells (post-update
          rows + momenta) into evbuf, BEFORE the next iteration's scatter
          can reuse those slots (the assigner's deferred slot reuse gives
          exactly one batch of grace).

        The packed download [Ewp + Up, D+1] carries evbuf and the final
        U/U_mom; the host lands each key's FINAL in-window authority
        (eviction snapshot or buffer row) into the DRAM masters."""
        base = self._build_raw_step()
        C = self.capacity
        D = self.dim
        q8 = self.cache_dtype == jnp.uint8

        def dec(v):
            return _q8_decode(v) if q8 else v.astype(jnp.float32)

        @functools.partial(jax.jit, donate_argnums=(0, 1),
                           static_argnums=(5, 6, 7, 8, 9, 10, 11, 12, 13,
                                           14))
        def step(cache, mom_c, dense_params, dstate, packed_in,
                 K, gshape, xshape, Sp, Gp, Fp, Ep, Up, Ewp, Op):
            B, T = gshape[1], gshape[2]
            nd = xshape[2]
            ng = K * B * T
            ni = ng + K * (2 * Sp + 2 * Gp + 2 * Fp + 2 * Ep + 1) + Op
            ints = packed_in[:ni]
            flts = jax.lax.bitcast_convert_type(packed_in[ni:], jnp.float32)
            o = 0

            def take(n, shape):
                nonlocal o
                a = ints[o:o + n].reshape(shape)
                o += n
                return a

            g_idx = take(ng, (K, B, T))
            s_slots = take(K * Sp, (K, Sp))
            s_u = take(K * Sp, (K, Sp))
            fc_slot = take(K * Gp, (K, Gp))
            fc_dst = take(K * Gp, (K, Gp))
            fe_src = take(K * Fp, (K, Fp))
            fe_dst = take(K * Fp, (K, Fp))
            evs = take(K * Ep, (K, Ep))
            evd = take(K * Ep, (K, Ep))
            seeds = take(K, (K,))
            out_sel = take(Op, (Op,))
            o = 0
            U0 = flts[o:o + Up * D].reshape(Up, D)
            o += Up * D
            Um0 = flts[o:o + Up]
            o += Up
            dx = flts[o:o + K * B * nd].reshape(K, B, nd)
            o += K * B * nd
            lb = flts[o:o + K * B].reshape(K, B)
            o += K * B
            lrs = flts[o:o + K]

            evbuf0 = jnp.zeros((Ewp, D + 1), jnp.float32)

            def body(carry, xs):
                cache, mom_c, dense_params, dstate, U, U_mom, evbuf = carry
                (gi, ss, su, fcs, fcd, fes, fed, es, ed, dxk, lbk, lrk,
                 sdk) = xs
                # same-batch evict+re-miss: pre-step dying-cell value
                cs = jnp.clip(fcs, 0, C - 1)
                U = U.at[fcd].set(dec(cache[cs]), mode="drop")
                U_mom = U_mom.at[fcd].set(mom_c[cs], mode="drop")
                # cross-batch evict+re-miss: the eviction snapshot
                er = evbuf[jnp.clip(fes, 0, Ewp - 1)]
                U = U.at[fed].set(er[:, :D], mode="drop")
                U_mom = U_mom.at[fed].set(er[:, D], mode="drop")
                (cache, mom_c, dense_params, dstate, U, U_mom,
                 loss) = base(cache, mom_c, dense_params, dstate, gi, ss,
                              su, U, U_mom, dxk, lbk, lrk, sdk)
                # post-update dying-cell snapshot (rows + momenta)
                evc = jnp.clip(es, 0, C - 1)
                snap = jnp.concatenate(
                    [dec(cache[evc]), mom_c[evc][:, None]], axis=1)
                evbuf = evbuf.at[ed].set(snap, mode="drop")
                return (cache, mom_c, dense_params, dstate, U, U_mom,
                        evbuf), loss

            (cache, mom_c, dense_params, dstate, U, U_mom,
             evbuf), losses = jax.lax.scan(
                body, (cache, mom_c, dense_params, dstate, U0, Um0, evbuf0),
                (g_idx, s_slots, s_u, fc_slot, fc_dst, fe_src, fe_dst, evs,
                 evd, dx, lb, lrs, seeds))
            # download only what lands in DRAM: all eviction snapshots plus
            # the U rows whose final authority is the buffer (out_sel) —
            # resident keys' U rows are stale and never land
            sel = jnp.clip(out_sel, 0, Up - 1)
            packed = jnp.concatenate(
                [evbuf,
                 jnp.concatenate([U[sel], U_mom[sel][:, None]], axis=1)],
                axis=0)
            return cache, mom_c, dense_params, dstate, losses, packed

        return step

    @staticmethod
    def _bucket(n: int, bk: int) -> int:
        return max(bk, ((n + bk - 1) // bk) * bk)

    # key-state encodings for the window tracker (packed in one int64:
    # kind * 2^48 + payload; payloads are < 2^48)
    _ST_RES = 0 << 48
    _ST_BUF = 1 << 48
    _ST_EV = 2 << 48
    _ST_MASK = (1 << 48) - 1

    def _build_window(self, batch_list, start_step):
        """Run the native assigner for K batches and derive the window plan:
        per-batch device index arrays, the window-unique fetch list, the
        fill lists, and each key's final in-window authority for landing.
        Keys are tracked packed (table<<40|row, the engine layout); states
        pack (kind, payload) into one int — the host loop runs per unique
        miss, so constant factors matter."""
        MAXI = np.iinfo(np.int32).max
        C = self.capacity
        RES, BUF, EV, PAY = (self._ST_RES, self._ST_BUF, self._ST_EV,
                             self._ST_MASK)
        per = []
        U_map = {}                 # packed key -> window buffer row u
        state = {}                 # packed key -> packed (kind, payload)
        fetch_k, fetch_u = [], []
        n_u = 0
        n_e = 0
        for k, (dense_x, idx, labels) in enumerate(batch_list):
            idx = np.asarray(idx)
            (slots, scat_slots, scat_m, buf, ev_keys, ev_slots,
             upd) = self.assigner.assign_batch_train_raw(idx)
            M = buf.shape[0]
            buf_t, buf_r = self._buffer_keys_arrays(idx, slots, M)
            pk = ((buf_t.astype(np.int64) << 40) | buf_r).tolist()
            # (1) evictions -> snapshot rows; remember this batch's for the
            # same-batch fill distinction.  .tolist() first: iterating
            # numpy arrays yields numpy scalars, ~10x slower per element.
            ekl = ev_keys.astype(np.int64).tolist()
            e0 = n_e
            n_e += len(ekl)
            ev_dst = np.arange(e0, n_e, dtype=np.int32)
            state.update(zip(ekl, range(EV | e0, EV | n_e)))
            batch_ev = dict(zip(ekl, zip(range(e0, n_e),
                                         ev_slots.tolist())))
            # (2) buffer serves -> shared window rows + fills
            mu_l = []
            fc_slot, fc_dst, fe_src, fe_dst = [], [], [], []
            uget = U_map.get
            sget = state.get
            for key in pk:
                u = uget(key)
                st = sget(key)
                if u is None:
                    u = n_u
                    n_u += 1
                    U_map[key] = u
                    if st is None or st < EV:
                        fetch_k.append(key)
                        fetch_u.append(u)
                        mu_l.append(u)
                        continue
                elif st is None or st < EV:
                    mu_l.append(u)
                    continue
                # the key's U row (if any) went stale while it was
                # cache-resident; refill from its eviction snapshot —
                # the dying cell itself when evicted THIS batch
                e = st & PAY
                be = batch_ev.get(key)
                if be is not None and be[0] == e:
                    fc_slot.append(be[1])
                    fc_dst.append(u)
                else:
                    fe_src.append(e)
                    fe_dst.append(u)
                mu_l.append(u)
            state.update(zip(pk, [BUF | u for u in mu_l]))
            mu = np.asarray(mu_l, np.int32)
            # (3) insertions -> cache-resident
            state.update((pk[m], RES) for m in scat_m.tolist())
            gather = np.where(upd == MAXI, slots, upd).astype(np.int64)
            over = gather >= C
            gather[over] = C + mu[gather[over] - C]
            per.append({
                "gather": gather.astype(np.int32),
                "scat_slots": scat_slots.astype(np.int32),
                "scat_u": mu[scat_m].astype(np.int32),
                "fc_slot": np.asarray(fc_slot, np.int32),
                "fc_dst": np.asarray(fc_dst, np.int32),
                "fe_src": np.asarray(fe_src, np.int32),
                "fe_dst": np.asarray(fe_dst, np.int32),
                "ev_slots": np.asarray(ev_slots, np.int32),
                "ev_dst": ev_dst,
                "dense_x": np.asarray(dense_x, np.float32),
                "labels": np.asarray(labels, np.float32),
                "lr": float(self.lr_fn(start_step + k)),
                "seed": start_step + k,
            })
        return per, state, (fetch_k, fetch_u), n_u, n_e

    def _plan_window(self, batch_list, step_idx, prev_state):
        """Build the device plan for one window: run the assigner + tracker,
        size the static dims (high-water marks), allocate U0/Um0, and fetch
        the CLEAN miss rows (keys whose DRAM copy is current).  DIRTY keys —
        authority still on device in the in-flight previous window — are
        deferred to _finish_plan(), which runs after that window lands."""
        bk = self.insert_bucket
        per, state, fetch, n_u, n_e = self._build_window(
            batch_list, step_idx)
        fk, fu = fetch
        # final-authority landing list (also sizes the packed download)
        land_k = np.fromiter(state.keys(), np.int64, len(state))
        land_s = np.fromiter(state.values(), np.int64, len(state))
        kind = land_s >> 48
        keep = kind != 0                       # drop cache-resident
        land_k = land_k[keep]
        ev_sel = kind[keep] == 2
        land_pay = (land_s[keep] & self._ST_MASK).astype(np.int64)
        out_u = land_pay[~ev_sel]              # U rows that land
        # padded sizes are STATIC args — every new size tuple is a
        # retrace, and compiles are expensive on remote-compile
        # backends.  High-water marks bound traces while the cache
        # warms (the cold first window is usually the high-water).
        if not hasattr(self, "_win_hw"):
            self._win_hw = {}
        hw = self._win_hw

        def size(name, n, bk_, margin=1.0):
            # on first sight, over-allocate by the steady-state margin so
            # organic growth (cache filling -> more evictions/landings)
            # doesn't retrace mid-run
            want = self._bucket(n, bk_)
            if name not in hw:
                hw[name] = self._bucket(int(n * margin), bk_)
            if want > hw[name]:
                hw[name] = want
            return hw[name]

        p = {"per": per, "state": state, "K": len(batch_list),
             "land_k": land_k, "ev_sel": ev_sel, "land_pay": land_pay,
             "out_u": out_u}
        scat_max = max(len(q["scat_slots"]) for q in per)
        ev_max = max(len(q["ev_slots"]) for q in per)
        p["Up"] = size("Up", n_u, bk, 1.25)
        # steady state: evictions/window ~= inserts/window <= uniques
        p["Ewp"] = size("Ewp", max(n_e, n_u), bk, 1.25)
        p["Op"] = size("Op", max(len(out_u), n_u // 2), bk, 1.25)
        p["Sp"] = size("Sp", scat_max, 256, 2.0)
        p["Gp"] = size("Gp", max(len(q["fc_slot"]) for q in per), 64, 4.0)
        p["Fp"] = size("Fp", max(len(q["fe_src"]) for q in per), 64, 4.0)
        p["Ep"] = size("Ep", max(ev_max, scat_max), 256, 2.0)
        U0 = np.zeros((p["Up"], self.dim), np.float32)
        Um0 = np.zeros((p["Up"],), np.float32)
        dirty_k, dirty_u = [], []
        if fk:
            if prev_state:
                clean_k, clean_u = [], []
                for key, u in zip(fk, fu):
                    if key in prev_state:
                        dirty_k.append(key)
                        dirty_u.append(u)
                    else:
                        clean_k.append(key)
                        clean_u.append(u)
            else:
                clean_k, clean_u = fk, fu
            if clean_k:
                self._fetch_into(U0, Um0, clean_k, clean_u)
        p["U0"], p["Um0"] = U0, Um0
        p["dirty"] = (dirty_k, dirty_u)
        return p

    def _fetch_into(self, U0, Um0, keys, us):
        kk = np.asarray(keys, np.int64)
        ft = (kk >> 40).astype(np.int32)
        fr = kk & ((1 << 40) - 1)
        uu = np.asarray(us, np.int64)
        U0[uu] = self.assigner.fetch_rows_arrays(ft, fr)
        for t in np.unique(ft):
            sel = ft == t
            Um0[uu[sel]] = self.host_mom[t][fr[sel]]

    def _land_window(self, pend):
        """Apply one window's packed download to the DRAM masters and
        return its per-batch losses (this is the only device sync)."""
        arr = np.asarray(pend["packed"])          # THE download
        land_k, ev_sel = pend["land_k"], pend["ev_sel"]
        land_pay, out_u = pend["land_pay"], pend["out_u"]
        if len(land_k):
            src = np.empty(len(land_k), np.int64)
            src[ev_sel] = land_pay[ev_sel]
            src[~ev_sel] = pend["Ewp"] + np.arange(len(out_u))
            ts = (land_k >> 40).astype(np.int32)
            rs = land_k & ((1 << 40) - 1)
            for t in np.unique(ts):
                sel = ts == t
                self.host_tables[t][rs[sel]] = arr[src[sel], :-1]
                self.host_mom[t][rs[sel]] = arr[src[sel], -1]
        return np.asarray(pend["losses"])

    def _dispatch_window(self, p, dense_params, dstate):
        """Pack one upload and launch the window scan (async)."""
        per, K = p["per"], p["K"]
        Up, Ewp, Op = p["Up"], p["Ewp"], p["Op"]
        Sp, Gp, Fp, Ep = p["Sp"], p["Gp"], p["Fp"], p["Ep"]

        def pad(vals, n, fill):
            a = np.full((K, n), fill, np.int32)
            for k, v in enumerate(vals):
                a[k, :len(v)] = v
            return a.ravel()

        out_sel = np.zeros((Op,), np.int32)
        out_sel[:len(p["out_u"])] = p["out_u"]
        ints = np.concatenate([
            np.stack([q["gather"] for q in per]).ravel(),
            pad([q["scat_slots"] for q in per], Sp, self.capacity),
            pad([q["scat_u"] for q in per], Sp, 0),
            pad([q["fc_slot"] for q in per], Gp, 0),
            pad([q["fc_dst"] for q in per], Gp, Up),
            pad([q["fe_src"] for q in per], Fp, 0),
            pad([q["fe_dst"] for q in per], Fp, Up),
            pad([q["ev_slots"] for q in per], Ep, 0),
            pad([q["ev_dst"] for q in per], Ep, Ewp),
            np.asarray([q["seed"] for q in per], np.int32),
            out_sel,
        ])
        flts = np.concatenate([
            p["U0"].ravel(), p["Um0"],
            np.stack([q["dense_x"] for q in per]).ravel(),
            np.stack([q["labels"] for q in per]).ravel(),
            np.asarray([q["lr"] for q in per], np.float32),
        ])
        packed_in = np.concatenate([ints, flts.view(np.int32)])
        B, T = per[0]["gather"].shape
        nd = per[0]["dense_x"].shape[1]
        (self.cache_values, self.cache_mom, dense_params, dstate,
         losses, packed) = self._step_window(
            self.cache_values, self.cache_mom, dense_params, dstate,
            jnp.asarray(packed_in), K, (K, B, T), (K, B, nd), Sp, Gp,
            Fp, Ep, Up, Ewp, Op)
        return dense_params, dstate, {
            "packed": packed, "losses": losses, "K": K,
            "land_k": p["land_k"], "ev_sel": p["ev_sel"],
            "land_pay": p["land_pay"], "out_u": p["out_u"], "Ewp": Ewp,
            "dense_params": dense_params, "dstate": dstate,
        }

    def train_batches_windowed(self, dense_params, dstate, batches,
                               window: int = 16, start_step: int = 1):
        """HBM-bounded training with K batches per device call (see
        _build_step_window).  Bit-for-bit identical trajectories to
        train_batch()/train_batches() — the equivalence test checks dense
        params, flushed tables, momenta, and losses.  Yields (dense_params,
        dstate, loss) per batch like train_batches.

        The host runs one window ahead of the device: while window w
        executes on-device, the assigner + tracker build window w+1 and
        fetch its clean miss rows; only the rows whose authority is still
        on device (missed now, evicted/buffered in w) wait for w's landing."""
        if not hasattr(self, "_step_window"):
            self._step_window = self._build_step_window()
        step_idx = start_step
        batch_it = iter(batches)
        pending = None
        prev_state = {}
        while True:
            batch_list = []
            for _ in range(window):
                try:
                    batch_list.append(next(batch_it))
                except StopIteration:
                    break
            plan = None
            if batch_list:
                plan = self._plan_window(batch_list, step_idx, prev_state)
            if pending is not None:
                losses = self._land_window(pending)
                if plan is not None and plan["dirty"][0]:
                    # DRAM is current now; fetch the deferred rows
                    self._fetch_into(plan["U0"], plan["Um0"],
                                     *plan["dirty"])
                if plan is not None:
                    dense_params, dstate, new_pending = \
                        self._dispatch_window(plan, dense_params, dstate)
                for k in range(pending["K"]):
                    yield (pending["dense_params"], pending["dstate"],
                           losses[k])
                if plan is None:
                    return
                pending = new_pending
            else:
                if plan is None:
                    return
                dense_params, dstate, pending = self._dispatch_window(
                    plan, dense_params, dstate)
            prev_state = plan["state"]
            step_idx += plan["K"]

    def train_batches(self, dense_params, dstate, batches, start_step: int = 1,
                      on_loss=None):
        """PIPELINED HBM-bounded training over a batch iterable (VERDICT r1
        item 5).  Semantically identical to per-batch train_batch() — the
        equivalence test checks bit-for-bit trajectories — but restructured
        so the host stays ahead of the device:

        - batch k's dying-cell snapshot + updated buffer rows come back as
          ONE packed transfer (vs three), consumed while batch k+1's policy
          assignment has already run;
        - the pre-step eviction write-back (old step 1) is ELIDED: DRAM is
          only read by the miss fetch, and rows evicted in EARLIER batches
          are already current (their packed write-back landed before this
          fetch).  Rows evicted IN THIS batch and re-missed in it (rare) are
          store-forwarded from a targeted device gather instead.

        Yields (dense_params, dstate, loss_device) per batch; returns via
        StopIteration the final (dense_params, dstate).
        """
        if not hasattr(self, "_step_packed"):
            self._step_packed = self._build_step_packed()
        MAXI = np.iinfo(np.int32).max
        pending = None   # (ev_keys, ev_slots, buf_t, buf_r, nonres, M, packed)

        def land(p):
            """Apply batch p's write-backs to DRAM (one transfer)."""
            ev_keys, ev_slots, Ep, buf_t, buf_r, nonres, M, packed = p
            arr = np.asarray(packed)           # THE transfer
            E = len(ev_slots)
            if E:
                rows, moms = arr[:E, :-1], arr[:E, -1]
                ts = np.asarray([k[0] for k in ev_keys])
                rs = np.asarray([k[1] for k in ev_keys])
                for t in np.unique(ts):
                    sel = ts == t
                    self.host_tables[t][rs[sel]] = rows[sel]
                    self.host_mom[t][rs[sel]] = moms[sel]
            if M:
                nb = arr[Ep:, :-1]
                nbm = arr[Ep:, -1]
                for t in np.unique(buf_t[nonres]):
                    sel = nonres & (buf_t == t)
                    self.host_tables[t][buf_r[sel]] = nb[:M][sel]
                    self.host_mom[t][buf_r[sel]] = nbm[:M][sel]

        step_idx = start_step
        for dense_x, idx, labels in batches:
            idx = np.asarray(idx)
            (slots, scat_slots, scat_m, asg_buf, ev_keys, ev_slots,
             upd) = self.assigner.assign_batch_train(idx)
            M = asg_buf.shape[0]
            # targeted store-forward gather for same-batch evict+re-miss:
            # dispatched against the PRE-step cache handle (post step k-1)
            fw_rows = fw_moms = None
            fw_idx = {}
            buf_t, buf_r = self._buffer_keys_arrays(idx, slots, M)
            if len(ev_keys) and M:
                evmap = {k: s for k, s in zip(ev_keys, ev_slots)}
                hits = [(m, evmap[(int(buf_t[m]), int(buf_r[m]))])
                        for m in range(M)
                        if (int(buf_t[m]), int(buf_r[m])) in evmap]
                if hits:
                    sl = jnp.asarray([s for _, s in hits], jnp.int32)
                    v = self.cache_values[sl]
                    fw_rows = (_q8_decode(v) if v.dtype == jnp.uint8
                               else v.astype(jnp.float32))
                    fw_moms = self.cache_mom[sl]
                    fw_idx = {m: i for i, (m, _) in enumerate(hits)}
            # land batch k-1's write-backs BEFORE this fetch reads DRAM
            if pending is not None:
                land(pending)
            # miss fetch (+ momenta) from (now-current) DRAM
            bk = self.insert_bucket
            Mp = max(bk, ((M + bk - 1) // bk) * bk)
            buf_p = np.zeros((Mp, self.dim), np.float32)
            if M:
                buf_p[:M] = self.assigner.fetch_rows_arrays(buf_t, buf_r)
            buf_mom = np.zeros((Mp,), np.float32)
            for t in np.unique(buf_t):
                sel = buf_t == t
                buf_mom[:M][sel] = self.host_mom[t][buf_r[sel]]
            if fw_idx:
                fr = np.asarray(fw_rows)
                fm = np.asarray(fw_moms)
                for m, i in fw_idx.items():
                    buf_p[m] = fr[i]
                    buf_mom[m] = fm[i]
            ss = np.full((Mp,), self.capacity, np.int32)
            sm = np.zeros((Mp,), np.int32)
            ss[:len(scat_slots)] = scat_slots
            sm[:len(scat_m)] = scat_m
            gather_idx = np.where(upd == MAXI, slots, upd).astype(np.int32)
            # dying-cell snapshot slots, padded to insert_bucket multiples —
            # the SAME bucketing as Mp so the (Ep, Mp) shape pair stays
            # stable across batches (each distinct pair is a retrace, and
            # compiles are expensive on remote-compile backends)
            E = len(ev_slots)
            Ep = max(bk, ((E + bk - 1) // bk) * bk)
            evs = np.zeros((Ep,), np.int32)
            evs[:E] = ev_slots
            lr = float(self.lr_fn(step_idx))
            dense_x = np.asarray(dense_x, np.float32)
            labels = np.asarray(labels, np.float32)
            f32 = np.concatenate([buf_p.ravel(), buf_mom, dense_x.ravel(),
                                  labels.ravel(),
                                  np.asarray([lr], np.float32)])
            packed_in = np.concatenate([
                gather_idx.ravel(), ss, sm, evs,
                np.asarray([step_idx], np.int32), f32.view(np.int32)])
            (self.cache_values, self.cache_mom, dense_params, dstate,
             loss, packed) = self._step_packed(
                self.cache_values, self.cache_mom, dense_params, dstate,
                jnp.asarray(packed_in), gather_idx.shape, dense_x.shape,
                labels.shape, Mp, Ep)
            nonres = np.ones(M, bool)
            nonres[scat_m[scat_m < M]] = False
            # packed rows: [Ep dying | Mp buffer]; keep only real E/M rows
            pending = (ev_keys, list(ev_slots), Ep, buf_t, buf_r, nonres, M,
                       packed)
            step_idx += 1
            yield dense_params, dstate, loss
        if pending is not None:
            land(pending)

    # ------------------------------------------------------------ host side

    def _writeback_evicted(self, ev_keys, ev_slots):
        if len(ev_keys) == 0:
            return
        # pad the snapshot gather to power-of-two sizes: eviction counts vary
        # per batch and each distinct length would re-trace the device gather
        n = len(ev_slots)
        n_pad = 1 << (n - 1).bit_length()
        slots_p = np.empty(n_pad, np.int32)
        slots_p[:n] = ev_slots
        slots_p[n:] = slots_p[0]
        vals = self.cache_values[jnp.asarray(slots_p)]
        vals = (_q8_decode(vals) if vals.dtype == jnp.uint8
                else vals.astype(jnp.float32))
        rows = np.asarray(vals)[:n]
        moms = np.asarray(self.cache_mom[jnp.asarray(slots_p)])[:n]
        ts = np.asarray([k[0] for k in ev_keys])
        rs = np.asarray([k[1] for k in ev_keys])
        for t in np.unique(ts):
            sel = ts == t
            self.host_tables[t][rs[sel]] = rows[sel]
            self.host_mom[t][rs[sel]] = moms[sel]

    def train_batch(self, dense_params, dstate, step_idx: int,
                    dense_x, idx, labels):
        """One HBM-bounded training step.  Returns (dense_params, dstate,
        loss)."""
        idx = np.asarray(idx)
        (slots, scat_slots, scat_m, buf, ev_keys, ev_slots,
         upd) = self.assigner.assign_batch_train(idx)
        # 1. write back evicted rows BEFORE fetching misses (a key evicted
        # and re-missed in the same batch must see its updated value) and
        # before the scatter overwrites slots
        self._writeback_evicted(ev_keys, ev_slots)
        # 2. fetch miss rows (train mode defers the fetch to this point) and
        # their momenta
        M = buf.shape[0]
        bk = self.insert_bucket
        Mp = max(bk, ((M + bk - 1) // bk) * bk)
        buf_t, buf_r = self._buffer_keys_arrays(idx, slots, M)
        buf_p = np.zeros((Mp, self.dim), np.float32)
        if M:
            buf_p[:M] = self.assigner.fetch_rows_arrays(buf_t, buf_r)
        buf_mom = np.zeros((Mp,), np.float32)
        for t in np.unique(buf_t):
            sel = buf_t == t
            buf_mom[:M][sel] = self.host_mom[t][buf_r[sel]]
        ss = np.full((Mp,), self.capacity, np.int32)
        sm = np.zeros((Mp,), np.int32)
        ss[:len(scat_slots)] = scat_slots
        sm[:len(scat_m)] = scat_m
        # final per-position target: mid-batch-evicted keys with no buffer
        # copy (sentinel) fall back to their pre-apply slot — the forward
        # value is still correct there (deferred reuse; the cell is never
        # scattered), the update lands in the dying cell, and the SECOND
        # eviction write-back below (post-step) carries it to DRAM — no
        # update is ever dropped.
        MAXI = np.iinfo(np.int32).max
        gather_idx = np.where(upd == MAXI, slots, upd).astype(np.int32)
        # 3. device step
        lr = float(self.lr_fn(step_idx))
        (self.cache_values, self.cache_mom, dense_params, dstate, new_buf,
         new_buf_mom, loss) = self._step_fn(
            self.cache_values, self.cache_mom, dense_params, dstate,
            jnp.asarray(gather_idx), jnp.asarray(ss), jnp.asarray(sm),
            jnp.asarray(buf_p), jnp.asarray(buf_mom), jnp.asarray(dense_x),
            jnp.asarray(labels), lr, jnp.asarray(step_idx, jnp.int32))
        # 4a. second eviction write-back: dying cells may have received this
        # batch's updates (positions whose key was evicted mid-batch); their
        # cells were excluded from the scatter, so this captures old+update
        self._writeback_evicted(ev_keys, ev_slots)
        # 4b. write back buffer rows that are NOT cache-resident (their
        # update lives only in new_buf).  Order matters: a key evicted and
        # re-inserted as a buffer row must end with the buffer value, so 4b
        # runs after 4a.
        nonres = np.ones(M, bool)
        nonres[scat_m[scat_m < M]] = False
        nb = np.asarray(new_buf)
        nbm = np.asarray(new_buf_mom)
        for t in np.unique(buf_t[nonres]):
            sel = nonres & (buf_t == t)
            self.host_tables[t][buf_r[sel]] = nb[:M][sel]
            self.host_mom[t][buf_r[sel]] = nbm[:M][sel]
        return dense_params, dstate, loss

    def _buffer_keys_arrays(self, idx, slots, M):
        """Recover (table, row) per buffer index m from the served positions
        (every buffer row is served at least once), vectorized."""
        B, T = idx.shape
        s = np.asarray(slots)
        mask = s >= self.capacity
        ms = (s[mask] - self.capacity).astype(np.int64)
        ts = np.broadcast_to(np.arange(T, dtype=np.int32), (B, T))[mask]
        rs = np.asarray(idx)[mask].astype(np.int64)
        buf_t = np.zeros(M, np.int32)
        buf_r = np.zeros(M, np.int64)
        buf_t[ms] = ts
        buf_r[ms] = rs
        return buf_t, buf_r

    def flush_to_host(self):
        """Write every cached row (+momentum) back to DRAM so host_tables
        hold the complete trained tables (end of training / checkpoint)."""
        keys, slots = self.assigner.resident_entries()
        if keys:
            self._writeback_evicted(keys, slots)

    def save(self, out_dir: str):
        """Checkpoint the embedding state: flush, then per-table rows +
        momenta (the EV-export handoff with optimizer state — resuming
        bounded-HBM training or feeding the inference tiers)."""
        import os
        os.makedirs(out_dir, exist_ok=True)
        self.flush_to_host()
        for t, (tab, mom) in enumerate(zip(self.host_tables, self.host_mom)):
            np.save(os.path.join(out_dir, f"table_{t}.npy"), tab)
            np.save(os.path.join(out_dir, f"mom_{t}.npy"), mom)

    def load(self, in_dir: str):
        """Restore host tables + momenta (cache starts cold; rows reload on
        demand through the normal miss path)."""
        import os
        for t in range(self.n_tables):
            self.host_tables[t][:] = np.load(
                os.path.join(in_dir, f"table_{t}.npy"))
            self.host_mom[t][:] = np.load(
                os.path.join(in_dir, f"mom_{t}.npy"))
        return self

    def export_ev_tables(self, out_dir: str, precision: int = 32):
        """EV-table export for the inference storage tier
        (≙ dlrm_s_pytorch.py:1780-1796, directly from the cached trainer)."""
        from evstore_tpu.cache.storage import write_ev_tables_binary
        self.flush_to_host()
        return write_ev_tables_binary(self.host_tables, out_dir, precision)

    def stats(self) -> dict:
        s = self.assigner.stats()
        s.update({
            "capacity": self.capacity,
            "hbm_bytes_per_chip": int(self.capacity // getattr(
                self, "n_cache_shards", 1)
                * (self.dim * jnp.dtype(self.cache_dtype).itemsize + 4)),
            "hbm_bytes": int(self.capacity *
                             (self.dim * jnp.dtype(self.cache_dtype).itemsize
                              + 4)),
            "dropped_updates": self.dropped_updates,
        })
        return s

    def close(self):
        self.engine.close()


class ShardedTrainableDeviceCache(TrainableDeviceCache):
    """HBM-bounded training with the cache working set SHARDED over a mesh:
    per-chip HBM = capacity/n_chips rows (+momenta), so trainable cache
    capacity scales linearly with chips.  2D (data, model) mesh: batch DP
    over `data`, cache slots over `model`; the forward gathers owned slots
    per chip and a psum over `model` exchanges the rows (the same pattern as
    the sharded embedding lookup, parallel/sharded.py); row grads transpose
    through the psum back onto owned slots automatically, then all-reduce
    over `data` keeps every data-replica of a shard identical.

    The reference has neither multi-device caching nor cached training; this
    is the scale-out form of both combined."""

    def __init__(self, cfg: DLRMConfig, tcfg: TrainConfig, ccfg: CacheConfig,
                 tables: Sequence[np.ndarray], mesh, **kw):
        from jax.sharding import NamedSharding, PartitionSpec as P
        from evstore_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS
        self.mesh = mesh
        self._P = P
        self.n_cache_shards = mesh.shape[MODEL_AXIS]
        if ccfg.total_size % self.n_cache_shards:
            raise ValueError(f"capacity {ccfg.total_size} must divide the "
                             f"{self.n_cache_shards}-shard model axis")
        super().__init__(cfg, tcfg, ccfg, tables, **kw)
        cache_sh = NamedSharding(mesh, P(MODEL_AXIS, None))
        mom_sh = NamedSharding(mesh, P(MODEL_AXIS))
        self.cache_values = jax.device_put(self.cache_values, cache_sh)
        self.cache_mom = jax.device_put(self.cache_mom, mom_sh)

    def _build_step(self):
        # called from super().__init__ — mesh attrs already set
        from jax.sharding import PartitionSpec as P
        from evstore_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS
        cfg, tcfg, eps = self.cfg, self.tcfg, self.eps
        C = self.capacity
        Cl = C // self.n_cache_shards
        mesh = self.mesh
        n_data = mesh.shape[DATA_AXIS]
        pad = jnp.iinfo(jnp.int32).max

        def local_step(cache, mom_c, dense_params, dstate, gather_idx,
                       scat_slots, scat_m, buf, buf_mom, dense_x, labels, lr,
                       seed):
            # cache [Cl, D], mom_c [Cl] local; gather_idx/dense_x/labels are
            # the data-shard slice; buf/scat replicated
            me = jax.lax.axis_index(MODEL_AXIS)
            r0 = me * Cl
            store_dt = cache.dtype
            q8 = store_dt == jnp.uint8
            pos = scat_slots - r0
            pos = jnp.where((pos >= 0) & (pos < Cl), pos, pad)
            ins = (_q8_encode_det(buf[scat_m]) if q8
                   else buf[scat_m].astype(store_dt))
            cache = cache.at[pos].set(ins, mode="drop")
            mom_c = mom_c.at[pos].set(buf_mom[scat_m], mode="drop")

            in_cache = gather_idx < C
            spos = gather_idx - r0
            own = in_cache & (spos >= 0) & (spos < Cl)
            safe_c = jnp.clip(spos, 0, Cl - 1)
            safe_b = jnp.clip(gather_idx - C, 0, buf.shape[0] - 1)
            serve_b = (~in_cache) & (me == 0)

            cache_f = _q8_decode(cache) if q8 else cache.astype(jnp.float32)

            def loss_fn(dparams, cache_in, buf_in):
                rows_c = jnp.where(own[..., None], cache_in[safe_c], 0.0)
                rows_b = jnp.where(serve_b[..., None], buf_in[safe_b], 0.0)
                emb = jax.lax.psum(rows_c + rows_b, MODEL_AXIS)
                logits = dlrm_forward(DLRMParams(dparams, {}), dense_x, None,
                                      cfg, emb_rows=emb)
                return dlrm_loss(logits, labels, tcfg.loss_function,
                                 tcfg.loss_weights)

            loss, (g_dense, g_cache, g_buf) = jax.value_and_grad(
                loss_fn, argnums=(0, 1, 2))(dense_params, cache_f, buf)
            loss = jax.lax.pmean(loss, DATA_AXIS)
            g_dense = jax.lax.pmean(g_dense, DATA_AXIS)
            # every data-replica of a cache shard applies the identical
            # update (grads of the local-batch mean -> global mean)
            g_cache = jax.lax.psum(g_cache, DATA_AXIS) / n_data
            g_buf = jax.lax.psum(g_buf, DATA_AXIS) / n_data

            mom_inc_c = jnp.mean(g_cache * g_cache, axis=1)
            touched_c = mom_inc_c > 0
            mom_c2 = mom_c + mom_inc_c
            std_c = jnp.sqrt(mom_c2) + eps
            upd_f = (cache_f - (lr * g_cache / std_c[:, None])
                     * touched_c[:, None])
            if q8:
                # fold in the model-shard index (distinct noise per shard)
                # but NOT the data index: every data-replica of a shard must
                # store identical bytes
                kk = jax.random.fold_in(jax.random.PRNGKey(seed), me)
                cache = jnp.where(touched_c[:, None],
                                  _q8_encode_sr(upd_f, kk), cache)
            else:
                cache = upd_f.astype(store_dt)

            mom_inc_b = jnp.mean(g_buf * g_buf, axis=1)
            touched_b = mom_inc_b > 0
            buf_mom2 = buf_mom + mom_inc_b
            std_b = jnp.sqrt(buf_mom2) + eps
            buf = buf - (lr * g_buf / std_b[:, None]) * touched_b[:, None]

            new_dstate = jax.tree_util.tree_map(
                lambda s, g: s + g.astype(jnp.float32) ** 2, dstate, g_dense)
            dense_params = jax.tree_util.tree_map(
                lambda p, g, s: (p - lr * g / (jnp.sqrt(s) + eps)
                                 ).astype(p.dtype),
                dense_params, g_dense, new_dstate)

            return (cache, jnp.where(touched_c, mom_c2, mom_c), dense_params,
                    new_dstate, buf, jnp.where(touched_b, buf_mom2, buf_mom),
                    loss)

        def make(dense_params, dstate):
            dspec = jax.tree_util.tree_map(lambda _: P(), dense_params)
            sspec = jax.tree_util.tree_map(lambda _: P(), dstate)
            fn = jax.shard_map(
                local_step, mesh=mesh,
                in_specs=(P(MODEL_AXIS, None), P(MODEL_AXIS), dspec, sspec,
                          P(DATA_AXIS, None), P(), P(), P(), P(),
                          P(DATA_AXIS), P(DATA_AXIS), P(), P()),
                out_specs=(P(MODEL_AXIS, None), P(MODEL_AXIS), dspec, sspec,
                           P(), P(), P()),
                check_vma=False)
            return jax.jit(fn, donate_argnums=(0, 1))

        cache_fns = {}

        def step(cache, mom_c, dense_params, dstate, gather_idx, scat_slots,
                 scat_m, buf, buf_mom, dense_x, labels, lr, seed):
            key = (buf.shape, dense_x.shape)
            if key not in cache_fns:
                cache_fns[key] = make(dense_params, dstate)
            lr_arr = jnp.asarray(lr, jnp.float32)
            return cache_fns[key](cache, mom_c, dense_params, dstate,
                                  gather_idx, scat_slots, scat_m, buf,
                                  buf_mom, dense_x, labels, lr_arr, seed)

        return step
