"""Device-resident C1 cache: EvLFU-managed rows living in TPU HBM.

This is the TPU-native form of EVStore's C1 tier (BASELINE config 3): the hot
rows of all embedding tables live in ONE fixed-size HBM array [C, D] (or
uint8 [C, D] at 8-bit precision) — HBM footprint is bounded by the cache
capacity, not the table sizes.  The groupability-aware EvLFU policy runs on
the host (it is branchy, data-dependent bookkeeping — exactly what a TPU is
bad at) and maps keys to cache SLOTS; the device only ever sees dense
indices, so the per-batch device work is one scatter (miss rows in) + one
gather (all rows out), both static-shaped and jit-compiled once.

Aliasing design: within a segment (one device apply), a row inserted this
segment is gathered from the *shipped miss buffer* (index capacity+m), never
from its cache slot — so slots freed by evictions can be reused immediately
without corrupting earlier requests, and the policy trajectory is exactly
the host engine's.  A slot that served a *hit* this segment is pinned until
the segment flushes (the gather will read it).  The scatter applies the LAST
write per slot, which is the correct state for future segments.

Host->device traffic per batch is the miss rows only — the whole point of
the cache tier (the reference ships every looked-up row to the GPU each
request, dlrm_s_pytorch_C1.py:227-276).
"""

from __future__ import annotations

import functools
from typing import Dict, List, Set, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from evstore_tpu.cache.policy import EvLFU
from evstore_tpu.cache.storage import StorageManager
from evstore_tpu.config import CacheConfig

Key = Tuple[int, int]


@functools.partial(jax.jit, donate_argnums=(0,))
def _apply_fp32(cache, slots, scat_slots, scat_m, buf):
    """cache [C,D] fp32; slots [B,T] gather indices over concat(cache, buf);
    scat_slots [Mp] (pad == C -> dropped); scat_m [Mp] buffer rows to write;
    buf [Mp, D] shipped miss rows."""
    cache = cache.at[scat_slots].set(buf[scat_m], mode="drop")
    combined = jnp.concatenate([cache, buf], axis=0)
    rows = jnp.take(combined, slots, axis=0)
    return cache, rows


@functools.partial(jax.jit, donate_argnums=(0,))
def _apply_u8(cache_u8, slots, scat_slots, scat_m, buf_u8):
    cache_u8 = cache_u8.at[scat_slots].set(buf_u8[scat_m], mode="drop")
    combined = jnp.concatenate([cache_u8, buf_u8], axis=0)
    enc = jnp.take(combined, slots, axis=0).astype(jnp.float32)
    rows = (enc / 254.0) * 2.0 - 1.0   # dequant fused into the gather program
    return cache_u8, rows


class DeviceC1Cache:
    """HBM-resident EvLFU cache in front of a host backing store."""

    def __init__(self, cfg: CacheConfig, storage: StorageManager,
                 n_tables: int, dim: int, insert_bucket: int = 512):
        if cfg.main_precision not in (32, 8):
            raise ValueError("device cache supports fp32 or int8 rows")
        if cfg.total_size < n_tables:
            raise ValueError(f"capacity {cfg.total_size} < one request group "
                             f"({n_tables} rows)")
        self.cfg = cfg
        self.storage = storage
        self.n_tables = n_tables
        self.dim = dim
        self.capacity = cfg.total_size
        self.insert_bucket = insert_bucket
        self.precision = cfg.main_precision

        self._free: List[int] = list(range(self.capacity - 1, -1, -1))
        self._pending: List[int] = []     # freed this segment, maybe pinned
        self._pinned: Set[int] = set()    # slots gathered (as hits) this seg
        def _on_evict(_key, slot):
            if slot >= 0:               # NO_SLOT keys had no HBM residency
                self._pending.append(slot)

        self.policy = EvLFU(self.capacity, n_tables, cfg.flush_rate,
                            cfg.perfect_item_cap, on_evict=_on_evict)
        dtype = jnp.float32 if self.precision == 32 else jnp.uint8
        self.cache_values = jnp.zeros((self.capacity, dim), dtype)
        self.n_requests = 0
        self.n_perfect = 0
        self.n_segments = 0
        self.bytes_shipped = 0

    # ----------------------------------------------------------- host side

    def _sweep_pending(self):
        """Move unpinned freed slots back to the free list."""
        still = []
        for s in self._pending:
            if s in self._pinned:
                still.append(s)
            else:
                self._free.append(s)
        self._pending = still

    def _apply_segment(self, seg_slots, ins_keys, scatter_map) -> np.ndarray:
        slots = np.stack(seg_slots)
        M = len(ins_keys)
        bk = self.insert_bucket
        Mp = max(bk, ((M + bk - 1) // bk) * bk)
        buf = np.zeros((Mp, self.dim), np.float32)
        if M:
            buf[:M] = self.storage.get_batch(ins_keys)
        scat_slots = np.full((Mp,), self.capacity, np.int32)  # pad -> dropped
        scat_m = np.zeros((Mp,), np.int32)
        for j, (slot, m) in enumerate(scatter_map.items()):
            scat_slots[j] = slot
            scat_m[j] = m
        if self.precision == 8:
            from evstore_tpu.ops.quant import np_quantize_int8
            payload = np_quantize_int8(buf)
            self.bytes_shipped += Mp * self.dim
            self.cache_values, out = _apply_u8(
                self.cache_values, jnp.asarray(slots),
                jnp.asarray(scat_slots), jnp.asarray(scat_m),
                jnp.asarray(payload))
        else:
            self.bytes_shipped += Mp * self.dim * 4
            self.cache_values, out = _apply_fp32(
                self.cache_values, jnp.asarray(slots),
                jnp.asarray(scat_slots), jnp.asarray(scat_m),
                jnp.asarray(buf))
        self._pinned.clear()
        self._sweep_pending()
        self.n_segments += 1
        return np.asarray(out)

    # --------------------------------------------------------------- public

    def lookup_batch(self, idx: np.ndarray) -> np.ndarray:
        """[B, T] int -> [B, T, D] fp32 rows; updates cache state."""
        idx = np.asarray(idx)
        B, T = idx.shape
        C = self.capacity
        outputs: List[np.ndarray] = []
        seg_slots: List[np.ndarray] = []
        ins_keys: List[Key] = []
        scatter_map: Dict[int, int] = {}      # slot -> last buffer row m
        seg_buf_idx: Dict[Key, int] = {}      # key -> C + m (this segment)

        NO_SLOT = -1

        def buffer_serve(key) -> int:
            """Ship this key's row in the segment buffer; return its gather
            index (C + m)."""
            m = len(ins_keys)
            ins_keys.append(key)
            seg_buf_idx[key] = C + m
            return C + m

        def take_slot():
            if not self._free:
                self._sweep_pending()
            return self._free.pop() if self._free else NO_SLOT

        def insert(key, agg) -> int:
            """policy.set (may evict, freeing slots), then take a slot.  If
            every free slot is pinned by earlier gathers this segment, the
            key lives policy-side with NO_SLOT (served from the buffer; a
            later hit re-attempts slot assignment) — values and policy
            trajectory stay exact, only HBM residency is deferred."""
            self.policy.set(key, NO_SLOT, agg)
            gidx = buffer_serve(key)
            slot = take_slot()
            if slot != NO_SLOT:
                self.policy.vals[key][0] = slot
                scatter_map[slot] = gidx - C
            return gidx

        for b in range(B):
            # keep segments healthy: recycle freed slots between requests
            if len(self._free) < T and seg_slots:
                avail = len(self._free) + sum(1 for s in self._pending
                                              if s not in self._pinned)
                if avail < T:
                    outputs.append(self._apply_segment(seg_slots, ins_keys,
                                                       scatter_map))
                    seg_slots, ins_keys = [], []
                    scatter_map, seg_buf_idx = {}, {}
            keys = [(t, int(idx[b, t])) for t in range(T)]
            hits, agg = self.policy.probe_group(keys)
            row_slots = np.empty((T,), np.int32)
            for t, (k, h) in enumerate(zip(keys, hits)):
                if h:
                    slot = self.policy.update_agg_hit(k, agg)
                    if slot is None:     # evicted earlier in this segment
                        row_slots[t] = insert(k, agg)
                    elif k in seg_buf_idx:
                        row_slots[t] = seg_buf_idx[k]   # inserted this seg
                    elif slot == NO_SLOT:
                        # HBM residency was deferred; serve from buffer and
                        # retry slot assignment
                        gidx = buffer_serve(k)
                        row_slots[t] = gidx
                        s2 = take_slot()
                        if s2 != NO_SLOT:
                            self.policy.vals[k][0] = s2
                            scatter_map[s2] = gidx - C
                    else:
                        self._pinned.add(slot)
                        row_slots[t] = slot
                else:
                    row_slots[t] = insert(k, agg)
            seg_slots.append(row_slots)
            self.policy.n_requests += 1
            self.n_requests += 1
            if agg == T:
                self.policy.n_perfect_hits += 1
                self.n_perfect += 1
                self.policy.n_perfect = len(self.policy.buckets[T])

        if seg_slots:
            outputs.append(self._apply_segment(seg_slots, ins_keys,
                                               scatter_map))
        return np.concatenate(outputs, axis=0)

    def stats(self) -> dict:
        s = self.policy.stats()
        return {
            "requests": self.n_requests,
            "perfect_hits": self.n_perfect,
            "hit_rate": s["hit_rate"],
            "size": s["size"],
            "capacity": self.capacity,
            "segments": self.n_segments,
            "hbm_bytes": int(self.capacity * self.dim
                             * (1 if self.precision == 8 else 4)),
            "bytes_shipped": self.bytes_shipped,
        }


def _make_sharded_apply(mesh, axis, capacity: int, precision: int):
    """shard_map apply over a cache array sharded on `axis` (one mesh axis
    name or a tuple of them — default all axes, i.e. every chip holds
    capacity/n_chips slots): each chip scatters/gathers only the slots it
    owns and a psum combines the rows — the same masked-gather + psum
    exchange as the sharded embedding lookup (parallel/sharded.py).  Buffer
    (miss) rows are replicated; shard 0 serves them so the psum stays
    exact."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    axes = (axis,) if isinstance(axis, str) else tuple(axis)
    n_dev = 1
    for a in axes:
        n_dev *= mesh.shape[a]
    if capacity % n_dev:
        raise ValueError(f"capacity {capacity} must divide the {n_dev}-chip "
                         f"cache axis")
    c_local = capacity // n_dev
    pad = jnp.iinfo(jnp.int32).max

    def local_apply(cache_local, slots, scat_slots, scat_m, buf):
        me = jnp.zeros((), jnp.int32)
        for a in axes:   # row-major fold over the sharding axes
            me = me * mesh.shape[a] + jax.lax.axis_index(a)
        r0 = me * c_local
        # scatter miss rows into owned slots (pad/foreign -> dropped)
        pos = scat_slots - r0
        pos = jnp.where((pos >= 0) & (pos < c_local), pos, pad)
        cache_local = cache_local.at[pos].set(buf[scat_m], mode="drop")
        # gather owned cache slots
        spos = slots - r0
        own = (spos >= 0) & (spos < c_local)
        enc = jnp.take(cache_local, jnp.clip(spos, 0, c_local - 1), axis=0)
        if precision == 8:
            rows_c = (enc.astype(jnp.float32) / 254.0) * 2.0 - 1.0
        else:
            rows_c = enc
        rows_c = jnp.where(own[..., None], rows_c, 0.0)
        # buffer-served rows (this-segment inserts): shard 0 only
        is_buf = (slots >= capacity) & (me == 0)
        brow = jnp.take(buf, jnp.clip(slots - capacity, 0,
                                      buf.shape[0] - 1), axis=0)
        if precision == 8:
            brow = (brow.astype(jnp.float32) / 254.0) * 2.0 - 1.0
        rows = rows_c + jnp.where(is_buf[..., None], brow, 0.0)
        rows = jax.lax.psum(rows, axes)
        return cache_local, rows

    cache_spec = P(axes, None)
    fn = jax.shard_map(local_apply, mesh=mesh,
                       in_specs=(cache_spec, P(), P(), P(), P()),
                       out_specs=(cache_spec, P()),
                       check_vma=False)
    return (jax.jit(fn, donate_argnums=(0,)),
            NamedSharding(mesh, cache_spec), c_local)


class ShardedDeviceC1Cache:
    """Multi-chip device C1 cache: the HBM slot array is sharded over a mesh
    axis, so cache CAPACITY scales linearly with chips while the policy
    (native EvLFU assigner) stays a single host-side trajectory handing out
    global slot ids.  Per batch: one replicated miss buffer broadcast, one
    owned-slot scatter per chip, one masked gather + psum — rows come back
    replicated, ready for a data-parallel model forward.

    The reference has no multi-device cache at all (its C++ engine is one
    process, cache_manager.cpp; the GPU-pinned driver forces ndevices=1,
    dlrm_s_pytorch_lock_gpu_C1.py:1613-1614) — this is the TPU-native scale-
    out of the C1 tier."""

    def __init__(self, cfg: CacheConfig, n_tables: int, dim: int, mesh,
                 axis: str = None, insert_bucket: int = 4096,
                 n_reader_threads: int = 4):
        if cfg.main_precision not in (32, 8):
            raise ValueError("device cache supports fp32 or int8 rows")
        from evstore_tpu.native import NativeAssigner, NativeTieredCache
        axis = axis or tuple(mesh.axis_names)   # default: all chips
        self.cfg = cfg
        self.n_tables = n_tables
        self.dim = dim
        self.insert_bucket = insert_bucket
        self.precision = cfg.main_precision
        if cfg.n_caching_layers >= 2:
            # hybrid: sharded device C1 + host C2/C3 (see NativeDeviceC1Cache)
            self.engine = NativeTieredCache(cfg, n_tables, dim,
                                            n_reader_threads)
            self.capacity = cfg.tier_capacities()[0]
        else:
            eng_cfg = CacheConfig(policy="evlfu", n_caching_layers=1,
                                  total_size=1)
            self.engine = NativeTieredCache(eng_cfg, n_tables, dim,
                                            n_reader_threads)
            self.capacity = cfg.total_size
        self.assigner = NativeAssigner(self.engine, self.capacity,
                                       cfg.flush_rate, cfg.perfect_item_cap)
        self._apply, self._sharding, self.c_local = _make_sharded_apply(
            mesh, axis, self.capacity, self.precision)
        dtype = jnp.float32 if self.precision == 32 else jnp.uint8
        self.cache_values = jax.device_put(
            jnp.zeros((self.capacity, dim), dtype), self._sharding)
        self.bytes_shipped = 0

    def load_tables(self, tables):
        self.engine.load_tables(tables)
        return self

    def load_altkeys(self, alt_tables):
        self.engine.load_altkeys([np.asarray(a, np.uint32)
                                  for a in alt_tables])
        return self

    def open_table_files(self, bin_dir, table_sizes, precision=32):
        self.engine.open_table_files(bin_dir, table_sizes, precision)
        return self

    def lookup_batch(self, idx: np.ndarray, as_numpy: bool = False):
        slots, scat_slots, scat_m, buf = self.assigner.assign_batch(idx)
        bk = self.insert_bucket
        M = buf.shape[0]
        Mp = max(bk, ((M + bk - 1) // bk) * bk)
        buf_p = np.zeros((Mp, self.dim), np.float32)
        buf_p[:M] = buf
        ss = np.full((Mp,), jnp.iinfo(jnp.int32).max, np.int32)
        sm = np.zeros((Mp,), np.int32)
        ss[:len(scat_slots)] = scat_slots
        sm[:len(scat_m)] = scat_m
        if self.precision == 8:
            from evstore_tpu.ops.quant import np_quantize_int8
            payload = np_quantize_int8(buf_p).astype(np.uint8)
        else:
            payload = buf_p
        self.bytes_shipped += payload.nbytes
        self.cache_values, out = self._apply(
            self.cache_values, jnp.asarray(slots), jnp.asarray(ss),
            jnp.asarray(sm), jnp.asarray(payload))
        return np.asarray(out) if as_numpy else out

    def request_batch(self, idx: np.ndarray) -> np.ndarray:
        return self.lookup_batch(idx, as_numpy=True)

    def stats(self) -> dict:
        s = self.assigner.stats()
        s.update({
            "capacity": self.capacity,
            "hbm_bytes_per_chip": int(self.c_local * self.dim
                                      * (1 if self.precision == 8 else 4)),
            "bytes_shipped": self.bytes_shipped,
        })
        return s

    def close(self):
        self.engine.close()


class NativeDeviceC1Cache:
    """DeviceC1Cache with the policy/free-list/miss-IO in the C++ engine
    (NativeAssigner) — the production configuration: per batch, one C call
    produces (slots, scatter, miss buffer) and one jitted apply runs on the
    TPU.  The Python per-key loop of DeviceC1Cache (~0.3 ms/request) becomes
    ~1-2 us/request."""

    def __init__(self, cfg: CacheConfig, n_tables: int, dim: int,
                 insert_bucket: int = 4096, n_reader_threads: int = 4):
        if cfg.main_precision not in (32, 8):
            raise ValueError("device cache supports fp32 or int8 rows")
        from evstore_tpu.native import NativeAssigner, NativeTieredCache
        self.cfg = cfg
        self.n_tables = n_tables
        self.dim = dim
        self.insert_bucket = insert_bucket
        self.precision = cfg.main_precision
        if cfg.n_caching_layers >= 2:
            # hybrid tier stack: device C1 (HBM slots, this class) backed by
            # the engine's host C2 (DRAM, secondary precision) and C3
            # (alt-key) tiers — misses are served from C2/C3 without storage
            # IO; true-miss insertion splits C1/C2 by the reference's
            # heuristic (evlfu_8.cpp:724-736).  Capacity splits per
            # size_proportion with precision-scaled entry counts.
            self.engine = NativeTieredCache(cfg, n_tables, dim,
                                            n_reader_threads)
            self.capacity = cfg.tier_capacities()[0]
        else:
            # engine provides storage + reader pool only; tiers unused
            eng_cfg = CacheConfig(policy="evlfu", n_caching_layers=1,
                                  total_size=1)
            self.engine = NativeTieredCache(eng_cfg, n_tables, dim,
                                            n_reader_threads)
            self.capacity = cfg.total_size
        self.assigner = NativeAssigner(self.engine, self.capacity,
                                       cfg.flush_rate, cfg.perfect_item_cap)
        dtype = jnp.float32 if self.precision == 32 else jnp.uint8
        self.cache_values = jnp.zeros((self.capacity, dim), dtype)
        self.bytes_shipped = 0

    def load_tables(self, tables):
        self.engine.load_tables(tables)
        return self

    def load_altkeys(self, alt_tables):
        """C3 alt-key source tables (offline kNN product, tools/gen_altkeys)."""
        self.engine.load_altkeys([np.asarray(a, np.uint32)
                                  for a in alt_tables])
        return self

    def open_table_files(self, bin_dir, table_sizes, precision=32):
        self.engine.open_table_files(bin_dir, table_sizes, precision)
        return self

    def _apply_assign(self, assign, as_numpy: bool = False):
        slots, scat_slots, scat_m, buf = assign
        bk = self.insert_bucket
        M = buf.shape[0]
        Mp = max(bk, ((M + bk - 1) // bk) * bk)
        buf_p = np.zeros((Mp, self.dim), np.float32)
        buf_p[:M] = buf
        ss = np.full((Mp,), self.capacity, np.int32)
        sm = np.zeros((Mp,), np.int32)
        ss[:len(scat_slots)] = scat_slots
        sm[:len(scat_m)] = scat_m
        if self.precision == 8:
            from evstore_tpu.ops.quant import np_quantize_int8
            payload = np_quantize_int8(buf_p)
            self.bytes_shipped += Mp * self.dim
            self.cache_values, out = _apply_u8(
                self.cache_values, jnp.asarray(slots), jnp.asarray(ss),
                jnp.asarray(sm), jnp.asarray(payload))
        else:
            self.bytes_shipped += Mp * self.dim * 4
            self.cache_values, out = _apply_fp32(
                self.cache_values, jnp.asarray(slots), jnp.asarray(ss),
                jnp.asarray(sm), jnp.asarray(buf_p))
        return np.asarray(out) if as_numpy else out

    def lookup_batch(self, idx: np.ndarray, as_numpy: bool = False):
        return self._apply_assign(self.assigner.assign_batch(idx), as_numpy)

    def lookup_batches_pipelined(self, batches, as_numpy: bool = False):
        """Generator over batches with the HOST ASSIGNER pipelined one
        batch ahead of the device apply: the C++ policy pass for batch
        k+1 (the serial cost of the hybrid tier stack) overlaps batch k's
        packing/quantize/dispatch on the main thread.  Policy order is
        unchanged (the worker runs assigns sequentially)."""
        import concurrent.futures as cf
        with cf.ThreadPoolExecutor(max_workers=1) as ex:
            prev = None
            for idx in batches:
                idx = np.asarray(idx)
                fut = ex.submit(self.assigner.assign_batch, idx)
                if prev is not None:
                    yield self._apply_assign(prev.result(), as_numpy)
                prev = fut
            if prev is not None:
                yield self._apply_assign(prev.result(), as_numpy)

    def request_batch(self, idx: np.ndarray) -> np.ndarray:
        return self.lookup_batch(idx, as_numpy=True)

    def stats(self) -> dict:
        s = self.assigner.stats()
        s.update({
            "capacity": self.capacity,
            "hbm_bytes": int(self.capacity * self.dim
                             * (1 if self.precision == 8 else 4)),
            "bytes_shipped": self.bytes_shipped,
        })
        if self.cfg.n_caching_layers >= 2:
            es = self.engine.stats()
            if "c2" in es:
                s["c2"] = es["c2"]
            if "c3" in es:
                s["c3"] = es["c3"]
        return s

    def close(self):
        self.engine.close()
