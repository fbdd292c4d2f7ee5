"""ctypes binding for the native tiered-cache engine.

Reference: cache_algo/cpp_socket_client.py binds the C++ engine per request
over ctypes (`ev_lookup((c_int*26)) -> float*`, :119-127) or a TCP socket the
reference itself measures at "50% of latency" (:132).  Here the ABI is
batched — one call per input batch — so the Python/C boundary cost amortizes
over B requests, and the returned [B, T, D] block feeds the TPU directly.
"""

from __future__ import annotations

import ctypes
import os
from typing import Optional, Sequence

import numpy as np

from evstore_tpu.config import CacheConfig


def _load_lib():
    from evstore_tpu.native.build import build
    path = build(quiet=True)
    lib = ctypes.CDLL(path)
    lib.esv_init.restype = ctypes.c_void_p
    lib.esv_init.argtypes = [
        ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_long, ctypes.c_long, ctypes.c_long,
        ctypes.c_int, ctypes.c_int,
        ctypes.c_float, ctypes.c_float,
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_int]
    lib.esv_load_table_mem.restype = ctypes.c_int
    lib.esv_load_table_mem.argtypes = [
        ctypes.c_void_p, ctypes.c_int,
        np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS"),
        ctypes.c_long]
    lib.esv_borrow_table_mem.restype = ctypes.c_int
    lib.esv_borrow_table_mem.argtypes = [
        ctypes.c_void_p, ctypes.c_int,
        np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS"),
        ctypes.c_long]
    lib.esv_open_table_file.restype = ctypes.c_int
    lib.esv_open_table_file.argtypes = [
        ctypes.c_void_p, ctypes.c_int, ctypes.c_char_p, ctypes.c_long,
        ctypes.c_int]
    lib.esv_load_altkeys.restype = ctypes.c_int
    lib.esv_load_altkeys.argtypes = [
        ctypes.c_void_p, ctypes.c_int,
        np.ctypeslib.ndpointer(np.uint32, flags="C_CONTIGUOUS"),
        ctypes.c_long]
    lib.esv_lookup_batch.restype = ctypes.c_long
    lib.esv_lookup_batch.argtypes = [
        ctypes.c_void_p,
        np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS"),
        ctypes.c_long,
        np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")]
    lib.esv_stats.argtypes = [ctypes.c_void_p,
                              np.ctypeslib.ndpointer(np.float64)]
    lib.esv_close.argtypes = [ctypes.c_void_p]
    # device-cache slot assignment mode
    lib.esv_assign_init.restype = ctypes.c_void_p
    lib.esv_assign_init.argtypes = [ctypes.c_void_p, ctypes.c_long,
                                    ctypes.c_float, ctypes.c_float]
    lib.esv_assign_batch.restype = ctypes.c_long
    lib.esv_assign_batch.argtypes = [
        ctypes.c_void_p,
        np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS"),
        ctypes.c_long,
        np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS"),
        ctypes.c_long,
        ctypes.POINTER(ctypes.c_long)]
    lib.esv_assign_stats.argtypes = [ctypes.c_void_p,
                                     np.ctypeslib.ndpointer(np.float64)]
    lib.esv_assign_close.argtypes = [ctypes.c_void_p]
    lib.esv_fetch_rows.argtypes = [
        ctypes.c_void_p,
        np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS"),
        ctypes.c_long,
        np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")]
    lib.esv_assign_resident.restype = ctypes.c_long
    lib.esv_assign_resident.argtypes = [
        ctypes.c_void_p,
        np.ctypeslib.ndpointer(np.uint64, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
        ctypes.c_long]
    lib.esv_assign_batch_train.restype = ctypes.c_long
    lib.esv_assign_batch_train.argtypes = [
        ctypes.c_void_p,
        np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS"),
        ctypes.c_long,
        np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS"),
        ctypes.c_long,
        ctypes.POINTER(ctypes.c_long),
        np.ctypeslib.ndpointer(np.uint64, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
        ctypes.c_long,
        ctypes.POINTER(ctypes.c_long),
        np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")]
    return lib


_LIB = None


def get_lib():
    global _LIB
    if _LIB is None:
        _LIB = _load_lib()
    return _LIB


_EVICTION = {"fifo": 1, "recency": 2}  # aprx_embedding.hpp:32
# C1 policy at engine speed (the reference runs its LFU/LRU baselines only
# at Python speed, cache_algo/LFU.py:69 / LRU.py:38)
_POLICY = {"evlfu": 0, "lfu": 1, "lru": 2}


def parse_criteo_tsv_native(path: str):
    """Fast TSV parse (the cython/ preprocessing equivalent): returns
    (labels int32 [n], dense int64 [n,13], cats int64 [n,26])."""
    lib = get_lib()
    if not hasattr(lib, "_tsv_bound"):
        lib.esv_count_lines.restype = ctypes.c_long
        lib.esv_count_lines.argtypes = [ctypes.c_char_p]
        lib.esv_parse_criteo_tsv.restype = ctypes.c_long
        lib.esv_parse_criteo_tsv.argtypes = [
            ctypes.c_char_p, ctypes.c_long,
            np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
            np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS"),
            np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")]
        lib._tsv_bound = True
    n_lines = lib.esv_count_lines(path.encode())
    if n_lines < 0:
        raise FileNotFoundError(path)
    labels = np.empty(n_lines, np.int32)
    dense = np.empty((n_lines, 13), np.int64)
    cats = np.empty((n_lines, 26), np.int64)
    n = lib.esv_parse_criteo_tsv(path.encode(), n_lines, labels,
                                 dense.reshape(-1), cats.reshape(-1))
    return labels[:n], dense[:n], cats[:n]


def parse_criteo_tsv_range(path: str, start_offset: int, end_offset: int,
                           max_rows: int):
    """Parse only lines starting in byte range [start_offset, end_offset)
    (line boundaries from a newline scan) — the worker primitive of the
    parallel preprocessing path (≙ data_utils.py:876 dataset_multiprocessing
    per-day workers).  Returns (labels, dense, cats)."""
    lib = get_lib()
    if not hasattr(lib, "_tsv_range_bound"):
        lib.esv_parse_criteo_tsv_range.restype = ctypes.c_long
        lib.esv_parse_criteo_tsv_range.argtypes = [
            ctypes.c_char_p, ctypes.c_long, ctypes.c_long, ctypes.c_long,
            np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
            np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS"),
            np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")]
        lib._tsv_range_bound = True
    labels = np.empty(max_rows, np.int32)
    dense = np.empty((max_rows, 13), np.int64)
    cats = np.empty((max_rows, 26), np.int64)
    n = lib.esv_parse_criteo_tsv_range(
        path.encode(), start_offset, end_offset, max_rows, labels,
        dense.reshape(-1), cats.reshape(-1))
    if n < 0:
        raise FileNotFoundError(path)
    return labels[:n], dense[:n], cats[:n]


def parse_criteo_tsv_chunks(path: str, chunk_rows: int = 1_000_000):
    """Generator of (labels, dense, cats) numpy chunks with bounded memory
    (native chunked parser; streaming ≙ the reference's per-day processing,
    data_utils.py:876)."""
    lib = get_lib()
    if not hasattr(lib, "_tsv_chunk_bound"):
        lib.esv_parse_criteo_tsv_chunk.restype = ctypes.c_long
        lib.esv_parse_criteo_tsv_chunk.argtypes = [
            ctypes.c_char_p, ctypes.c_long, ctypes.c_long,
            np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
            np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS"),
            np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS"),
            ctypes.POINTER(ctypes.c_long)]
        lib._tsv_chunk_bound = True
    offset = ctypes.c_long(0)
    labels = np.empty(chunk_rows, np.int32)
    dense = np.empty((chunk_rows, 13), np.int64)
    cats = np.empty((chunk_rows, 26), np.int64)
    while True:
        n = lib.esv_parse_criteo_tsv_chunk(
            path.encode(), offset.value, chunk_rows, labels,
            dense.reshape(-1), cats.reshape(-1), ctypes.byref(offset))
        if n < 0:
            raise FileNotFoundError(path)
        if n == 0:
            return
        yield labels[:n].copy(), dense[:n].copy(), cats[:n].copy()
        if n < chunk_rows:
            return


class NativeTieredCache:
    """Drop-in for cache.tiers.TieredCache backed by the C++ engine."""

    def __init__(self, cfg: CacheConfig, n_tables: int, dim: int,
                 n_reader_threads: int = 4):
        self.cfg = cfg
        self.n_tables = n_tables
        self.dim = dim
        lib = get_lib()
        c1, c2, c3 = cfg.tier_capacities()
        self._h = lib.esv_init(
            n_tables, dim, cfg.n_caching_layers, c1, c2, c3,
            cfg.main_precision, cfg.secondary_precision,
            cfg.flush_rate, cfg.perfect_item_cap,
            cfg.high_agghit_threshold, _EVICTION[cfg.c3_eviction],
            cfg.c3_io_batch, n_reader_threads,
            _POLICY.get(cfg.policy, 0))
        if not self._h:
            raise ValueError(
                f"esv_init rejected config: n_tables={n_tables} (max 64), "
                f"dim={dim} — see evstore_core.cpp kMaxTables")
        self._lib = lib

    def load_tables(self, tables: Sequence[np.ndarray]):
        for t, tab in enumerate(tables):
            tab = np.ascontiguousarray(tab, np.float32)
            rc = self._lib.esv_load_table_mem(self._h, t, tab, tab.shape[0])
            if rc != 0:
                raise RuntimeError(f"esv_load_table_mem({t}) -> {rc}")
        return self

    def borrow_tables(self, tables: Sequence[np.ndarray]):
        """Zero-copy backing store: the engine reads the caller's buffers
        directly (caller must keep them alive and contiguous; in-place
        mutations are observed by subsequent fetches)."""
        self._borrowed_refs = []
        for t, tab in enumerate(tables):
            tab = np.ascontiguousarray(tab, np.float32)
            self._borrowed_refs.append(tab)
            rc = self._lib.esv_borrow_table_mem(self._h, t, tab, tab.shape[0])
            if rc != 0:
                raise RuntimeError(f"esv_borrow_table_mem({t}) -> {rc}")
        return self

    def open_table_files(self, bin_dir: str, table_sizes: Sequence[int],
                         precision: int = 32):
        for t, n in enumerate(table_sizes):
            p = os.path.join(bin_dir, f"ev-table-{t + 1}.bin").encode()
            rc = self._lib.esv_open_table_file(self._h, t, p, n, precision)
            if rc != 0:
                raise RuntimeError(f"esv_open_table_file({t}) -> {rc}")
        return self

    def load_altkeys(self, alt_tables: Sequence[np.ndarray]):
        for t, alts in enumerate(alt_tables):
            alts = np.ascontiguousarray(alts, np.uint32)
            rc = self._lib.esv_load_altkeys(self._h, t, alts, alts.shape[0])
            if rc != 0:
                raise RuntimeError(f"esv_load_altkeys({t}) -> {rc}")
        return self

    def request_batch(self, idx: np.ndarray) -> np.ndarray:
        idx = np.ascontiguousarray(idx, np.int64)
        B = idx.shape[0]
        out = np.empty((B, self.n_tables, self.dim), np.float32)
        rc = self._lib.esv_lookup_batch(self._h, idx, B, out)
        if rc == -2:
            raise ValueError("esv_lookup_batch: row id out of [0, 2^40)")
        return out

    def request(self, group_row_ids):
        idx = np.asarray(group_row_ids, np.int64)[None, :]
        out = self.request_batch(idx)
        return out[0], None, None

    def stats(self) -> dict:
        s = np.zeros(8, np.float64)
        self._lib.esv_stats(self._h, s)
        out = {
            "requests": int(s[0]), "perfect_hits": int(s[1]),
            "c1": {"size": int(s[2]), "hit_rate": float(s[3])},
        }
        if self.cfg.n_caching_layers >= 2:
            out["c2"] = {"size": int(s[4]), "hit_rate": float(s[5])}
        if self.cfg.n_caching_layers >= 3:
            out["c3"] = {"size": int(s[6]), "hits": int(s[7])}
        return out

    def close(self):
        if self._h is not None:
            if getattr(self, "_assign_h", None) is not None:
                self._lib.esv_assign_close(self._assign_h)
                self._assign_h = None
            self._lib.esv_close(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


class NativeAssigner:
    """Slot-assignment front-end for the device (HBM) C1 cache: the EvLFU
    policy + free-list + miss fetch run in C++; Python receives gather
    indices, a scatter list, and the miss-row buffer per batch."""

    def __init__(self, engine: NativeTieredCache, capacity: int,
                 flush_rate: float = 0.3, perfect_item_cap: float = 0.95):
        self.engine = engine
        self.capacity = int(capacity)
        self.dim = engine.dim
        self.n_tables = engine.n_tables
        self._lib = engine._lib
        self._h = self._lib.esv_assign_init(
            engine._h, self.capacity, flush_rate, perfect_item_cap)
        if not self._h:
            raise ValueError("esv_assign_init rejected engine config")
        engine._assign_h = self._h     # engine owns teardown

    def assign_batch(self, idx: np.ndarray):
        """idx [B, T] -> (slots [B,T] i32, scat_slots [n] i32,
        scat_m [n] i32, buf [n_buf, D] f32)."""
        idx = np.ascontiguousarray(idx, np.int64)
        B, T = idx.shape
        maxM = B * T
        slots = np.empty((B, T), np.int32)
        scat_slots = np.empty(maxM, np.int32)
        scat_m = np.empty(maxM, np.int32)
        buf = np.empty((maxM, self.dim), np.float32)
        n_scat = ctypes.c_long(0)
        n_buf = self._lib.esv_assign_batch(
            self._h, idx.reshape(-1), B, slots.reshape(-1), scat_slots,
            scat_m, buf.reshape(-1), maxM, ctypes.byref(n_scat))
        if n_buf == -2:
            raise ValueError("esv_assign_batch: row id out of [0, 2^40)")
        if n_buf < 0:
            raise RuntimeError("esv_assign_batch: buffer overflow")
        return (slots, scat_slots[:n_scat.value], scat_m[:n_scat.value],
                buf[:n_buf])

    def assign_batch_train(self, idx: np.ndarray):
        """Training mode: deferred slot reuse + eviction reporting + final
        gradient targets.  Returns (slots [B,T], scat_slots, scat_m,
        buf [n_buf, D], evicted_keys [(t, row)...], evicted_slots,
        upd_targets [B,T])."""
        (slots, scat_slots, scat_m, buf, ev_keys, ev_slots,
         upd) = self.assign_batch_train_raw(idx)
        keys = [(int(k >> 40), int(k & ((1 << 40) - 1))) for k in ev_keys]
        return slots, scat_slots, scat_m, buf, keys, ev_slots, upd

    def assign_batch_train_raw(self, idx: np.ndarray):
        """assign_batch_train with evicted keys as a packed uint64 array
        (table<<40|row, the engine key layout) — no per-eviction Python
        tuple construction; the windowed trainer tracks keys packed."""
        idx = np.ascontiguousarray(idx, np.int64)
        B, T = idx.shape
        maxM = B * T
        slots = np.empty((B, T), np.int32)
        scat_slots = np.empty(maxM, np.int32)
        scat_m = np.empty(maxM, np.int32)
        buf = np.empty((maxM, self.dim), np.float32)
        ev_keys = np.empty(maxM + self.capacity, np.uint64)
        ev_slots = np.empty(maxM + self.capacity, np.int32)
        upd = np.empty((B, T), np.int32)
        n_scat = ctypes.c_long(0)
        n_ev = ctypes.c_long(0)
        n_buf = self._lib.esv_assign_batch_train(
            self._h, idx.reshape(-1), B, slots.reshape(-1), scat_slots,
            scat_m, buf.reshape(-1), maxM, ctypes.byref(n_scat),
            ev_keys, ev_slots, len(ev_keys), ctypes.byref(n_ev),
            upd.reshape(-1))
        if n_buf == -2:
            raise ValueError(
                "esv_assign_batch_train: row id out of [0, 2^40)")
        if n_buf < 0:
            raise RuntimeError("esv_assign_batch_train: buffer overflow")
        ne = n_ev.value
        return (slots, scat_slots[:n_scat.value], scat_m[:n_scat.value],
                buf[:n_buf], ev_keys[:ne].copy(), ev_slots[:ne].copy(), upd)

    def fetch_rows(self, keys) -> np.ndarray:
        """Batched storage fetch through the reader pool (train mode does
        this AFTER eviction write-back)."""
        tabs = np.asarray([k[0] for k in keys], np.int32)
        rows = np.asarray([k[1] for k in keys], np.int64)
        return self.fetch_rows_arrays(tabs, rows)

    def fetch_rows_arrays(self, tabs: np.ndarray, rows: np.ndarray
                          ) -> np.ndarray:
        n = len(tabs)
        tabs = np.ascontiguousarray(tabs, np.int32)
        rows = np.ascontiguousarray(rows, np.int64)
        out = np.empty((n, self.dim), np.float32)
        if n:
            self._lib.esv_fetch_rows(self._h, tabs, rows, n, out.reshape(-1))
        return out

    def resident_entries(self):
        """All cache-resident ((t, row), slot) pairs (for drain/flush)."""
        keys = np.empty(self.capacity, np.uint64)
        slots = np.empty(self.capacity, np.int32)
        n = self._lib.esv_assign_resident(self._h, keys, slots, self.capacity)
        out_keys = [(int(k >> 40), int(k & ((1 << 40) - 1)))
                    for k in keys[:n]]
        m = [i for i, s in enumerate(slots[:n]) if s >= 0]
        return [out_keys[i] for i in m], slots[:n][m].copy()

    def stats(self) -> dict:
        s = np.zeros(4, np.float64)
        self._lib.esv_assign_stats(self._h, s)
        return {"requests": int(s[0]), "perfect_hits": int(s[1]),
                "size": int(s[2]), "hit_rate": float(s[3])}


class NativeShardedCache:
    """Table-partitioned PARALLEL tiered cache (C1 / C1+C2): the 26 tables
    split round-robin over `n_workers` threads, each owning sub-tiers;
    per-request the workers exchange the global agg_hit through atomics
    (evstore_core.cpp ShardedEngine).  The reference's engine is serial
    (its threads only read miss IO, evlfu_8.cpp:191-250) — this is the
    scale-out beyond it.  Semantics deviations vs the sequential engine
    are documented at the C++ struct; no C3 support (alt keys cross
    shards).  Backing store: borrowed in-RAM tables only."""

    def __init__(self, cfg: CacheConfig, n_tables: int, dim: int,
                 n_workers: int = 2):
        if cfg.n_caching_layers > 2:
            raise ValueError("sharded engine supports C1 / C1+C2 only")
        import ctypes
        lib = get_lib()
        if not hasattr(lib, "_shard_bound"):
            lib.esv_shard_init.restype = ctypes.c_void_p
            lib.esv_shard_init.argtypes = [
                ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
                ctypes.c_long, ctypes.c_long, ctypes.c_int, ctypes.c_int,
                ctypes.c_float, ctypes.c_float, ctypes.c_int, ctypes.c_int]
            lib.esv_shard_borrow_table.restype = ctypes.c_int
            lib.esv_shard_borrow_table.argtypes = [
                ctypes.c_void_p, ctypes.c_int,
                np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS"),
                ctypes.c_long]
            lib.esv_shard_lookup_batch.restype = ctypes.c_long
            lib.esv_shard_lookup_batch.argtypes = [
                ctypes.c_void_p,
                np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS"),
                ctypes.c_long,
                np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")]
            lib.esv_shard_stats.argtypes = [
                ctypes.c_void_p,
                np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")]
            lib.esv_shard_close.argtypes = [ctypes.c_void_p]
            lib._shard_bound = True
        self.cfg = cfg
        self.n_tables = n_tables
        self.dim = dim
        self.n_workers = n_workers
        c1, c2, _ = cfg.tier_capacities()
        self._h = lib.esv_shard_init(
            n_workers, n_tables, dim, cfg.n_caching_layers, c1, c2,
            cfg.main_precision, cfg.secondary_precision,
            cfg.flush_rate, cfg.perfect_item_cap,
            cfg.high_agghit_threshold, _POLICY.get(cfg.policy, 0))
        if not self._h:
            raise ValueError("esv_shard_init rejected config")
        self._lib = lib

    def borrow_tables(self, tables):
        self._borrowed_refs = []
        for t, tab in enumerate(tables):
            tab = np.ascontiguousarray(tab, np.float32)
            self._borrowed_refs.append(tab)
            rc = self._lib.esv_shard_borrow_table(self._h, t, tab,
                                                  tab.shape[0])
            if rc != 0:
                raise RuntimeError(f"esv_shard_borrow_table({t}) -> {rc}")
        return self

    def request_batch(self, idx: np.ndarray) -> np.ndarray:
        idx = np.ascontiguousarray(idx, np.int64)
        B = idx.shape[0]
        out = np.empty((B, self.n_tables, self.dim), np.float32)
        rc = self._lib.esv_shard_lookup_batch(self._h, idx, B, out)
        if rc == -2:
            raise ValueError("row id out of [0, 2^40)")
        return out

    def stats(self) -> dict:
        s = np.zeros(6, np.float64)
        self._lib.esv_shard_stats(self._h, s)
        out = {"requests": int(s[0]), "perfect_hits": int(s[1]),
               "c1": {"size": int(s[2]), "hit_rate": float(s[3])}}
        if self.cfg.n_caching_layers >= 2:
            out["c2"] = {"size": int(s[4]), "hit_rate": float(s[5])}
        return out

    def close(self):
        if self._h:
            self._lib.esv_shard_close(self._h)
            self._h = None
