"""The multi-tier EVStore engine: C1 + C2 (mixed precision) + C3 (alt-key).

Behavioral parity with the reference's native engine
(mixed_precs_caching/cache_manager.cpp + evlfu_{4,8,16,32}.cpp +
aprx_embedding.cpp), re-designed around batched lookups:

- C1: EvLFU at `main_precision` (32/16/8/4) — the hot tier.
- C2: EvLFU at `secondary_precision` — probed first (phase 1), fills double
  misses per the C1/C2 split heuristic (evlfu_8.cpp:570-601): when C1 is full
  and the combined agg_hit < high_agghit_threshold (23), C1 and C2 split
  double-misses 50/50 by index parity; at agg_hit >= 23 C2 takes all of them.
- C3: alternative-key cache (aprx_embedding.cpp): maps an evicted key to a
  4-byte alt key (tableId + 100*rowId, tables 1-indexed,
  convert_altkeys_to_binary.py:50) pointing at its precomputed nearest
  neighbor; on a double miss the alt key re-probes C1 then C2
  (evlfu_8.cpp:474-490) and counts as a hit; eviction is FIFO or
  second-chance recency (aprx_embedding.cpp:360-388); insertions stream in
  from C1/C2 evictions in batches (aprx_embedding.hpp:30: batch 50).

Values are cached *encoded* (raw bytes at tier precision) and decoded to fp32
on hit, matching the reference's char-buffer storage + chars_buffer_to_floats
(evlfu_8.cpp:370-378).

Departure from the reference (documented): when C1 is full, agg<23, and an
odd-index double-miss is also a C3 hit, the reference still queues a wasted
file read whose result is discarded (evlfu_8.cpp:572-583 vs :637-648); we
skip the dead fetch — visible behavior is identical.
"""

from __future__ import annotations

from collections import OrderedDict
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from evstore_tpu.cache.policy import EvLFU, LFU, LRU
from evstore_tpu.cache.storage import StorageManager, encode_rows, _decode_rows
from evstore_tpu.config import CacheConfig

Key = Tuple[int, int]


def altkey_encode(table: int, row: int) -> int:
    """altKey = tableId + 100*rowId, tableId 1-based
    (convert_altkeys_to_binary.py:50, aprx_embedding.cpp:243-268)."""
    return (table + 1) + 100 * row


def altkey_decode(alt: int) -> Key:
    return (alt % 100 - 1, alt // 100)


class AltKeyCache:
    """C3: key -> (alt_key, recency_flag) with FIFO / second-chance eviction
    and batched insertion (aprx_embedding.cpp)."""

    def __init__(self, capacity: int, eviction: str = "recency",
                 io_batch: int = 50):
        self.cap = int(capacity)
        self.eviction = eviction
        self.io_batch = int(io_batch)
        self.od: OrderedDict = OrderedDict()  # key -> [alt_key, recency]
        self.pending: List[Key] = []
        self.n_hits = 0

    def __len__(self):
        return len(self.od)

    def get_altkey(self, key: Key) -> Optional[int]:
        ev = self.od.get(key)
        return None if ev is None else ev[0]

    def set_recency(self, key: Key):
        ev = self.od.get(key)
        if ev is not None:
            ev[1] = True

    def _evict_one(self):
        if self.eviction == "recency":
            # second chance: skip-and-clear recency-flagged entries
            while True:
                key, ev = self.od.popitem(last=False)
                if ev[1]:
                    ev[1] = False
                    self.od[key] = ev   # re-append (second chance)
                else:
                    return key
        key, _ = self.od.popitem(last=False)
        return key

    def insert(self, key: Key, alt_key: int):
        if key in self.od:
            self.od[key][0] = alt_key
            return
        if len(self.od) >= self.cap:
            self._evict_one()
        self.od[key] = [alt_key, False]

    def queue_keys(self, keys: Sequence[Key], resolver):
        """Batched insertion path: evicted C1/C2 keys queue up; every
        `io_batch` keys the resolver maps them to alt keys (the reference's
        threaded alt-key file reader, aprx_embedding.cpp:36-102) and they are
        inserted."""
        self.pending.extend(keys)
        while len(self.pending) >= self.io_batch:
            batch, self.pending = (self.pending[:self.io_batch],
                                   self.pending[self.io_batch:])
            for k, alt in zip(batch, resolver(batch)):
                if alt is not None:
                    self.insert(k, int(alt))

    def flush_pending(self, resolver):
        if self.pending:
            batch, self.pending = self.pending, []
            for k, alt in zip(batch, resolver(batch)):
                if alt is not None:
                    self.insert(k, int(alt))


class AltKeyResolver:
    """Maps keys to alt keys from per-table neighbor arrays (the offline kNN
    product, §3.5 of SURVEY.md) or from big-endian uint32 .bin files."""

    def __init__(self, neighbor_rows: Optional[Sequence[np.ndarray]] = None,
                 bin_dir: Optional[str] = None,
                 table_sizes: Optional[Sequence[int]] = None):
        if neighbor_rows is not None:
            self.tables = [np.asarray(t, np.int64) for t in neighbor_rows]
        else:
            import os
            self.tables = []
            for t, n in enumerate(table_sizes):
                raw = np.fromfile(
                    os.path.join(bin_dir, f"alt-keys-{t + 1}.bin"),
                    dtype=">u4")   # big-endian uint32 (convert_altkeys_to_binary.py)
                self.tables.append(raw.astype(np.int64))

    def __call__(self, keys: Sequence[Key]) -> List[Optional[int]]:
        out = []
        for t, r in keys:
            tab = self.tables[t]
            if r < len(tab):
                out.append(int(tab[r]))
            else:
                out.append(None)
        return out


class TieredCache:
    """The cache_manager-equivalent: 1, 2 or 3 tiers over a storage backend."""

    def __init__(self, cfg: CacheConfig, storage: StorageManager,
                 n_tables: int = 26, dim: int = 36,
                 altkey_resolver: Optional[AltKeyResolver] = None):
        self.cfg = cfg
        self.storage = storage
        self.n_tables = n_tables
        self.dim = dim
        c1_cap, c2_cap, c3_cap = cfg.tier_capacities()
        self.c1 = EvLFU(c1_cap, n_tables, cfg.flush_rate, cfg.perfect_item_cap)
        self.c2 = (EvLFU(c2_cap, n_tables, cfg.flush_rate, cfg.perfect_item_cap)
                   if cfg.n_caching_layers >= 2 else None)
        self.c3 = (AltKeyCache(c3_cap, cfg.c3_eviction, cfg.c3_io_batch)
                   if cfg.n_caching_layers >= 3 else None)
        self.altkey_resolver = altkey_resolver
        self.p1 = cfg.main_precision
        self.p2 = cfg.secondary_precision
        # counters (cache_manager.cpp:59,262-290)
        self.n_requests = 0
        self.n_perfect = 0
        self.c3_hits = 0
        self._rng = np.random.default_rng(0)

    # ------------------------------------------------------------- helpers

    def _enc(self, rows: np.ndarray, precision: int) -> List[np.ndarray]:
        raw = encode_rows(np.atleast_2d(rows), precision)
        return [raw[i] for i in range(raw.shape[0])]

    def _dec(self, raw: np.ndarray, precision: int) -> np.ndarray:
        return _decode_rows(raw[None] if raw.ndim == 1 else raw,
                            precision, self.dim)[0]

    def _fetch(self, keys: Sequence[Key]) -> np.ndarray:
        return self.storage.get_batch(keys)

    def _drain_to_c3(self, tier: EvLFU):
        if self.c3 is None or self.altkey_resolver is None:
            tier.drain_evicted()
            return
        evicted = tier.drain_evicted()
        if evicted:
            self.c3.queue_keys(evicted, self.altkey_resolver)

    # ---------------------------------------------------------- C1-only path

    def _request_c1(self, keys: List[Key]) -> Tuple[np.ndarray, List[bool], int]:
        """Single-tier EvLFU (EvLFU_C1.request_to_ev_lfu / evlfu_8
        request_to_ev_lfu:798-868), incl. the approximate-embedding
        short-circuit (EvLFU_C1.py:122-152)."""
        hits, agg = self.c1.probe_group(keys)
        thres = self.cfg.approx_emb_threshold
        if thres > 0 and agg >= thres:
            # approximate-embedding phase 2 (EvLFU_C1.py:122-152): misses are
            # served a stand-in value — the previous hit's row, or a random
            # row before any hit — counted as hits, and NOT inserted.
            out = np.empty((len(keys), self.dim), np.float32)
            stand_in = self._rng.uniform(-0.09, 0.09, self.dim).astype(np.float32)
            for i, (k, h) in enumerate(zip(keys, hits)):
                if h:
                    v = self.c1.update_agg_hit(k, agg)
                    if v is not None:
                        row = self._dec(v, self.p1)
                    else:
                        row = stand_in
                    stand_in = row
                    out[i] = row
                else:
                    out[i] = stand_in
            self.c1.n_requests += 1
            hits = [True] * len(keys)
            agg = len(keys)
            self.c1.n_perfect = len(self.c1.buckets[self.c1.n_tables])
            self.c1.n_perfect_hits += 1
            self._drain_to_c3(self.c1)
            return out, hits, agg
        miss_keys = [k for k, h in zip(keys, hits) if not h]
        missing = (self._enc(self._fetch(miss_keys), self.p1)
                   if miss_keys else [])
        vals = self.c1.finish_group(
            keys, hits, agg, missing,
            fetch_one=lambda k: self._enc(self._fetch([k]), self.p1)[0])
        out = _decode_rows(np.stack(vals), self.p1, self.dim)
        self._drain_to_c3(self.c1)
        return out, hits, agg

    # ------------------------------------------------------- C1+C2(+C3) path

    def _request_tiered(self, keys: List[Key]) -> Tuple[np.ndarray, List[bool], int]:
        """request_to_c1_c2 / request_to_c1_c2_c3 (evlfu_8.cpp:492-868)."""
        T = self.n_tables
        c2_hits, c2_agg = self.c2.probe_group(keys)
        c1_hits = [False] * T
        c3_vals: Dict[int, np.ndarray] = {}
        agg = c2_agg
        c2_update = [True] * T
        c2_insert = [False] * T
        c1_vals: Dict[int, np.ndarray] = {}

        self.c1.n_lookups += T
        self.c1.n_requests += 1
        for i, k in enumerate(keys):
            ev = self.c1.vals.get(k)
            if ev is not None:
                c1_hits[i] = True
                self.c1.n_hits += 1
                c1_vals[i] = ev[0]
                c2_update[i] = False
                if not c2_hits[i]:
                    agg += 1
            elif not c2_hits[i]:
                # double miss -> consult C3 (evlfu_8.cpp:531-556)
                alt = self.c3.get_altkey(k) if self.c3 is not None else None
                v = None
                if alt is not None:
                    ak = altkey_decode(alt)
                    aev = self.c1.vals.get(ak)
                    if aev is not None:
                        v = self._dec(aev[0], self.p1)
                    else:
                        aev2 = self.c2.vals.get(ak)
                        if aev2 is not None:
                            v = self._dec(aev2[0], self.p2)
                if v is not None:
                    self.c3.set_recency(k)
                    self.c3_hits += 1
                    agg += 1
                    c1_hits[i] = True         # piggyback (agg_hit=-1 marker)
                    c3_vals[i] = v
                    c2_insert[i] = False
                    c2_update[i] = False
                else:
                    c2_insert[i] = True
                    c2_update[i] = False

        c1_fetch_idx: List[int] = []
        c1_full = len(self.c1) >= self.c1.cap
        if c1_full:
            if agg < self.cfg.high_agghit_threshold:
                # split double-misses 50/50 by parity (evlfu_8.cpp:570-588)
                for i in range(T):
                    if not c2_hits[i] and not c1_hits[i]:
                        c2_update[i] = False
                        if i % 2 == 1:
                            c1_fetch_idx.append(i)
                            c2_insert[i] = False
            # agg >= threshold: C2 inserts all double-misses (c2_insert stands)
        else:
            # C1 not full: C1 takes every C1-miss; C2 stands down
            for i in range(T):
                if not c1_hits[i]:
                    c1_fetch_idx.append(i)
            c2_insert = [False] * T
            c2_update = [False] * T
            agg = sum(1 for i in range(T)
                      if c1_hits[i] and i not in c3_vals)

        out = np.zeros((T, self.dim), np.float32)

        # C2 phase 2 (evlfu_4 phase_2_get_and_insert_missing_values):
        # batched fetch of insert values, applied interleaved with updates in
        # table order — ordering affects bucket FIFO state and must match the
        # native engine (and the reference's single in-order loop)
        c2_ins_keys = [keys[i] for i in range(T) if c2_insert[i]]
        enc2 = self._enc(self._fetch(c2_ins_keys), self.p2) if c2_ins_keys else []
        j = 0
        for i in range(T):
            if c2_insert[i]:
                self.c2.set(keys[i], enc2[j], agg)
                out[i] = self._dec(enc2[j], self.p2)
                j += 1
            elif c2_update[i]:
                v = self.c2.update_agg_hit(keys[i], agg)
                if v is None:
                    v = self._enc(self._fetch([keys[i]]), self.p2)[0]
                    self.c2.set(keys[i], v, agg)
                out[i] = self._dec(v, self.p2)
        self._drain_to_c3(self.c2)

        # C1 fetch + merge (evlfu_8.cpp:623-652)
        if c1_fetch_idx:
            fetched = self._fetch([keys[i] for i in c1_fetch_idx])
            enc1 = self._enc(fetched, self.p1)
            for j, i in enumerate(c1_fetch_idx):
                self.c1.set(keys[i], enc1[j], agg)
                out[i] = self._dec(enc1[j], self.p1)
        for i in range(T):
            if c1_hits[i]:
                if i in c3_vals:
                    out[i] = c3_vals[i]   # C3 hit: no agg update
                else:
                    self.c1.update_agg_hit(keys[i], agg)
                    out[i] = self._dec(c1_vals[i], self.p1)
        self._drain_to_c3(self.c1)

        if agg == T:
            self.c1.n_perfect = len(self.c1.buckets[T])
        record_hit = [c1_hits[i] or c2_hits[i] for i in range(T)]
        return out, record_hit, agg

    # --------------------------------------------------------------- public

    def request(self, group_row_ids: Sequence[int]
                ) -> Tuple[np.ndarray, List[bool], int]:
        """One inference request: one row id per table.  Returns (rows
        [T, dim] fp32, per-table hit flags, agg_hit)."""
        keys = [(t, int(r)) for t, r in enumerate(group_row_ids)]
        self.n_requests += 1
        if self.c2 is None:
            rows, hits, agg = self._request_c1(keys)
        else:
            rows, hits, agg = self._request_tiered(keys)
        if agg == self.n_tables:
            self.n_perfect += 1
        return rows, hits, agg

    def request_batch(self, idx: np.ndarray) -> np.ndarray:
        """Batched requests: idx [B, T] -> [B, T, dim] fp32 rows."""
        B = idx.shape[0]
        out = np.empty((B, self.n_tables, self.dim), np.float32)
        for b in range(B):
            out[b], _, _ = self.request(idx[b])
        return out

    def stats(self) -> dict:
        s = {
            "requests": self.n_requests,
            "perfect_hits": self.n_perfect,
            "c1": self.c1.stats(),
        }
        if self.c2 is not None:
            s["c2"] = self.c2.stats()
        if self.c3 is not None:
            s["c3"] = {"size": len(self.c3), "hits": self.c3_hits}
        return s


def make_cache_from_policy(policy: str, capacity: int, n_tables: int,
                           storage: StorageManager, dim: int):
    """The reference's --cache-algo selection (dlrm_s_pytorch_C1.py:1295-1303)
    for the single-tier baselines: evlfu | lfu | lru."""
    if policy == "evlfu":
        cfg = CacheConfig(policy="evlfu", n_caching_layers=1,
                          total_size=capacity)
        return TieredCache(cfg, storage, n_tables, dim)
    if policy in ("lfu", "lru"):
        return SimpleCacheFrontend(
            LFU(capacity) if policy == "lfu" else LRU(capacity),
            storage, n_tables, dim)
    raise ValueError(f"unknown cache policy {policy!r}")


class SimpleCacheFrontend:
    """LFU/LRU baseline front-ends (cache_algo/LFU.py request_to_lfu:69,
    LRU.py request_to_lru:38): per-key get/set, no groupability."""

    def __init__(self, cache, storage: StorageManager, n_tables: int, dim: int):
        self.cache = cache
        self.storage = storage
        self.n_tables = n_tables
        self.dim = dim
        self.n_requests = 0
        self.n_perfect = 0

    def request(self, group_row_ids: Sequence[int]):
        keys = [(t, int(r)) for t, r in enumerate(group_row_ids)]
        out = np.empty((self.n_tables, self.dim), np.float32)
        hits = []
        for i, k in enumerate(keys):
            v = self.cache.get(k)
            if v is None:
                v = self.storage.get(k[0], k[1])
                self.cache.set(k, v)
                hits.append(False)
            else:
                hits.append(True)
            out[i] = v
        agg = sum(hits)
        self.n_requests += 1
        if agg == self.n_tables:
            self.n_perfect += 1
        return out, hits, agg

    def request_batch(self, idx: np.ndarray) -> np.ndarray:
        B = idx.shape[0]
        out = np.empty((B, self.n_tables, self.dim), np.float32)
        for b in range(B):
            out[b], _, _ = self.request(idx[b])
        return out

    def stats(self) -> dict:
        return {"requests": self.n_requests, "perfect_hits": self.n_perfect,
                "cache": self.cache.stats()}
