"""Tiered cache engine tests (mixed_precs_caching parity)."""

import dataclasses

import numpy as np
import pytest

from evstore_tpu.cache.storage import StorageManager
from evstore_tpu.cache.tiers import (AltKeyCache, AltKeyResolver, TieredCache,
                                     altkey_decode, altkey_encode)
from evstore_tpu.config import CacheConfig

N_TABLES, DIM = 4, 8


@pytest.fixture
def storage(rng):
    tables = [rng.uniform(-0.9, 0.9, (50, DIM)).astype(np.float32)
              for _ in range(N_TABLES)]
    return StorageManager("dummy", dim=DIM).load(tables=tables), tables


def _cfg(**kw):
    base = dict(policy="evlfu", n_caching_layers=1, total_size=40,
                main_precision=32, secondary_precision=8)
    base.update(kw)
    return CacheConfig(**base)


def test_altkey_codec():
    # altKey = tableId + 100*rowId, tableId 1-based (convert_altkeys_to_binary.py:50)
    assert altkey_encode(0, 7) == 701
    assert altkey_decode(701) == (0, 7)
    assert altkey_decode(altkey_encode(25, 12345)) == (25, 12345)


def test_c1_only_returns_exact_rows(storage):
    sm, tables = storage
    tc = TieredCache(_cfg(), sm, N_TABLES, DIM)
    rows, hits, agg = tc.request([1, 2, 3, 4])
    assert agg == 0 and hits == [False] * N_TABLES
    for t in range(N_TABLES):
        np.testing.assert_allclose(rows[t], tables[t][t + 1], rtol=1e-6)
    rows2, hits2, agg2 = tc.request([1, 2, 3, 4])
    assert agg2 == N_TABLES and all(hits2)
    np.testing.assert_array_equal(rows, rows2)
    assert tc.stats()["perfect_hits"] == 1


def test_c1_quantized_rows_deviate_boundedly(storage):
    sm, tables = storage
    tc = TieredCache(_cfg(main_precision=8), sm, N_TABLES, DIM)
    rows, _, _ = tc.request([0, 0, 0, 0])
    for t in range(N_TABLES):
        assert np.max(np.abs(rows[t] - tables[t][0])) < 0.01


def test_c1_c2_protocol_fills_c2_after_c1_full(storage):
    sm, tables = storage
    cfg = _cfg(n_caching_layers=2, total_size=8, size_proportion=(50, 50, 0),
               main_precision=32, secondary_precision=8)
    tc = TieredCache(cfg, sm, N_TABLES, DIM)
    assert tc.c1.cap == 4 and tc.c2.cap == 16  # x4 entries at 8-bit
    # fill C1 (not-full branch routes everything to C1)
    tc.request([0, 0, 0, 0])
    assert len(tc.c1) == 4 and len(tc.c2) == 0
    # C1 now full; next misses split between C1 (odd idx) and C2 (even idx)
    rows, hits, agg = tc.request([1, 1, 1, 1])
    assert len(tc.c2) > 0
    for t in range(N_TABLES):
        # C2-provided rows are 8-bit quantized; C1-provided are exact
        assert np.max(np.abs(rows[t] - tables[t][1])) < 0.01


def test_c1_c2_high_agghit_routes_all_to_c2(storage):
    sm, tables = storage
    cfg = _cfg(n_caching_layers=2, total_size=8, size_proportion=(50, 50, 0),
               high_agghit_threshold=0)  # always take the high-agg branch
    tc = TieredCache(cfg, sm, N_TABLES, DIM)
    tc.request([0, 0, 0, 0])   # fills C1
    tc.request([1, 1, 1, 1])   # all double-misses -> C2 only
    assert len(tc.c1) == 4     # C1 unchanged
    assert len(tc.c2) == 4


def test_c3_altkey_hit(storage):
    sm, tables = storage
    # alt key of every row points at row 0 of the same table
    resolver = AltKeyResolver(
        neighbor_rows=[np.full(50, altkey_encode(t, 0)) for t in range(N_TABLES)])
    cfg = _cfg(n_caching_layers=3, total_size=16,
               size_proportion=(25, 25, 50), c3_io_batch=1,
               high_agghit_threshold=0)
    tc = TieredCache(cfg, sm, N_TABLES, DIM, altkey_resolver=resolver)
    tc.request([0, 0, 0, 0])       # C1 fill (rows 0 cached in C1)
    # force evictions so keys flow into C3: request more distinct rows
    for r in range(1, 12):
        tc.request([r, r, r, r])
    # some key (t, r) is now in C3 with alt key -> (t, 0) which sits in C1
    assert len(tc.c3) > 0
    # find a C3-resident key and request it while missing from C1/C2
    key = next(iter(tc.c3.od))
    t, r = key
    before = tc.c3_hits
    if key not in tc.c1.vals and key not in tc.c2.vals:
        rows, hits, agg = tc.request([r] * N_TABLES)
        # if (t,0) is still cached, the alt-key probe must have hit
        if (t, 0) in tc.c1.vals or (t, 0) in tc.c2.vals:
            assert tc.c3_hits > before


def test_altkey_cache_recency_eviction():
    c = AltKeyCache(capacity=2, eviction="recency")
    c.insert((0, 1), 100)
    c.insert((0, 2), 200)
    c.set_recency((0, 1))          # second chance for (0,1)
    c.insert((0, 3), 300)          # evicts (0,2): (0,1) is recency-protected
    assert c.get_altkey((0, 1)) == 100
    assert c.get_altkey((0, 2)) is None
    assert c.get_altkey((0, 3)) == 300


def test_altkey_cache_fifo_eviction():
    c = AltKeyCache(capacity=2, eviction="fifo")
    c.insert((0, 1), 100)
    c.insert((0, 2), 200)
    c.set_recency((0, 1))
    c.insert((0, 3), 300)          # FIFO ignores recency -> evicts (0,1)
    assert c.get_altkey((0, 1)) is None


def test_approx_emb_threshold_short_circuit(storage):
    sm, tables = storage
    cfg = _cfg(approx_emb_threshold=2, total_size=40)
    tc = TieredCache(cfg, sm, N_TABLES, DIM)
    tc.request([5, 6, 7, 8])       # cold fill
    # 3 hits + 1 miss with threshold 2 -> phase-2 short-circuit: the miss is
    # served a stand-in, counted as a hit, and NOT inserted
    rows, hits, agg = tc.request([5, 6, 7, 9])
    assert agg == N_TABLES and all(hits)
    assert (3, 9) not in tc.c1.vals
    # miss row equals the previous hit's row (EvLFU_C1.py:137-152)
    np.testing.assert_array_equal(rows[3], rows[2])


def test_batched_request(storage):
    sm, tables = storage
    tc = TieredCache(_cfg(), sm, N_TABLES, DIM)
    idx = np.array([[1, 2, 3, 4], [1, 2, 3, 4], [9, 9, 9, 9]])
    out = tc.request_batch(idx)
    assert out.shape == (3, N_TABLES, DIM)
    np.testing.assert_array_equal(out[0], out[1])
    assert tc.stats()["requests"] == 3
    assert tc.stats()["perfect_hits"] == 1  # second row is a perfect hit
