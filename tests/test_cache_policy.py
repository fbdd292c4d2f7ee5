"""EvLFU/LFU/LRU policy semantics (behavioral parity with
cache_algo/EvLFU_C1.py, LFU.py, LRU.py)."""

import numpy as np

from evstore_tpu.cache.policy import EvLFU, LFU, LRU


def _group(t0_rows, n_tables=4):
    """Build group keys for a 4-table toy: one row per table."""
    return [(t, r) for t, r in enumerate(t0_rows)]


def _run_group(c: EvLFU, rows, values=None):
    keys = _group(rows, c.n_tables)
    hits, agg = c.probe_group(keys)
    miss = [k for k, h in zip(keys, hits) if not h]
    if values is None:
        values = [np.full(4, float(k[0] * 100 + k[1])) for k in miss]
    out = c.finish_group(keys, hits, agg, values,
                         fetch_one=lambda k: np.full(4, -1.0))
    return hits, agg, out


def test_evlfu_insert_and_hit():
    c = EvLFU(capacity=100, n_tables=4)
    hits, agg, _ = _run_group(c, [1, 2, 3, 4])
    assert hits == [False] * 4 and agg == 0
    hits, agg, out = _run_group(c, [1, 2, 3, 4])
    assert hits == [True] * 4 and agg == 4
    # values round-trip
    np.testing.assert_array_equal(out[0], np.full(4, 1.0))
    assert c.stats()["perfect_hits"] == 1


def test_evlfu_agg_promotion():
    c = EvLFU(capacity=100, n_tables=4)
    _run_group(c, [1, 2, 3, 4])           # all inserted at agg 0
    assert all(k in c.buckets[0] for k in _group([1, 2, 3, 4]))
    _run_group(c, [1, 2, 3, 4])           # all hit, agg 4 -> promoted
    assert all(k in c.buckets[4] for k in _group([1, 2, 3, 4]))
    assert not c.buckets[0]
    # promotion is monotone: a later lower-agg hit does not demote
    _run_group(c, [1, 2, 9, 9])           # keys (0,1),(1,2) hit with agg 2
    assert (0, 1) in c.buckets[4]


def test_evlfu_min_bucket_eviction():
    """Reference semantics: a full cache evicts FIFO from the lowest
    non-empty bucket; new agg-0 inserts land in bucket 0 and churn each
    other, so of a 4-miss group only the last key survives while the
    promoted (perfect) keys are mostly protected (EvLFU_C1.py:47-63)."""
    c = EvLFU(capacity=4, n_tables=4, perfect_item_cap=2.0)  # flush disabled
    _run_group(c, [1, 2, 3, 4])           # fills cache at agg 0
    _run_group(c, [1, 2, 3, 4])           # promote all to bucket 4
    _run_group(c, [5, 6, 7, 8])           # agg 0: each insert evicts min
    assert len(c) == 4
    # first insert advanced min past empty 0..3 and evicted the oldest
    # perfect key (0,1); each later agg-0 insert evicted the previous one
    assert (0, 1) not in c
    assert all(k in c for k in [(1, 2), (2, 3), (3, 4)])
    survivors = [k for k in _group([5, 6, 7, 8]) if k in c]
    assert survivors == [(3, 8)]          # only the last miss survives


def test_evlfu_perfect_flush():
    """When >=95% of capacity sits in the perfect bucket, an insert flushes
    30% of capacity from it (EvLFU_C1.py:36-44)."""
    cap = 20
    c = EvLFU(capacity=cap, n_tables=4, flush_rate=0.3, perfect_item_cap=0.95)
    # drive 5 distinct groups to perfect (insert, then re-hit)
    for base in range(0, 20, 4):
        _run_group(c, [base, base + 1, base + 2, base + 3])
    for base in range(0, 20, 4):
        _run_group(c, [base, base + 1, base + 2, base + 3])
    assert len(c.buckets[4]) == 20 >= int(cap * 0.95)
    assert c.n_perfect == 20
    # next insert triggers the flush of int(0.3*20)+1 = 7 perfect items
    _run_group(c, [100, 101, 102, 103])
    assert len(c.buckets[4]) == 20 - 7
    assert len(c.drain_evicted()) == 7


def test_evlfu_min_wraps_not_to_zero():
    """After the min pointer passes 26 it wraps to 1, not 0
    (EvLFU_C1.py:52-54)."""
    c = EvLFU(capacity=2, n_tables=2)
    keys = [(0, 1), (1, 1)]
    hits, agg = c.probe_group(keys)
    c.finish_group(keys, hits, agg, [np.zeros(2), np.zeros(2)])
    # promote to bucket 2 (perfect for n_tables=2)
    hits, agg = c.probe_group(keys)
    c.finish_group(keys, hits, agg, [])
    c.min_agg = 0
    # force eviction: inserting with full cache scans 0,1,2 -> finds bucket 2
    c.set((0, 9), np.zeros(2), 1)
    assert len(c) == 2


def test_lfu_eviction_order():
    c = LFU(capacity=2)
    c.set("a", 1)
    c.set("b", 2)
    assert c.get("a") == 1      # a freq 2
    c.set("c", 3)               # evicts b (freq 1)
    assert c.get("b") is None
    assert c.get("a") == 1 and c.get("c") == 3
    assert c.evicted == ["b"]


def test_lru_eviction_order():
    c = LRU(capacity=2)
    c.set("a", 1)
    c.set("b", 2)
    c.get("a")                  # a most recent
    c.set("c", 3)               # evicts b
    assert c.get("b") is None
    assert c.get("a") == 1
    assert c.evicted == ["b"]


def test_evlfu_hit_rate_tracking():
    c = EvLFU(capacity=100, n_tables=4)
    _run_group(c, [1, 2, 3, 4])
    _run_group(c, [1, 2, 3, 4])
    s = c.stats()
    assert s["hit_rate"] == 0.5
    assert s["requests"] == 2
