"""Device-resident C1 HBM cache tests."""

import numpy as np
import pytest

from evstore_tpu.cache.device_cache import DeviceC1Cache
from evstore_tpu.cache.storage import StorageManager
from evstore_tpu.cache.tiers import TieredCache
from evstore_tpu.config import CacheConfig

N_TABLES, DIM = 4, 8


@pytest.fixture
def setup(rng):
    tables = [rng.uniform(-0.9, 0.9, (50, DIM)).astype(np.float32)
              for _ in range(N_TABLES)]
    sm = StorageManager("dummy", dim=DIM).load(tables=tables)
    return sm, tables


def test_device_cache_returns_exact_rows(setup):
    sm, tables = setup
    cfg = CacheConfig(policy="evlfu", total_size=40, main_precision=32)
    dc = DeviceC1Cache(cfg, sm, N_TABLES, DIM, insert_bucket=16)
    idx = np.array([[1, 2, 3, 4], [5, 6, 7, 8]])
    out = np.asarray(dc.lookup_batch(idx))
    for b in range(2):
        for t in range(N_TABLES):
            np.testing.assert_allclose(out[b, t], tables[t][idx[b, t]],
                                       rtol=1e-6)


def test_device_cache_hits_reuse_hbm_rows(setup):
    sm, tables = setup
    cfg = CacheConfig(policy="evlfu", total_size=40, main_precision=32)
    dc = DeviceC1Cache(cfg, sm, N_TABLES, DIM, insert_bucket=16)
    idx = np.array([[1, 2, 3, 4]])
    dc.lookup_batch(idx)
    shipped_before = dc.bytes_shipped
    out = np.asarray(dc.lookup_batch(idx))       # all hits
    # a perfect-hit batch ships only the padded empty insert bucket
    assert dc.bytes_shipped == shipped_before + 16 * DIM * 4
    assert dc.stats()["perfect_hits"] == 1
    for t in range(N_TABLES):
        np.testing.assert_allclose(out[0, t], tables[t][idx[0, t]], rtol=1e-6)


def test_device_cache_eviction_recycles_slots(setup):
    sm, tables = setup
    cfg = CacheConfig(policy="evlfu", total_size=8, main_precision=32,
                      perfect_item_cap=2.0)
    dc = DeviceC1Cache(cfg, sm, N_TABLES, DIM, insert_bucket=8)
    for r in range(6):   # 6 groups x 4 keys through an 8-slot cache
        out = np.asarray(dc.lookup_batch(np.array([[r, r, r, r]])))
        for t in range(N_TABLES):
            np.testing.assert_allclose(out[0, t], tables[t][r], rtol=1e-6)
    s = dc.stats()
    assert s["size"] <= 8
    # every live slot is unique and in range
    live = [v[0] for v in dc.policy.vals.values()]
    assert len(set(live)) == len(live)
    assert all(0 <= x < 8 for x in live)
    assert len(dc._free) == 8 - len(live)


def test_device_cache_int8_mode(setup):
    sm, tables = setup
    cfg = CacheConfig(policy="evlfu", total_size=40, main_precision=8)
    dc = DeviceC1Cache(cfg, sm, N_TABLES, DIM, insert_bucket=16)
    idx = np.array([[1, 2, 3, 4]])
    out = np.asarray(dc.lookup_batch(idx))
    for t in range(N_TABLES):
        assert np.max(np.abs(out[0, t] - tables[t][idx[0, t]])) < 0.01
    assert dc.stats()["hbm_bytes"] == 40 * DIM  # 1 byte/coeff


def test_device_cache_matches_tiered_policy_decisions(setup):
    """The device cache must drive the SAME EvLFU decisions as the host
    TieredCache (same hit/perfect counters on the same stream)."""
    sm, tables = setup
    rng = np.random.default_rng(3)
    stream = np.stack([rng.integers(0, 12, N_TABLES) for _ in range(200)])
    cfg = CacheConfig(policy="evlfu", total_size=24, main_precision=32)
    dc = DeviceC1Cache(cfg, sm, N_TABLES, DIM, insert_bucket=32)
    tc = TieredCache(cfg, sm, N_TABLES, DIM)
    out_d = np.asarray(dc.lookup_batch(stream))
    out_t = tc.request_batch(stream)
    np.testing.assert_allclose(out_d, out_t, rtol=1e-6)
    assert dc.stats()["perfect_hits"] == tc.stats()["perfect_hits"]
    assert dc.stats()["hit_rate"] == tc.stats()["c1"]["hit_rate"]
