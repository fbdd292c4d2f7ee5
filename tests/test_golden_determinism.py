"""Reproducibility contract: a fixed seeded workload must produce EXACT
policy counters, like the reference's 'Test Benchmark' whose expected
output (auc 0.8056, Perfect hit C1 = 30783) the user must reproduce
(experiments.md:537-548).  These golden numbers lock the EvLFU trajectory
(probe order, agg promotion, flush, min-bucket wrap) against regressions in
BOTH the Python tier stack and the native device-cache assigner."""

import shutil

import numpy as np
import pytest

from evstore_tpu.cache.storage import StorageManager
from evstore_tpu.cache.tiers import TieredCache
from evstore_tpu.config import CacheConfig
from evstore_tpu.data.synthetic import RandomDataConfig, random_batches

T, D = 8, 16
GOLDEN_PERFECT_HITS = 7
GOLDEN_HIT_RATE = 0.5623046875   # exact: 2879 hits / 5120 probes


def _tables():
    rng = np.random.default_rng(42)
    return [rng.uniform(-0.9, 0.9, (200, D)).astype(np.float32)
            for _ in range(T)]


def _stream():
    dcfg = RandomDataConfig(num_dense=1, table_sizes=[200] * T,
                            batch_size=32, num_batches=20, seed=7,
                            distribution="zipf", zipf_alpha=1.3)
    return [np.asarray(idx) for _, idx, _ in random_batches(dcfg)]


def test_golden_python_tiered():
    tables = _tables()
    sm = StorageManager("dummy", dim=D).load(tables=tables)
    cfg = CacheConfig(policy="evlfu", n_caching_layers=1, total_size=100,
                      main_precision=32)
    tc = TieredCache(cfg, sm, T, D)
    for idx in _stream():
        tc.request_batch(idx)
    s = tc.stats()
    assert s["perfect_hits"] == GOLDEN_PERFECT_HITS
    assert s["c1"]["hit_rate"] == GOLDEN_HIT_RATE


@pytest.mark.skipif(shutil.which("g++") is None, reason="no g++ toolchain")
def test_golden_native_device_cache():
    from evstore_tpu.cache.device_cache import NativeDeviceC1Cache
    cfg = CacheConfig(policy="evlfu", n_caching_layers=1, total_size=100,
                      main_precision=32)
    dc = NativeDeviceC1Cache(cfg, T, D, insert_bucket=64)
    dc.load_tables(_tables())
    for idx in _stream():
        dc.request_batch(idx)
    s = dc.stats()
    assert s["perfect_hits"] == GOLDEN_PERFECT_HITS
    assert s["hit_rate"] == GOLDEN_HIT_RATE
    dc.close()
