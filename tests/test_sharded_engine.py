"""Table-partitioned parallel engine (evstore_core.cpp ShardedEngine).

The sequential engine stays the bit-exact Python-twin reference; the
sharded mode's documented deviations are per-shard capacity/eviction
pools.  With W=1 there is a single shard with the full capacity, so the
trajectory must match the sequential engine exactly."""

import shutil

import numpy as np
import pytest

from evstore_tpu.config import CacheConfig

pytestmark = pytest.mark.skipif(shutil.which("g++") is None, reason="no g++")


def _mk(seed=0, n_tables=8, dim=6, sizes=None):
    rng = np.random.default_rng(seed)
    sizes = sizes or [50 + 10 * t for t in range(n_tables)]
    tables = [np.asarray(rng.uniform(-1, 1, (s, dim)), np.float32)
              for s in sizes]
    return rng, sizes, tables


def _stream(rng, sizes, n, zipf=True):
    cols = []
    for s in sizes:
        if zipf:
            u = rng.random(n)
            r = np.clip(((s ** -0.05 - 1) * u + 1) ** (1 / -0.05) - 1,
                        0, s - 1).astype(np.int64)
        else:
            r = rng.integers(0, s, n)
        cols.append(r)
    return np.stack(cols, axis=1)


@pytest.mark.parametrize("layers", [1, 2])
def test_w1_matches_sequential(layers):
    from evstore_tpu.native import NativeShardedCache, NativeTieredCache
    rng, sizes, tables = _mk()
    cfg = CacheConfig(policy="evlfu", n_caching_layers=layers, total_size=60,
                      main_precision=8, secondary_precision=4,
                      size_proportion=(48, 48, 4))
    seq = NativeTieredCache(cfg, len(sizes), 6).borrow_tables(tables)
    sh = NativeShardedCache(cfg, len(sizes), 6, 1).borrow_tables(tables)
    idx = _stream(rng, sizes, 600)
    for lo in range(0, 600, 100):
        a = seq.request_batch(idx[lo:lo + 100])
        b = sh.request_batch(idx[lo:lo + 100])
        np.testing.assert_array_equal(a, b)
    sa, sb = seq.stats(), sh.stats()
    assert sa["perfect_hits"] == sb["perfect_hits"]
    assert abs(sa["c1"]["hit_rate"] - sb["c1"]["hit_rate"]) < 1e-12
    seq.close(); sh.close()


def test_w2_served_rows_exact_fp32():
    from evstore_tpu.native import NativeShardedCache
    rng, sizes, tables = _mk(seed=1)
    cfg = CacheConfig(policy="evlfu", n_caching_layers=2, total_size=80,
                      main_precision=32, secondary_precision=32,
                      size_proportion=(48, 48, 4))
    sh = NativeShardedCache(cfg, len(sizes), 6, 2).borrow_tables(tables)
    idx = _stream(rng, sizes, 400)
    for lo in range(0, 400, 50):
        rows = sh.request_batch(idx[lo:lo + 50])
        want = np.stack([tables[t][idx[lo:lo + 50, t]]
                         for t in range(len(sizes))], axis=1)
        np.testing.assert_array_equal(rows, want)
    sh.close()


def test_w2_hit_rate_close_to_sequential():
    from evstore_tpu.native import NativeShardedCache, NativeTieredCache
    rng, sizes, tables = _mk(seed=2, n_tables=10)
    cfg = CacheConfig(policy="evlfu", n_caching_layers=2, total_size=100,
                      main_precision=8, secondary_precision=4,
                      size_proportion=(48, 48, 4))
    seq = NativeTieredCache(cfg, len(sizes), 6).borrow_tables(tables)
    sh = NativeShardedCache(cfg, len(sizes), 6, 2).borrow_tables(tables)
    idx = _stream(rng, sizes, 3000)
    seq.request_batch(idx)
    sh.request_batch(idx)
    hr_seq = seq.stats()["c1"]["hit_rate"]
    hr_sh = sh.stats()["c1"]["hit_rate"]
    # per-shard pools change evictions slightly, not the regime
    assert abs(hr_seq - hr_sh) < 0.05, (hr_seq, hr_sh)
    seq.close(); sh.close()


def test_w2_quantized_rows_match_codec():
    from evstore_tpu.native import NativeShardedCache
    from evstore_tpu.ops.quant import np_dequantize_int8, np_quantize_int8
    rng, sizes, tables = _mk(seed=3, n_tables=4)
    cfg = CacheConfig(policy="evlfu", n_caching_layers=1, total_size=1000,
                      main_precision=8, size_proportion=(48, 48, 4))
    sh = NativeShardedCache(cfg, len(sizes), 6, 2).borrow_tables(tables)
    idx = _stream(rng, sizes, 50, zipf=False)
    rows = sh.request_batch(idx)
    want = np.stack([np_dequantize_int8(np_quantize_int8(tables[t][idx[:, t]]))
                     for t in range(len(sizes))], axis=1)
    np.testing.assert_allclose(rows, want, atol=1e-6)
    sh.close()


def test_shard_rejects_c3():
    from evstore_tpu.native import NativeShardedCache
    cfg = CacheConfig(policy="evlfu", n_caching_layers=3, total_size=100)
    with pytest.raises(ValueError):
        NativeShardedCache(cfg, 4, 6, 2)
