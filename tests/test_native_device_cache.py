"""Native-assigner device cache: parity with the Python DeviceC1Cache."""

import shutil

import numpy as np
import pytest

from evstore_tpu.cache.device_cache import DeviceC1Cache, NativeDeviceC1Cache
from evstore_tpu.cache.storage import StorageManager
from evstore_tpu.config import CacheConfig

pytestmark = pytest.mark.skipif(shutil.which("g++") is None,
                                reason="no g++ toolchain")

N_TABLES, DIM = 4, 8


@pytest.fixture
def setup(rng):
    tables = [rng.uniform(-0.9, 0.9, (50, DIM)).astype(np.float32)
              for _ in range(N_TABLES)]
    sm = StorageManager("dummy", dim=DIM).load(tables=tables)
    return sm, tables


def test_native_device_cache_exact_rows(setup):
    sm, tables = setup
    cfg = CacheConfig(policy="evlfu", total_size=40, main_precision=32)
    dc = NativeDeviceC1Cache(cfg, N_TABLES, DIM,
                             insert_bucket=16).load_tables(tables)
    idx = np.array([[1, 2, 3, 4], [5, 6, 7, 8], [1, 2, 3, 4]])
    out = dc.request_batch(idx)
    for b in range(3):
        for t in range(N_TABLES):
            np.testing.assert_allclose(out[b, t], tables[t][idx[b, t]],
                                       rtol=1e-6)
    s = dc.stats()
    assert s["requests"] == 3
    dc.close()


def test_native_device_cache_matches_python(setup, rng):
    """Same stream -> same rows + same policy counters as the Python
    DeviceC1Cache and hence the host TieredCache."""
    sm, tables = setup
    cfg = CacheConfig(policy="evlfu", total_size=24, main_precision=32)
    py = DeviceC1Cache(cfg, sm, N_TABLES, DIM, insert_bucket=32)
    nc = NativeDeviceC1Cache(cfg, N_TABLES, DIM,
                             insert_bucket=32).load_tables(tables)
    stream = np.stack([rng.integers(0, 12, N_TABLES) for _ in range(200)])
    # feed in chunks to exercise cross-batch state
    outs_p, outs_n = [], []
    for s in range(0, 200, 40):
        outs_p.append(py.lookup_batch(stream[s:s + 40]))
        outs_n.append(nc.request_batch(stream[s:s + 40]))
    np.testing.assert_allclose(np.concatenate(outs_n),
                               np.concatenate(outs_p), rtol=1e-6)
    sp, sn = py.stats(), nc.stats()
    assert sn["requests"] == sp["requests"]
    assert sn["perfect_hits"] == sp["perfect_hits"]
    assert sn["hit_rate"] == pytest.approx(sp["hit_rate"])
    assert sn["size"] == sp["size"]
    nc.close()


def test_native_device_cache_int8(setup):
    sm, tables = setup
    cfg = CacheConfig(policy="evlfu", total_size=40, main_precision=8)
    dc = NativeDeviceC1Cache(cfg, N_TABLES, DIM,
                             insert_bucket=16).load_tables(tables)
    out = dc.request_batch(np.array([[1, 2, 3, 4]]))
    for t in range(N_TABLES):
        assert np.max(np.abs(out[0, t] - tables[t][t + 1])) < 0.01
    dc.close()


def test_native_device_cache_file_backed(setup, tmp_path):
    from evstore_tpu.cache.storage import write_ev_tables_binary
    sm, tables = setup
    write_ev_tables_binary(tables, str(tmp_path), 32)
    cfg = CacheConfig(policy="evlfu", total_size=40, main_precision=32)
    dc = NativeDeviceC1Cache(cfg, N_TABLES, DIM, insert_bucket=16,
                             n_reader_threads=3)
    dc.open_table_files(str(tmp_path), [50] * N_TABLES)
    out = dc.request_batch(np.array([[9, 9, 9, 9]]))
    for t in range(N_TABLES):
        np.testing.assert_allclose(out[0, t], tables[t][9], rtol=1e-6)
    dc.close()


def test_native_device_cache_throughput(setup, rng):
    import time
    sm, tables = setup
    cfg = CacheConfig(policy="evlfu", total_size=40, main_precision=32)
    py = DeviceC1Cache(cfg, sm, N_TABLES, DIM, insert_bucket=64)
    nc = NativeDeviceC1Cache(cfg, N_TABLES, DIM,
                             insert_bucket=64).load_tables(tables)
    stream = np.stack([rng.integers(0, 20, N_TABLES) for _ in range(2000)])
    py.lookup_batch(stream[:10]); nc.request_batch(stream[:10])  # warm jit
    t0 = time.perf_counter(); py.lookup_batch(stream); t_py = time.perf_counter() - t0
    t0 = time.perf_counter(); nc.request_batch(stream); t_nc = time.perf_counter() - t0
    assert t_nc < t_py, (t_nc, t_py)
    nc.close()


def test_sharded_device_cache_matches_single_chip(setup, rng):
    """Cache slots sharded over an 8-device mesh must produce exactly the
    rows and policy counters of the single-chip native device cache (the
    policy is the same host trajectory; only HBM residency is distributed)."""
    from evstore_tpu.cache.device_cache import ShardedDeviceC1Cache
    from evstore_tpu.parallel.mesh import make_mesh

    sm, tables = setup
    cfg = CacheConfig(policy="evlfu", total_size=24, main_precision=32)
    single = NativeDeviceC1Cache(cfg, N_TABLES, DIM,
                                 insert_bucket=32).load_tables(tables)
    mesh = make_mesh(1, 8)
    shard = ShardedDeviceC1Cache(cfg, N_TABLES, DIM, mesh, axis="model",
                                 insert_bucket=32).load_tables(tables)
    stream = np.stack([rng.integers(0, 30, N_TABLES) for _ in range(300)])
    for lo in range(0, 300, 50):
        a = single.request_batch(stream[lo:lo + 50])
        b = shard.request_batch(stream[lo:lo + 50])
        np.testing.assert_allclose(b, a, rtol=1e-6, atol=1e-7)
    sa, sb = single.stats(), shard.stats()
    for k in ("requests", "perfect_hits", "hits", "misses"):
        if k in sa and k in sb:
            assert sa[k] == sb[k], k
    # per-chip HBM is 1/8 of the single-chip footprint
    assert sb["hbm_bytes_per_chip"] * 8 == sa["hbm_bytes"]
    single.close(); shard.close()


def test_sharded_device_cache_int8(setup, rng):
    """int8 sharded rows dequantize identically to the single-chip int8."""
    from evstore_tpu.cache.device_cache import ShardedDeviceC1Cache
    from evstore_tpu.parallel.mesh import make_mesh

    sm, tables = setup
    cfg = CacheConfig(policy="evlfu", total_size=16, main_precision=8)
    single = NativeDeviceC1Cache(cfg, N_TABLES, DIM,
                                 insert_bucket=16).load_tables(tables)
    mesh = make_mesh(1, 8)
    shard = ShardedDeviceC1Cache(cfg, N_TABLES, DIM, mesh, axis="model",
                                 insert_bucket=16).load_tables(tables)
    stream = np.stack([rng.integers(0, 20, N_TABLES) for _ in range(120)])
    a = single.request_batch(stream)
    b = shard.request_batch(stream)
    np.testing.assert_allclose(b, a, rtol=1e-5, atol=1e-6)
    single.close(); shard.close()


def _np_dequant8(x):
    v = np.round(((x + 1.0) / 2.0) * 254.0).clip(0, 254)
    return (v / 254.0) * 2.0 - 1.0


def test_hybrid_device_c1_host_c2_exact_fp32(setup, rng):
    """Hybrid stack: device C1 (HBM) + host C2 (DRAM).  With C2 at fp32 every
    served row is exact, and across small batches C2 takes real hits (misses
    served from DRAM without storage IO)."""
    sm, tables = setup
    cfg = CacheConfig(policy="evlfu", n_caching_layers=2, total_size=24,
                      main_precision=32, secondary_precision=32,
                      size_proportion=(48, 48, 4), high_agghit_threshold=4)
    dc = NativeDeviceC1Cache(cfg, N_TABLES, DIM,
                             insert_bucket=16).load_tables(tables)
    assert dc.capacity == 12                       # C1 share of the budget
    stream = np.stack([rng.integers(0, 8, N_TABLES) for _ in range(800)])
    outs = [dc.request_batch(stream[i:i + 8]) for i in range(0, 800, 8)]
    out = np.concatenate(outs)
    for b in range(800):
        for t in range(N_TABLES):
            np.testing.assert_allclose(out[b, t], tables[t][stream[b, t]],
                                       rtol=1e-6)
    s = dc.stats()
    assert s["c2"]["hit_rate"] > 0.1               # C2 is live
    assert s["c2"]["size"] <= 12                   # bounded by its capacity
    dc.close()


def test_hybrid_c2_secondary_precision_int8(setup, rng):
    """With C2 at int8, every row is either exact (C1/storage) or the int8
    round-trip of the exact row (C2-served)."""
    sm, tables = setup
    cfg = CacheConfig(policy="evlfu", n_caching_layers=2, total_size=24,
                      main_precision=32, secondary_precision=8,
                      size_proportion=(48, 48, 4), high_agghit_threshold=4)
    dc = NativeDeviceC1Cache(cfg, N_TABLES, DIM,
                             insert_bucket=16).load_tables(tables)
    stream = np.stack([rng.integers(0, 8, N_TABLES) for _ in range(600)])
    outs = [dc.request_batch(stream[i:i + 6]) for i in range(0, 600, 6)]
    out = np.concatenate(outs)
    n_c2_served = 0
    for b in range(600):
        for t in range(N_TABLES):
            exact = tables[t][stream[b, t]]
            q8 = _np_dequant8(exact)
            d_exact = np.abs(out[b, t] - exact).max()
            d_q8 = np.abs(out[b, t] - q8).max()
            assert min(d_exact, d_q8) < 1e-5, (b, t, d_exact, d_q8)
            if d_q8 < d_exact:
                n_c2_served += 1
    assert n_c2_served > 0                         # int8 path actually served
    assert dc.stats()["c2"]["hit_rate"] > 0.05
    dc.close()


def test_hybrid_c3_altkey_approximate_serving(setup, rng):
    """C1+C2+C3: a double-missed key whose alt-key row is C1-resident is
    served the ALT row (approximate embedding) with no storage IO, counted
    in c3 hits (evlfu_8.cpp find_approximate_ev:474-490)."""
    sm, tables = setup
    cfg = CacheConfig(policy="evlfu", n_caching_layers=3, total_size=24,
                      main_precision=32, secondary_precision=32,
                      size_proportion=(40, 40, 20), high_agghit_threshold=4,
                      c3_io_batch=1)
    dc = NativeDeviceC1Cache(cfg, N_TABLES, DIM,
                             insert_bucket=16).load_tables(tables)
    # every row's alt-key points at row 0 of its own table
    dc.load_altkeys([np.asarray([t + 100 * 0] * 50, np.uint32)
                     for t in range(N_TABLES)])
    # churn so keys cycle through C1/C2 and drain into C3 with their altkeys
    stream = np.stack([rng.integers(0, 20, N_TABLES) for _ in range(600)])
    for i in range(0, 600, 6):
        dc.request_batch(stream[i:i + 6])
    # pin row 0 of every table hot (the alt target), then request keys that
    # must double-miss; any C3-served position returns row 0's value
    hot = np.zeros((8, N_TABLES), np.int64)
    dc.request_batch(hot)
    s = dc.stats()
    assert s.get("c3", {}).get("size", 0) > 0      # C3 was populated
    probe = np.stack([rng.integers(25, 50, N_TABLES) for _ in range(40)])
    out = dc.request_batch(probe)
    n_c3 = 0
    for b in range(40):
        for t in range(N_TABLES):
            exact = tables[t][probe[b, t]]
            alt = tables[t][0]
            if np.abs(out[b, t] - alt).max() < 1e-6 \
               and np.abs(exact - alt).max() > 1e-4:
                n_c3 += 1
    s2 = dc.stats()
    assert s2["c3"]["hits"] >= n_c3
    dc.close()


def test_pipelined_lookup_matches_sequential(setup, rng):
    """lookup_batches_pipelined overlaps the assigner with the device
    apply but must keep the exact sequential policy trajectory."""
    from evstore_tpu.cache.device_cache import NativeDeviceC1Cache

    sm, tables = setup
    cfg = CacheConfig(policy="evlfu", total_size=24, main_precision=32)
    a = NativeDeviceC1Cache(cfg, N_TABLES, DIM,
                            insert_bucket=32).load_tables(tables)
    b = NativeDeviceC1Cache(cfg, N_TABLES, DIM,
                            insert_bucket=32).load_tables(tables)
    batches = [np.stack([rng.integers(0, 30, N_TABLES) for _ in range(40)])
               for _ in range(6)]
    seq = [a.lookup_batch(x, as_numpy=True) for x in batches]
    pipe = list(b.lookup_batches_pipelined(batches, as_numpy=True))
    for x, y in zip(seq, pipe):
        np.testing.assert_array_equal(x, y)
    sa, sb = a.stats(), b.stats()
    for k in ("requests", "perfect_hits"):
        if k in sa:
            assert sa[k] == sb[k]
    a.close(); b.close()
