"""TCP embedding service + trace-driven synthetic data + visualize tools."""

import numpy as np
import pytest

from evstore_tpu.cache.service import (EmbeddingClient, EmbeddingServer,
                                       StorageAdapter)
from evstore_tpu.cache.storage import StorageManager
from evstore_tpu.cache.tiers import TieredCache
from evstore_tpu.config import CacheConfig

N_TABLES, DIM = 4, 8


@pytest.fixture
def storage(rng):
    tables = [rng.uniform(-0.9, 0.9, (50, DIM)).astype(np.float32)
              for _ in range(N_TABLES)]
    return StorageManager("dummy", dim=DIM).load(tables=tables), tables


def test_storage_server_roundtrip(storage):
    sm, tables = storage
    srv = EmbeddingServer(StorageAdapter(sm, N_TABLES), DIM).start()
    try:
        cli = EmbeddingClient("127.0.0.1", srv.port, N_TABLES, DIM)
        idx = np.array([[1, 2, 3, 4], [5, 6, 7, 8]])
        out = cli.request_batch(idx)
        for b in range(2):
            for t in range(N_TABLES):
                np.testing.assert_allclose(out[b, t], tables[t][idx[b, t]],
                                           rtol=1e-6)
        cli.close()
    finally:
        srv.stop()


def test_cache_server_accumulates_state(storage):
    sm, tables = storage
    tc = TieredCache(CacheConfig(policy="evlfu", total_size=40), sm,
                     N_TABLES, DIM)
    srv = EmbeddingServer(tc, DIM).start()
    try:
        cli = EmbeddingClient("127.0.0.1", srv.port, N_TABLES, DIM)
        idx = np.array([[1, 2, 3, 4]])
        cli.request_batch(idx)
        cli.request_batch(idx)
        assert tc.stats()["perfect_hits"] == 1
        # two concurrent clients share the cache (lock-serialized)
        cli2 = EmbeddingClient("127.0.0.1", srv.port, N_TABLES, DIM)
        cli2.request_batch(idx)
        assert tc.stats()["perfect_hits"] == 2
        cli.close(); cli2.close()
    finally:
        srv.stop()


def test_trace_profile_and_generate():
    from evstore_tpu.data.synthetic import trace_generate_lru, trace_profile
    trace = [1, 2, 1, 3, 1, 2, 4, 1]
    vals, cdf = trace_profile(trace)
    assert cdf[-1] == 1.0
    assert len(vals) == len(cdf)
    # generate a synthetic trace with strong reuse: distances mostly 0
    out = trace_generate_lru(np.arange(100),
                             np.array([0, 1000000]), np.array([0.9, 1.0]),
                             2000, seed=1)
    uniq, counts = np.unique(out, return_counts=True)
    # ~90% of accesses are top-of-stack reuses -> few distinct, long runs
    assert len(uniq) <= 100
    assert counts.max() > 2000 / 100  # far above uniform


def test_trace_batches_locality():
    from evstore_tpu.data.synthetic import RandomDataConfig, trace_batches
    cfg = RandomDataConfig(num_dense=4, table_sizes=(500, 500), batch_size=64,
                           num_batches=10, seed=0)
    seen = []
    for dense, idx, y in trace_batches(cfg):
        assert dense.shape == (64, 4) and idx.shape == (64, 2)
        seen.append(idx)
    idx_all = np.concatenate(seen)
    # reuse far above uniform: distinct values << total draws
    assert len(np.unique(idx_all[:, 0])) < 0.6 * len(idx_all)


def test_visualize_tools(rng):
    from evstore_tpu.tools.visualize import (analyze_model_outputs,
                                             categorical_counts, kmeans,
                                             pca_project, project_embeddings)
    rows = rng.normal(size=(100, 16)).astype(np.float32)
    p = pca_project(rows, 2)
    assert p.shape == (100, 2)
    p2 = project_embeddings(rows, method="pca")
    assert p2.shape == (100, 2)
    idx = rng.integers(0, 50, (1000, 2))
    stats = categorical_counts(idx, [50, 500])
    assert stats[0]["distinct_accessed"] <= 50
    assert stats[1]["coverage"] <= 0.2
    labels = kmeans(rows, 4)
    assert set(labels) <= set(range(4))
    m = analyze_model_outputs(rng.random(500), rng.integers(0, 2, 500))
    assert 0 <= m["ece"] <= 1 and len(m["bins"]) > 5


def test_export_stablehlo_roundtrip(tmp_path):
    import jax.numpy as jnp
    from evstore_tpu.config import tiny_dlrm_config
    from evstore_tpu.models.dlrm import init_dlrm, predict
    from evstore_tpu.tools.export_model import (export_stablehlo,
                                                load_exported,
                                                truncate_tables)
    import jax
    cfg = tiny_dlrm_config()
    params = init_dlrm(jax.random.PRNGKey(0), cfg)
    path = export_stablehlo(params, cfg, 4, str(tmp_path / "dlrm.shlo"))
    fn = load_exported(path)
    rng = np.random.default_rng(0)
    dense = jnp.asarray(rng.random((4, cfg.num_dense_features)), jnp.float32)
    idx = jnp.asarray(rng.integers(0, 20, (4, cfg.num_tables)), jnp.int32)
    got = np.asarray(fn(dense, idx))
    expect = np.asarray(predict(params, dense, idx, cfg))
    np.testing.assert_allclose(got, expect, rtol=1e-5)
    tp = truncate_tables(params, 10)
    assert tp.sparse["table_0"]["kind_plain"].shape[0] == 10


def test_memory_utils():
    from evstore_tpu.utils.memory import HBMBallast, device_memory, host_memory
    hm = host_memory()
    assert hm["MemTotal"] > 0
    device_memory()   # may be {} on CPU; must not raise
    b = HBMBallast(1)
    b.release()


def test_batched_mode_concurrent_clients():
    """mode="batched": N concurrent clients' requests are aggregated into
    single engine batches (one engine pass serves many connections) and
    every client still receives exactly its own rows."""
    import threading
    from evstore_tpu.cache.service import EmbeddingClient, EmbeddingServer
    from evstore_tpu.cache.storage import StorageManager

    rng = np.random.default_rng(0)
    sizes = [60, 40, 30]
    dim = 8
    tables = [np.asarray(rng.uniform(-1, 1, (s, dim)), np.float32)
              for s in sizes]
    sm = StorageManager("dummy", dim=dim).load(tables=tables)

    class Adapter:
        calls = 0

        def request_batch(self, idx):
            Adapter.calls += 1
            return np.stack([np.stack([tables[t][r] for t, r in
                                       enumerate(row)]) for row in idx])
    srv = EmbeddingServer(Adapter(), dim, mode="batched").start()
    errs = []

    def client(seed):
        try:
            c = EmbeddingClient("127.0.0.1", srv.port, len(sizes), dim)
            r = np.random.default_rng(seed)
            for _ in range(20):
                idx = np.stack([r.integers(0, s, 4) for s in sizes], axis=1)
                got = c.request_batch(idx)
                want = np.stack([np.stack([tables[t][row[t]]
                                           for t in range(len(sizes))])
                                 for row in idx])
                np.testing.assert_allclose(got, want, rtol=1e-6)
            c.sock.close()
        except Exception as e:   # pragma: no cover
            errs.append(e)

    threads = [threading.Thread(target=client, args=(s,)) for s in range(6)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    srv.stop()
    sm.close()
    assert not errs, errs
    # aggregation actually happened: fewer engine passes than requests
    assert Adapter.calls < 6 * 20
