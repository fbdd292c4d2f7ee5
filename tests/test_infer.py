"""End-to-end tiered inference: the EVStore path must reproduce the plain
model's predictions when the cache is fp32, and stay close when quantized
(the reference validates the same way — AUC parity, experiments.md:537-548)."""

import dataclasses

import jax
import numpy as np
import pytest

from evstore_tpu.cache.storage import StorageManager
from evstore_tpu.config import CacheConfig, tiny_dlrm_config
from evstore_tpu.data.synthetic import RandomDataConfig, random_batches
from evstore_tpu.drivers.infer import run_inference
from evstore_tpu.models.dlrm import init_dlrm, predict
from evstore_tpu.train.train_loop import evaluate


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_dlrm_config()
    params = init_dlrm(jax.random.PRNGKey(0), cfg)
    tables = [np.asarray(params.sparse[f"table_{t}"]["kind_plain"])
              for t in range(cfg.num_tables)]
    dcfg = RandomDataConfig(num_dense=cfg.num_dense_features,
                            table_sizes=cfg.table_sizes, batch_size=16,
                            num_batches=12, seed=5, distribution="zipf")
    return cfg, params, tables, dcfg


def test_cached_inference_matches_plain_fp32(setup, tmp_path):
    cfg, params, tables, dcfg = setup
    sm = StorageManager("dummy", dim=cfg.embedding_dim).load(tables=tables)
    ccfg = CacheConfig(policy="evlfu", n_caching_layers=1, total_size=60,
                       main_precision=32)
    res = run_inference(params, cfg, ccfg, random_batches(dcfg), sm,
                        cdf_path=str(tmp_path / "cdf.csv"),
                        log_fn=lambda *_: None)
    # compare scores against the plain (uncached) forward
    plain = []
    labels = []
    for dense, idx, y in random_batches(dcfg):
        plain.append(np.asarray(predict(params, dense, idx, cfg)))
        labels.append(y)
    plain_m = evaluate(params, cfg, random_batches(dcfg))
    assert res.metrics.keys() == plain_m.keys()
    for k in res.metrics:
        if not np.isnan(res.metrics[k]):
            np.testing.assert_allclose(res.metrics[k], plain_m[k], atol=1e-5)
    # CDF file written
    lines = (tmp_path / "cdf.csv").read_text().splitlines()
    assert lines[0] == "# method=batch-time/B approximation"
    assert lines[1] == "latency_s,cdf" and len(lines) > 10
    assert res.cache_stats["requests"] == 12 * 16


@pytest.mark.parametrize("layers,prec", [(1, 8), (2, 8), (3, 8)])
def test_cached_inference_quantized_close(setup, layers, prec):
    cfg, params, tables, dcfg = setup
    from evstore_tpu.cache.tiers import AltKeyResolver, altkey_encode
    sm = StorageManager("dummy", dim=cfg.embedding_dim).load(tables=tables)
    ccfg = CacheConfig(policy="evlfu", n_caching_layers=layers, total_size=60,
                       main_precision=prec, secondary_precision=4,
                       size_proportion=(48, 48, 4))
    resolver = AltKeyResolver(
        neighbor_rows=[np.full(s, altkey_encode(t, 0))
                       for t, s in enumerate(cfg.table_sizes)])
    res = run_inference(params, cfg, ccfg, random_batches(dcfg), sm,
                        altkey_resolver=resolver, log_fn=lambda *_: None)
    plain_m = evaluate(params, cfg, random_batches(dcfg))
    # int8-cached embeddings shift predictions but metrics stay in range
    assert abs(res.metrics["accuracy"] - plain_m["accuracy"]) < 0.25


def test_warmup_raises_hit_rate(setup):
    cfg, params, tables, dcfg = setup
    sm = StorageManager("dummy", dim=cfg.embedding_dim).load(tables=tables)
    ccfg = CacheConfig(policy="evlfu", n_caching_layers=1, total_size=90)
    cold = run_inference(params, cfg, ccfg, random_batches(dcfg), sm,
                         ev_lookup_only=True, log_fn=lambda *_: None)
    warm = run_inference(params, cfg, ccfg, random_batches(dcfg), sm,
                         warmup_batches=random_batches(dcfg),
                         ev_lookup_only=True, log_fn=lambda *_: None)
    assert warm.cache_stats["c1"]["hit_rate"] > cold.cache_stats["c1"]["hit_rate"]
    assert warm.cache_stats["perfect_hits"] >= cold.cache_stats["perfect_hits"]


@pytest.mark.parametrize("policy", ["lfu", "lru"])
def test_policy_baselines(setup, policy):
    cfg, params, tables, dcfg = setup
    sm = StorageManager("dummy", dim=cfg.embedding_dim).load(tables=tables)
    ccfg = CacheConfig(policy=policy, n_caching_layers=1, total_size=60)
    res = run_inference(params, cfg, ccfg, random_batches(dcfg), sm,
                        ev_lookup_only=True, log_fn=lambda *_: None)
    assert res.requests == 12 * 16
    assert res.cache_stats["cache"]["hit_rate"] > 0


def test_workload_tracer(setup, tmp_path):
    cfg, params, tables, dcfg = setup
    sm = StorageManager("dummy", dim=cfg.embedding_dim).load(tables=tables)
    ccfg = CacheConfig(policy="evlfu", n_caching_layers=1, total_size=60)
    small = dataclasses.replace(dcfg, num_batches=2)
    run_inference(params, cfg, ccfg, random_batches(small), sm,
                  ev_lookup_only=True, trace_dir=str(tmp_path / "trace"),
                  log_fn=lambda *_: None)
    t1 = (tmp_path / "trace" / "trace-table-1.csv").read_text().splitlines()
    assert len(t1) == 2 * 16


@pytest.mark.parametrize("policy", ["lfu", "lru"])
def test_native_policy_baselines(setup, policy):
    """--cache-algo lfu/lru + native engine must reach NativeTieredCache
    (VERDICT r2 item 7: the driver short-circuited these to Python)."""
    pytest.importorskip("evstore_tpu.native")
    from evstore_tpu.drivers.infer import build_cache
    from evstore_tpu.native import NativeTieredCache
    cfg, params, tables, dcfg = setup
    sm = StorageManager("dummy", dim=cfg.embedding_dim).load(tables=tables)
    ccfg = CacheConfig(policy=policy, n_caching_layers=1, total_size=60)
    cache = build_cache(ccfg, cfg, sm, use_native=True)
    assert isinstance(cache, NativeTieredCache)
    res = run_inference(params, cfg, ccfg, random_batches(dcfg), sm,
                        use_native=True, ev_lookup_only=True,
                        log_fn=lambda *_: None)
    assert res.requests == 12 * 16
    assert res.cache_stats["c1"]["hit_rate"] > 0
    # rows must match the exact tables on hits (fp32 engine)
    res2 = run_inference(params, cfg, ccfg, random_batches(dcfg), sm,
                         use_native=True, log_fn=lambda *_: None)
    plain_m = evaluate(params, cfg, random_batches(dcfg))
    for k in res2.metrics:
        if not np.isnan(res2.metrics[k]):
            np.testing.assert_allclose(res2.metrics[k], plain_m[k], atol=1e-5)


def test_bs1_cdf_is_true_per_request(setup, tmp_path):
    """VERDICT r2 item 9: at bs=1 the driver times each request
    individually with a fenced transfer and the CDF artifact says so."""
    import dataclasses
    cfg, params, tables, dcfg = setup
    sm = StorageManager("dummy", dim=cfg.embedding_dim).load(tables=tables)
    ccfg = CacheConfig(policy="evlfu", n_caching_layers=1, total_size=60,
                       main_precision=32)
    d1 = dataclasses.replace(dcfg, batch_size=1, num_batches=20)
    res = run_inference(params, cfg, ccfg, random_batches(d1), sm,
                        cdf_path=str(tmp_path / "cdf1.csv"),
                        log_fn=lambda *_: None)
    lines = (tmp_path / "cdf1.csv").read_text().splitlines()
    assert lines[0] == "# method=true-per-request (bs=1, fenced transfer)"
    assert res.requests == 20
    # the plot tool must skip the comment line
    from evstore_tpu.tools.plot_cdf import read_cdf
    lats, qs = read_cdf(str(tmp_path / "cdf1.csv"))
    assert len(lats) > 0 and qs[-1] == 1.0
