"""Inference through the device (HBM) cache path of the driver."""

import shutil

import jax
import numpy as np
import pytest

from evstore_tpu.cache.storage import StorageManager
from evstore_tpu.config import CacheConfig, tiny_dlrm_config
from evstore_tpu.data.synthetic import RandomDataConfig, random_batches
from evstore_tpu.drivers.infer import run_inference
from evstore_tpu.models.dlrm import init_dlrm
from evstore_tpu.train.train_loop import evaluate

pytestmark = pytest.mark.skipif(shutil.which("g++") is None,
                                reason="no g++ toolchain")


def test_device_cache_inference_matches_plain():
    cfg = tiny_dlrm_config()
    params = init_dlrm(jax.random.PRNGKey(0), cfg)
    tables = [np.asarray(params.sparse[f"table_{t}"]["kind_plain"])
              for t in range(cfg.num_tables)]
    sm = StorageManager("dummy", dim=cfg.embedding_dim).load(tables=tables)
    dcfg = RandomDataConfig(num_dense=cfg.num_dense_features,
                            table_sizes=cfg.table_sizes, batch_size=16,
                            num_batches=10, seed=5, distribution="zipf")
    ccfg = CacheConfig(policy="evlfu", n_caching_layers=1, total_size=60,
                       main_precision=32)
    res = run_inference(params, cfg, ccfg, random_batches(dcfg), sm,
                        use_device_cache=True, log_fn=lambda *_: None)
    plain = evaluate(params, cfg, random_batches(dcfg))
    for k in res.metrics:
        if not np.isnan(res.metrics[k]):
            np.testing.assert_allclose(res.metrics[k], plain[k], atol=1e-5)
    assert res.cache_stats["requests"] == 160
    assert res.cache_stats["hbm_bytes"] == 60 * cfg.embedding_dim * 4


def test_cli_device_cache_inference(capsys):
    from evstore_tpu.cli import main
    rc = main(("--inference-only --use-evstore True --use-device-cache True "
               "--arch-sparse-feature-size 4 --arch-embedding-size 40-30 "
               "--arch-mlp-bot 4-8-4 --arch-mlp-top 8-1 "
               "--mini-batch-size 8 --nbatches-test 6 "
               "--data-generation synthetic "
               "--cache-algo evlfu --emb-cache-size 50").split())
    assert rc == 0
    assert "inference done" in capsys.readouterr().out


def test_pipelined_inference_matches_sequential():
    """pipeline_depth>0 must produce identical metrics and cache state."""
    cfg = tiny_dlrm_config()
    params = init_dlrm(jax.random.PRNGKey(0), cfg)
    tables = [np.asarray(params.sparse[f"table_{t}"]["kind_plain"])
              for t in range(cfg.num_tables)]
    dcfg = RandomDataConfig(num_dense=cfg.num_dense_features,
                            table_sizes=cfg.table_sizes, batch_size=16,
                            num_batches=12, seed=5, distribution="zipf")
    ccfg = CacheConfig(policy="evlfu", n_caching_layers=1, total_size=60,
                       main_precision=32)
    sm1 = StorageManager("dummy", dim=cfg.embedding_dim).load(tables=tables)
    r_seq = run_inference(params, cfg, ccfg, random_batches(dcfg), sm1,
                          use_device_cache=True, log_fn=lambda *_: None)
    sm2 = StorageManager("dummy", dim=cfg.embedding_dim).load(tables=tables)
    r_pipe = run_inference(params, cfg, ccfg, random_batches(dcfg), sm2,
                           use_device_cache=True, pipeline_depth=2,
                           log_fn=lambda *_: None)
    for k in r_seq.metrics:
        if not np.isnan(r_seq.metrics[k]):
            np.testing.assert_allclose(r_pipe.metrics[k], r_seq.metrics[k],
                                       atol=1e-6)
    assert r_pipe.cache_stats["perfect_hits"] == \
        r_seq.cache_stats["perfect_hits"]


def test_sharded_device_cache_inference_matches_plain():
    """run_inference with a mesh shards the HBM slot array over 8 virtual
    devices; metrics must match the plain full-table forward."""
    from evstore_tpu.parallel.mesh import make_mesh

    cfg = tiny_dlrm_config()
    params = init_dlrm(jax.random.PRNGKey(0), cfg)
    tables = [np.asarray(params.sparse[f"table_{t}"]["kind_plain"])
              for t in range(cfg.num_tables)]
    sm = StorageManager("dummy", dim=cfg.embedding_dim).load(tables=tables)
    dcfg = RandomDataConfig(num_dense=cfg.num_dense_features,
                            table_sizes=cfg.table_sizes, batch_size=16,
                            num_batches=10, seed=5, distribution="zipf")
    ccfg = CacheConfig(policy="evlfu", n_caching_layers=1, total_size=64,
                       main_precision=32)
    res = run_inference(params, cfg, ccfg, random_batches(dcfg), sm,
                        use_device_cache=True, mesh=make_mesh(1, 8),
                        log_fn=lambda *_: None)
    plain = evaluate(params, cfg, random_batches(dcfg))
    for k in res.metrics:
        if not np.isnan(res.metrics[k]):
            np.testing.assert_allclose(res.metrics[k], plain[k], atol=1e-5)
    assert res.cache_stats["hbm_bytes_per_chip"] == 64 // 8 * cfg.embedding_dim * 4
