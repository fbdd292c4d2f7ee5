"""Checkpoint/resume, EV-table export/import, training driver."""

import dataclasses

import jax
import numpy as np
import pytest

from evstore_tpu.config import TrainConfig, tiny_dlrm_config
from evstore_tpu.data.synthetic import RandomDataConfig, learnable_batches
from evstore_tpu.models.dlrm import DLRMParams, dlrm_forward, init_dlrm
from evstore_tpu.train.train_loop import init_opt_state
from evstore_tpu.utils.checkpoint import (export_ev_tables, latest_step,
                                          load_ev_tables_into_params,
                                          restore_checkpoint, save_checkpoint)


@pytest.fixture
def state():
    cfg = tiny_dlrm_config()
    tcfg = TrainConfig(optimizer="rwsadagrad")
    params = init_dlrm(jax.random.PRNGKey(0), cfg)
    return cfg, tcfg, params, init_opt_state(params, tcfg)


def test_checkpoint_roundtrip(state, tmp_path):
    cfg, tcfg, params, opt = state
    save_checkpoint(str(tmp_path), 42, params, opt, extra={"auc": 0.8})
    assert latest_step(str(tmp_path)) == 42
    p2 = init_dlrm(jax.random.PRNGKey(9), cfg)   # different init
    o2 = init_opt_state(p2, tcfg)
    p3, o3, extra = restore_checkpoint(str(tmp_path), 42, p2, o2)
    assert extra == {"auc": 0.8}
    for t in range(cfg.num_tables):
        np.testing.assert_array_equal(
            np.asarray(p3.sparse[f"table_{t}"]["kind_plain"]),
            np.asarray(params.sparse[f"table_{t}"]["kind_plain"]))
    np.testing.assert_array_equal(
        np.asarray(p3.dense["bot"]["layer_0"]["w"]),
        np.asarray(params.dense["bot"]["layer_0"]["w"]))
    assert int(o3.step) == int(opt.step)


def test_latest_step_empty(tmp_path):
    assert latest_step(str(tmp_path / "nope")) is None


def test_ev_export_import_roundtrip(state, tmp_path):
    cfg, _, params, _ = state
    export_ev_tables(params, str(tmp_path), precision=32, also_csv=True)
    assert (tmp_path / "ev-table-1.bin").exists()
    assert (tmp_path / "ev-table-1.csv").exists()
    # import into a fresh model: tables must match the exporter's exactly
    p2 = init_dlrm(jax.random.PRNGKey(7), cfg)
    p3 = load_ev_tables_into_params(p2, str(tmp_path))
    for t in range(cfg.num_tables):
        np.testing.assert_array_equal(
            np.asarray(p3.sparse[f"table_{t}"]["kind_plain"]),
            np.asarray(params.sparse[f"table_{t}"]["kind_plain"]))
    # dense params untouched
    np.testing.assert_array_equal(
        np.asarray(p3.dense["bot"]["layer_0"]["w"]),
        np.asarray(p2.dense["bot"]["layer_0"]["w"]))


def test_ev_export_feeds_storage_tier(state, tmp_path):
    """The exported tables ARE the storage tier's data (the offline pipeline
    SURVEY §3.5): a FileStore over the export must serve the model's rows."""
    cfg, _, params, _ = state
    export_ev_tables(params, str(tmp_path))
    from evstore_tpu.cache.storage import FileStore
    fs = FileStore(str(tmp_path), list(cfg.table_sizes), cfg.embedding_dim)
    row = fs.get(1, 3)
    np.testing.assert_allclose(
        row, np.asarray(params.sparse["table_1"]["kind_plain"])[3], rtol=1e-6)
    fs.close()


def test_run_training_driver(tmp_path):
    from evstore_tpu.drivers.train import run_training
    cfg = tiny_dlrm_config()
    dcfg = RandomDataConfig(num_dense=cfg.num_dense_features,
                            table_sizes=cfg.table_sizes, batch_size=32,
                            num_batches=40, seed=0)
    tcfg = TrainConfig(batch_size=32, optimizer="rwsadagrad",
                       learning_rate=0.2, print_freq=10, test_freq=20)
    test_d = dataclasses.replace(dcfg, num_batches=10, seed=99)
    res = run_training(cfg, tcfg,
                       make_train_batches=lambda: learnable_batches(dcfg),
                       make_test_batches=lambda: learnable_batches(test_d),
                       ckpt_dir=str(tmp_path / "ckpt"),
                       ev_export_dir=str(tmp_path / "ev"),
                       log_fn=lambda *_: None)
    assert res.steps == 40
    assert res.best_metric > 0
    assert latest_step(str(tmp_path / "ckpt")) is not None
    assert (tmp_path / "ev" / "ev-table-1.bin").exists()
    # resume skips completed steps
    res2 = run_training(cfg, tcfg,
                        make_train_batches=lambda: learnable_batches(dcfg),
                        ckpt_dir=str(tmp_path / "ckpt"), resume=True,
                        log_fn=lambda *_: None)
    assert res2.steps == 40


def test_mlperf_logger_format():
    from evstore_tpu.utils.logging import MLPerfLogger
    lines = []
    mll = MLPerfLogger(log_fn=lines.append)
    mll.event("run_start", {"epoch": 0})
    mll.submission_metadata()
    assert lines[0].startswith(":::MLLOG ")
    import json
    d = json.loads(lines[0][len(":::MLLOG "):])
    assert d["key"] == "run_start" and d["metadata"] == {"epoch": 0}
    assert d["event_type"] == "INTERVAL_START"
    # submission block: benchmark, org, division, status, platform, entry
    # (mlperf_logger.py:80-118)
    assert len(lines) == 7
    keys = [json.loads(l[len(":::MLLOG "):])["key"] for l in lines[1:]]
    assert "submission_org" in keys and "submission_platform" in keys
    # rank-gated silence
    mll2 = MLPerfLogger(log_fn=lines.append, rank=1)
    mll2.event("x")
    assert len(lines) == 7


def test_quantized_inference(state):
    """--quantize-embedding-with-bit / --quantize-mlp-with-bit equivalents:
    quantized models predict close to fp32 (the reference's accuracy-impact
    path)."""
    import jax.numpy as jnp
    from evstore_tpu.models.dlrm import predict
    from evstore_tpu.utils.checkpoint import quantize_embeddings, quantize_mlps
    cfg, _, params, _ = state
    rng = np.random.default_rng(0)
    dense = jnp.asarray(rng.random((16, cfg.num_dense_features)), jnp.float32)
    idx = jnp.asarray(rng.integers(0, 20, (16, cfg.num_tables)), jnp.int32)
    base = np.asarray(predict(params, dense, idx, cfg))
    for bits, tol in [(16, 0.01), (8, 0.05)]:
        qp = quantize_embeddings(params, bits)
        got = np.asarray(predict(qp, dense, idx, cfg))
        assert np.max(np.abs(got - base)) < tol, bits
    qm = quantize_mlps(params, 8)
    got = np.asarray(predict(qm, dense, idx, cfg))
    assert np.max(np.abs(got - base)) < 0.1
    # int8 table bytes really are the codec's (idempotent re-encode)
    from evstore_tpu.ops.quant import np_quantize_int8, np_dequantize_int8
    t0 = np.asarray(quantize_embeddings(params, 8
                                        ).sparse["table_0"]["kind_plain"])
    np.testing.assert_allclose(
        t0, np_dequantize_int8(np_quantize_int8(t0)), atol=1e-6)
