import dataclasses

import jax
import numpy as np
import pytest

from evstore_tpu.config import TrainConfig, tiny_dlrm_config
from evstore_tpu.data.synthetic import (RandomDataConfig, learnable_batches,
                                        random_batches)
from evstore_tpu.models.dlrm import init_dlrm
from evstore_tpu.train.train_loop import evaluate, train


def _data_cfg(n=60, bs=64, seed=0, dist="uniform"):
    cfg = tiny_dlrm_config()
    return cfg, RandomDataConfig(num_dense=cfg.num_dense_features,
                                 table_sizes=cfg.table_sizes, batch_size=bs,
                                 num_batches=n, seed=seed, distribution=dist)


@pytest.mark.parametrize("opt", ["sgd", "adagrad", "rwsadagrad"])
def test_training_reduces_loss(opt):
    cfg, dcfg = _data_cfg(n=150)
    tcfg = TrainConfig(batch_size=dcfg.batch_size, learning_rate=0.1,
                       optimizer=opt, print_freq=10)
    params = init_dlrm(jax.random.PRNGKey(0), cfg)
    params, _, hist = train(params, cfg, tcfg,
                            learnable_batches(dcfg), log_fn=lambda *_: None)
    losses = hist["loss"]
    assert len(losses) >= 10
    first = np.mean(losses[:3])
    last = np.mean(losses[-3:])
    assert last < first, (first, last)


def test_training_learns_signal_auc():
    cfg, dcfg = _data_cfg(n=300, bs=128)
    tcfg = TrainConfig(batch_size=128, learning_rate=0.2,
                       optimizer="rwsadagrad", print_freq=50)
    params = init_dlrm(jax.random.PRNGKey(1), cfg)
    params, _, _ = train(params, cfg, tcfg, learnable_batches(dcfg),
                         log_fn=lambda *_: None)
    test_cfg = dataclasses.replace(dcfg, num_batches=40, seed=999)
    metrics = evaluate(params, cfg, learnable_batches(test_cfg))
    assert metrics["auc"] > 0.65, metrics


def test_training_random_labels_no_nan():
    cfg, dcfg = _data_cfg(n=30)
    tcfg = TrainConfig(batch_size=dcfg.batch_size, learning_rate=0.1,
                       optimizer="sgd", print_freq=1)
    params = init_dlrm(jax.random.PRNGKey(0), cfg)
    _, _, hist = train(params, cfg, tcfg, random_batches(dcfg),
                       log_fn=lambda *_: None)
    assert np.all(np.isfinite(hist["loss"]))


def test_qr_md_training_step_runs():
    base = tiny_dlrm_config()
    for flags in ({"qr_flag": True, "qr_threshold": 25, "qr_collisions": 4},
                  {"md_flag": True, "md_threshold": 25}):
        cfg = dataclasses.replace(base, **flags)
        dcfg = RandomDataConfig(num_dense=cfg.num_dense_features,
                                table_sizes=cfg.table_sizes, batch_size=16,
                                num_batches=20, seed=0)
        tcfg = TrainConfig(batch_size=16, optimizer="rwsadagrad", print_freq=2)
        params = init_dlrm(jax.random.PRNGKey(0), cfg)
        # table_0 (40 rows) over threshold -> factorized; table_2 (20) plain
        assert any(("kind_qr" in v or "kind_md" in v)
                   for v in params.sparse.values())
        assert any("kind_plain" in v for v in params.sparse.values())
        _, _, hist = train(params, cfg, tcfg, learnable_batches(dcfg),
                           log_fn=lambda *_: None)
        assert np.all(np.isfinite(hist["loss"]))


def test_lr_policy_in_training():
    cfg, dcfg = _data_cfg(n=20)
    tcfg = TrainConfig(batch_size=dcfg.batch_size, learning_rate=10.0,
                       optimizer="sgd", lr_num_warmup_steps=1000,
                       print_freq=1)
    # with warmup over 1000 steps, effective lr stays tiny -> loss ~stable
    params = init_dlrm(jax.random.PRNGKey(0), cfg)
    _, _, hist = train(params, cfg, tcfg, random_batches(dcfg),
                       log_fn=lambda *_: None)
    assert np.all(np.isfinite(hist["loss"]))


def test_zipf_batches_have_locality():
    _, dcfg = _data_cfg(n=5, dist="zipf")
    dcfg = dataclasses.replace(dcfg, table_sizes=(1000,), zipf_alpha=1.2)
    seen = []
    for _, idx, _ in random_batches(dcfg):
        seen.append(idx[:, 0])
    seen = np.concatenate(seen)
    # a zipf stream must reuse a small hot set far more than uniform would
    _, counts = np.unique(seen, return_counts=True)
    assert counts.max() >= 5
    assert len(counts) < len(seen) * 0.8
