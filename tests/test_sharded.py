"""Multi-device SPMD tests on the 8-virtual-CPU-device mesh (conftest sets
xla_force_host_platform_device_count=8) — the 'multi-node without a cluster'
capability the reference lacks (SURVEY.md §4)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from evstore_tpu.config import TrainConfig, tiny_dlrm_config
from evstore_tpu.data.synthetic import RandomDataConfig, learnable_batches
from evstore_tpu.models.dlrm import DLRMParams, dlrm_forward, init_dlrm
from evstore_tpu.parallel.mesh import make_mesh, pad_rows_for_mesh
from evstore_tpu.parallel.sharded import (make_sharded_eval_step,
                                          make_sharded_train_step,
                                          shard_dlrm_params)
from evstore_tpu.train.train_loop import init_opt_state, make_train_step


def _batch(cfg, B, seed=0):
    rng = np.random.default_rng(seed)
    dense = jnp.asarray(rng.random((B, cfg.num_dense_features)), jnp.float32)
    idx = jnp.asarray(
        np.stack([rng.integers(0, s, B) for s in cfg.table_sizes], axis=1),
        jnp.int32)
    labels = jnp.asarray(rng.integers(0, 2, B), jnp.float32)
    return dense, idx, labels


def test_mesh_construction():
    m = make_mesh(2, 4)
    assert m.shape == {"data": 2, "model": 4}
    m = make_mesh()
    assert m.shape["data"] == 8 and m.shape["model"] == 1
    with pytest.raises(ValueError):
        make_mesh(3, 3)


def test_pad_rows():
    t = jnp.ones((10, 4))
    p = pad_rows_for_mesh(t, 4)
    assert p.shape == (12, 4)
    np.testing.assert_array_equal(np.asarray(p[10:]), 0)


@pytest.mark.parametrize("mesh_shape", [(2, 4), (4, 2), (8, 1), (1, 8)])
def test_sharded_eval_matches_single_device(mesh_shape):
    cfg = tiny_dlrm_config()
    params = init_dlrm(jax.random.PRNGKey(0), cfg)
    dense, idx, _ = _batch(cfg, 16)
    expect = np.asarray(jax.nn.sigmoid(dlrm_forward(params, dense, idx, cfg)))

    mesh = make_mesh(*mesh_shape)
    sparams, _ = shard_dlrm_params(params, mesh)
    eval_step = make_sharded_eval_step(cfg, mesh)(sparams)
    got = np.asarray(eval_step(sparams, dense, idx))
    np.testing.assert_allclose(got, expect, rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("opt", ["sgd", "rwsadagrad"])
def test_sharded_train_step_matches_single_device(opt):
    """One step on the 2x4 mesh must produce the same params as the
    single-device step (up to fp tolerance)."""
    cfg = tiny_dlrm_config()
    tcfg = TrainConfig(batch_size=16, learning_rate=0.1, optimizer=opt)
    params = init_dlrm(jax.random.PRNGKey(0), cfg)
    dense, idx, labels = _batch(cfg, 16)

    # single-device reference
    step1 = jax.jit(make_train_step(cfg, tcfg))
    p1, o1, loss1 = step1(params, init_opt_state(params, tcfg), dense, idx,
                          labels)

    mesh = make_mesh(2, 4)
    opt_state = init_opt_state(params, tcfg)
    sparams, sopt, _, _ = shard_dlrm_params(params, mesh, opt_state)
    stepN = make_sharded_train_step(cfg, tcfg, mesh, 16)(sparams, sopt)
    pN, oN, lossN = stepN(sparams, sopt, dense, idx, labels)

    np.testing.assert_allclose(float(lossN), float(loss1), rtol=1e-5)
    for name in p1.sparse:
        a = np.asarray(p1.sparse[name]["kind_plain"])
        b = np.asarray(pN.sparse[name]["kind_plain"])[:a.shape[0]]
        np.testing.assert_allclose(b, a, rtol=1e-4, atol=1e-6, err_msg=name)
    for lname, lyr in p1.dense["bot"].items():
        np.testing.assert_allclose(np.asarray(pN.dense["bot"][lname]["w"]),
                                   np.asarray(lyr["w"]), rtol=1e-4, atol=1e-6)


@pytest.mark.parametrize("mesh_shape", [(2, 4), (1, 8)])
def test_sharded_eval_dedup_matches_single_device(mesh_shape):
    """Dedup unique-row exchange must be numerically identical to the dense
    per-sample exchange (it ships each distinct row once and re-expands)."""
    cfg = tiny_dlrm_config()
    params = init_dlrm(jax.random.PRNGKey(0), cfg)
    dense, idx, _ = _batch(cfg, 16)
    expect = np.asarray(jax.nn.sigmoid(dlrm_forward(params, dense, idx, cfg)))

    mesh = make_mesh(*mesh_shape)
    sparams, _ = shard_dlrm_params(params, mesh)
    eval_step = make_sharded_eval_step(cfg, mesh, dedup_exchange=True)(sparams)
    got = np.asarray(eval_step(sparams, dense, idx))
    np.testing.assert_allclose(got, expect, rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("opt", ["sgd", "rwsadagrad"])
def test_sharded_train_dedup_matches_single_device(opt):
    """One dedup-exchange step must produce the same params as the
    single-device step — grads of duplicated rows coalesce identically."""
    cfg = tiny_dlrm_config()
    tcfg = TrainConfig(batch_size=16, learning_rate=0.1, optimizer=opt)
    params = init_dlrm(jax.random.PRNGKey(0), cfg)
    dense, idx, labels = _batch(cfg, 16)

    step1 = jax.jit(make_train_step(cfg, tcfg))
    p1, o1, loss1 = step1(params, init_opt_state(params, tcfg), dense, idx,
                          labels)

    mesh = make_mesh(2, 4)
    opt_state = init_opt_state(params, tcfg)
    sparams, sopt, _, _ = shard_dlrm_params(params, mesh, opt_state)
    stepN = make_sharded_train_step(cfg, tcfg, mesh, 16,
                                    dedup_exchange=True)(sparams, sopt)
    pN, oN, lossN = stepN(sparams, sopt, dense, idx, labels)

    np.testing.assert_allclose(float(lossN), float(loss1), rtol=1e-5)
    for name in p1.sparse:
        a = np.asarray(p1.sparse[name]["kind_plain"])
        b = np.asarray(pN.sparse[name]["kind_plain"])[:a.shape[0]]
        np.testing.assert_allclose(b, a, rtol=1e-4, atol=1e-6, err_msg=name)


def test_sharded_training_reduces_loss():
    cfg = tiny_dlrm_config()
    tcfg = TrainConfig(batch_size=32, learning_rate=0.2, optimizer="rwsadagrad")
    dcfg = RandomDataConfig(num_dense=cfg.num_dense_features,
                            table_sizes=cfg.table_sizes, batch_size=32,
                            num_batches=60, seed=3)
    params = init_dlrm(jax.random.PRNGKey(0), cfg)
    mesh = make_mesh(4, 2)
    opt_state = init_opt_state(params, tcfg)
    sparams, sopt, _, _ = shard_dlrm_params(params, mesh, opt_state)
    step = make_sharded_train_step(cfg, tcfg, mesh, 32)(sparams, sopt)
    losses = []
    for dense, idx, labels in learnable_batches(dcfg):
        sparams, sopt, loss = step(sparams, sopt, jnp.asarray(dense),
                                   jnp.asarray(idx), jnp.asarray(labels))
        losses.append(float(loss))
    assert np.mean(losses[-10:]) < np.mean(losses[:10])


def test_sharded_update_is_replica_consistent():
    """After a step, every data-replica of a table shard must hold identical
    values (the all-gather-grads invariant)."""
    cfg = tiny_dlrm_config()
    tcfg = TrainConfig(batch_size=16, optimizer="rwsadagrad", learning_rate=0.5)
    params = init_dlrm(jax.random.PRNGKey(0), cfg)
    mesh = make_mesh(2, 4)
    opt_state = init_opt_state(params, tcfg)
    sparams, sopt, _, _ = shard_dlrm_params(params, mesh, opt_state)
    step = make_sharded_train_step(cfg, tcfg, mesh, 16)(sparams, sopt)
    dense, idx, labels = _batch(cfg, 16, seed=7)
    pN, _, _ = step(sparams, sopt, dense, idx, labels)
    for name, p in pN.sparse.items():
        arr = p["kind_plain"]
        # fetch every addressable shard copy and compare
        vals = [np.asarray(s.data) for s in arr.addressable_shards]
        ids = [s.index for s in arr.addressable_shards]
        by_index = {}
        for i, v in zip(ids, vals):
            key = str(i)
            if key in by_index:
                np.testing.assert_array_equal(by_index[key], v)
            else:
                by_index[key] = v
