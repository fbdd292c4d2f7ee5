"""Weighted pooling (reference --weighted-pooling / v_W,
dlrm_s_pytorch.py:284-293,407-459)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from evstore_tpu.config import TrainConfig, tiny_dlrm_config
from evstore_tpu.models.dlrm import dlrm_forward, init_dlrm
from evstore_tpu.models.embedding import sparse_arch_lookup
from evstore_tpu.train.train_loop import init_opt_state, make_train_step


def _cfg(mode):
    return dataclasses.replace(tiny_dlrm_config(), weighted_pooling=mode)


def test_fixed_weights_start_as_identity():
    cfg = _cfg("fixed")
    params = init_dlrm(jax.random.PRNGKey(0), cfg)
    assert "pool_w" in params.sparse["table_0"]
    base = init_dlrm(jax.random.PRNGKey(0), _cfg(None))
    rng = np.random.default_rng(0)
    idx = jnp.asarray(rng.integers(0, 20, (8, cfg.num_tables)), jnp.int32)
    a = sparse_arch_lookup(params.sparse, idx, cfg)
    b = sparse_arch_lookup(base.sparse, idx, cfg)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)


def test_weights_scale_rows():
    cfg = _cfg("fixed")
    params = init_dlrm(jax.random.PRNGKey(0), cfg)
    w = params.sparse["table_0"]["pool_w"].at[5].set(2.0)
    params.sparse["table_0"]["pool_w"] = w
    idx = jnp.full((1, cfg.num_tables), 5, jnp.int32)
    rows = sparse_arch_lookup(params.sparse, idx, cfg)
    plain = params.sparse["table_0"]["kind_plain"]
    np.testing.assert_allclose(np.asarray(rows[0, 0]),
                               2.0 * np.asarray(plain[5]), rtol=1e-6)


def test_learned_weights_update_only_touched_rows():
    cfg = _cfg("learned")
    tcfg = TrainConfig(batch_size=8, optimizer="rwsadagrad",
                       learning_rate=0.5)
    params = init_dlrm(jax.random.PRNGKey(0), cfg)
    opt = init_opt_state(params, tcfg)
    assert "table_0__pool_w" in opt.sparse
    step = jax.jit(make_train_step(cfg, tcfg))
    rng = np.random.default_rng(0)
    dense = jnp.asarray(rng.random((8, cfg.num_dense_features)), jnp.float32)
    idx = jnp.asarray(rng.integers(0, 10, (8, cfg.num_tables)), jnp.int32)
    y = jnp.asarray(rng.integers(0, 2, 8), jnp.float32)
    p2, o2, loss = step(params, opt, dense, idx, y)
    w0, w2 = np.asarray(params.sparse["table_0"]["pool_w"]), \
        np.asarray(p2.sparse["table_0"]["pool_w"])
    touched = np.unique(np.asarray(idx)[:, 0])
    changed = np.where(np.any(w0 != w2, axis=1))[0]
    assert set(changed).issubset(set(touched))
    assert len(changed) > 0
    # untouched rows (>= 10) stay exactly 1.0
    np.testing.assert_array_equal(w2[10:], w0[10:])


def test_fixed_weights_not_updated_by_training():
    cfg = _cfg("fixed")
    tcfg = TrainConfig(batch_size=8, optimizer="sgd", learning_rate=0.5)
    params = init_dlrm(jax.random.PRNGKey(0), cfg)
    step = jax.jit(make_train_step(cfg, tcfg))
    rng = np.random.default_rng(0)
    dense = jnp.asarray(rng.random((8, cfg.num_dense_features)), jnp.float32)
    idx = jnp.asarray(rng.integers(0, 10, (8, cfg.num_tables)), jnp.int32)
    y = jnp.asarray(rng.integers(0, 2, 8), jnp.float32)
    p2, _, _ = step(params, init_opt_state(params, tcfg), dense, idx, y)
    np.testing.assert_array_equal(
        np.asarray(p2.sparse["table_0"]["pool_w"]),
        np.asarray(params.sparse["table_0"]["pool_w"]))


def test_weighted_sharded_forward_matches_single():
    from evstore_tpu.parallel.mesh import make_mesh
    from evstore_tpu.parallel.sharded import (make_sharded_eval_step,
                                              shard_dlrm_params)
    cfg = _cfg("fixed")
    params = init_dlrm(jax.random.PRNGKey(0), cfg)
    # perturb weights so the test is non-trivial
    rng = np.random.default_rng(1)
    for t in range(cfg.num_tables):
        n = params.sparse[f"table_{t}"]["pool_w"].shape[0]
        params.sparse[f"table_{t}"]["pool_w"] = jnp.asarray(
            rng.uniform(0.5, 1.5, (n, 1)), jnp.float32)
    dense = jnp.asarray(rng.random((16, cfg.num_dense_features)), jnp.float32)
    idx = jnp.asarray(
        np.stack([rng.integers(0, s, 16) for s in cfg.table_sizes], axis=1),
        jnp.int32)
    expect = np.asarray(jax.nn.sigmoid(dlrm_forward(params, dense, idx, cfg)))
    mesh = make_mesh(2, 4)
    sparams, _ = shard_dlrm_params(params, mesh)
    got = np.asarray(make_sharded_eval_step(cfg, mesh)(sparams)(
        sparams, dense, idx))
    np.testing.assert_allclose(got, expect, rtol=1e-5, atol=1e-6)
