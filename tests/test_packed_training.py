"""Packed big-table layout (round 4): training against the [N/P, P*D]
stored layout must match logical-layout training (same gathers, same
updates; rwsadagrad's row-mean via block matmul is float-reassociated, so
trajectories match to tolerance, not bit-for-bit)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from evstore_tpu.config import TrainConfig, tiny_dlrm_config
from evstore_tpu.data.synthetic import RandomDataConfig, learnable_batches
from evstore_tpu.models.dlrm import init_dlrm
from evstore_tpu.models.embedding import take_rows_packed_layout
from evstore_tpu.train.optim import (make_pack_spec, pack_tables,
                                     row_update, row_update_packed,
                                     unpack_tables)
from evstore_tpu.train.train_loop import (init_opt_state, make_train_step,
                                          unpack_batch)


def test_take_rows_packed_layout_exact():
    rng = np.random.default_rng(0)
    for p in (2, 4):
        n, d = 64, 12
        table = jnp.asarray(rng.standard_normal((n, d)), jnp.float32)
        packed = jnp.asarray(np.asarray(table).reshape(n // p, d * p))
        ids = jnp.asarray(rng.integers(0, n, (517,)), jnp.int32)
        got = jax.jit(take_rows_packed_layout, static_argnums=(2, 3))(
            packed, ids, p, d)
        np.testing.assert_array_equal(np.asarray(got),
                                      np.asarray(jnp.take(table, ids, axis=0)))


@pytest.mark.parametrize("opt", ["sgd", "adagrad", "rwsadagrad"])
def test_row_update_packed_matches_logical(opt):
    rng = np.random.default_rng(1)
    n, d, p, b = 48, 8, 2, 64
    table = rng.standard_normal((n, d)).astype(np.float32)
    ids = rng.integers(0, n, b).astype(np.int32)
    grads = rng.standard_normal((b, d)).astype(np.float32) * 0.1
    if opt == "sgd":
        st_l = st_p = None
    elif opt == "adagrad":
        st = rng.random((n, d)).astype(np.float32) * 0.01
        st_l, st_p = jnp.asarray(st), jnp.asarray(st.reshape(n // p, d * p))
    else:
        # rwsadagrad: the packed table is AUGMENTED with the accumulator
        # lanes; the separate state is a [0] placeholder
        st = rng.random(n).astype(np.float32) * 0.01
        st_l = jnp.asarray(st)
        st_p = jnp.zeros((0,), jnp.float32)
    new_st_l, new_tab_l = row_update(opt, st_l, jnp.asarray(table),
                                     jnp.asarray(ids), jnp.asarray(grads), 0.1)
    packed_in = table.reshape(n // p, d * p)
    if opt == "rwsadagrad":
        packed_in = np.concatenate([packed_in, st.reshape(n // p, p)], axis=1)
    new_st_p, new_tab_p = row_update_packed(
        opt, st_p, jnp.asarray(packed_in),
        jnp.asarray(ids), jnp.asarray(grads), p, 0.1)
    if opt == "rwsadagrad":
        out = np.asarray(new_tab_p)
        np.testing.assert_allclose(out[:, :d * p].reshape(n, d),
                                   np.asarray(new_tab_l), rtol=2e-6, atol=1e-7)
        np.testing.assert_allclose(out[:, d * p:].reshape(n),
                                   np.asarray(new_st_l), rtol=2e-6, atol=1e-8)
    else:
        np.testing.assert_allclose(np.asarray(new_tab_p).reshape(n, d),
                                   np.asarray(new_tab_l), rtol=2e-6, atol=1e-7)
        if opt == "adagrad":
            np.testing.assert_allclose(np.asarray(new_st_p).reshape(n, d),
                                       np.asarray(new_st_l), rtol=2e-6,
                                       atol=1e-8)


def test_packed_training_matches_logical_trajectory():
    cfg = tiny_dlrm_config()
    tcfg = TrainConfig(batch_size=32, learning_rate=0.2, optimizer="rwsadagrad")
    params = init_dlrm(jax.random.PRNGKey(0), cfg)
    opt = init_opt_state(params, tcfg)
    # force-pack every even-sized plain table
    spec = {}
    for name, p in params.sparse.items():
        if "kind_plain" in p and p["kind_plain"].shape[0] % 2 == 0:
            spec[name] = 2
    assert spec, "tiny config should have at least one even table"
    pparams, popt = pack_tables(params, opt, spec)
    step_l = jax.jit(make_train_step(cfg, tcfg))
    step_p = jax.jit(make_train_step(cfg, tcfg, pack=spec))
    dcfg = RandomDataConfig(num_dense=cfg.num_dense_features,
                            table_sizes=cfg.table_sizes, batch_size=32,
                            num_batches=12, seed=5)
    for dx, idx, y in learnable_batches(dcfg):
        dx, idx, y = jnp.asarray(dx), jnp.asarray(idx), jnp.asarray(y)
        params, opt, l_l = step_l(params, opt, dx, idx, y)
        pparams, popt, l_p = step_p(pparams, popt, dx, idx, y)
        np.testing.assert_allclose(float(l_p), float(l_l), rtol=1e-5)
    uparams, uopt = unpack_tables(pparams, popt, spec)
    for name in spec:
        np.testing.assert_allclose(
            np.asarray(uparams.sparse[name]["kind_plain"]),
            np.asarray(params.sparse[name]["kind_plain"]),
            rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(uopt.sparse[name]),
                                   np.asarray(opt.sparse[name]),
                                   rtol=1e-5, atol=1e-7)


def test_make_pack_spec_thresholds():
    import unittest.mock as mock
    from evstore_tpu.models import embedding as emb
    cfg = tiny_dlrm_config()
    params = init_dlrm(jax.random.PRNGKey(0), cfg)
    # default threshold: nothing tiny gets packed
    assert make_pack_spec(params, "rwsadagrad") == {}
    with mock.patch.object(emb, "PACKED_GATHER_MIN_BYTES", 0):
        spec = make_pack_spec(params, "rwsadagrad")
        for name, f in spec.items():
            assert params.sparse[name]["kind_plain"].shape[0] % f == 0


def test_row_update_packed_rep_branch():
    # force the rep-trick branch (npk > dense limit is impossible at test
    # scale, so shrink the limit) and check parity incl. duplicates
    import unittest.mock as mock
    from evstore_tpu.train import optim as O
    rng = np.random.default_rng(3)
    n, d, p, b = 64, 8, 2, 48
    table = rng.standard_normal((n, d)).astype(np.float32)
    ids = rng.integers(0, n, b).astype(np.int32)
    ids[5:9] = ids[4]   # duplicates
    grads = rng.standard_normal((b, d)).astype(np.float32) * 0.1
    st = rng.random(n).astype(np.float32) * 0.01
    aug = np.concatenate([table.reshape(n // p, d * p),
                          st.reshape(n // p, p)], axis=1)
    with mock.patch.object(O, "DENSE_GRAD_LIMIT_BYTES", 0):
        _, new_aug = row_update_packed(
            "rwsadagrad", jnp.zeros((0,), jnp.float32), jnp.asarray(aug),
            jnp.asarray(ids), jnp.asarray(grads), p, 0.1)
    new_st_l, new_tab_l = row_update("rwsadagrad", jnp.asarray(st),
                                     jnp.asarray(table), jnp.asarray(ids),
                                     jnp.asarray(grads), 0.1)
    out = np.asarray(new_aug)
    np.testing.assert_allclose(out[:, :d * p].reshape(n, d),
                               np.asarray(new_tab_l), rtol=2e-6, atol=1e-7)
    np.testing.assert_allclose(out[:, d * p:].reshape(n),
                               np.asarray(new_st_l), rtol=2e-6, atol=1e-8)


def test_packed_rwsadagrad_bf16_keeps_f32_state():
    """Regression (round-4 advisor, medium): with bf16 tables the augmented
    lanes would hold the adagrad second moment in bf16 and round away small
    increments.  pack_tables must keep a separate f32 accumulator, and the
    packed trajectory must match the logical bf16 path."""
    from evstore_tpu.train.optim import OptState
    rng = np.random.default_rng(5)
    n, d, p, b = 48, 8, 2, 64
    table = rng.standard_normal((n, d)).astype(np.float32)
    st = rng.random(n).astype(np.float32) * 0.01
    ids = rng.integers(0, n, b).astype(np.int32)
    grads = rng.standard_normal((b, d)).astype(np.float32) * 0.1

    from evstore_tpu.models.dlrm import DLRMParams
    params = DLRMParams(dense={}, sparse={
        "table_0": {"kind_plain": jnp.asarray(table, jnp.bfloat16)}})
    ost = OptState(jnp.zeros((), jnp.int32), {},
                   {"table_0": jnp.asarray(st)})
    spec = {"table_0": p}
    pp, po = pack_tables(params, ost, spec)
    packed = pp.sparse["table_0"]["kind_plain"]
    assert packed.shape == (n // p, d * p)          # NOT augmented
    assert po.sparse["table_0"].dtype == jnp.float32
    assert po.sparse["table_0"].shape == (n // p, p)

    new_st_p, new_tab_p = row_update_packed(
        "rwsadagrad", po.sparse["table_0"], packed,
        jnp.asarray(ids), jnp.asarray(grads), p, 0.1)
    assert new_st_p.dtype == jnp.float32
    # logical bf16 reference
    new_st_l, new_tab_l = row_update(
        "rwsadagrad", jnp.asarray(st),
        jnp.asarray(table, jnp.bfloat16), jnp.asarray(ids),
        jnp.asarray(grads), 0.1)
    np.testing.assert_allclose(
        np.asarray(new_tab_p, np.float32).reshape(n, d),
        np.asarray(new_tab_l, np.float32), rtol=2e-2, atol=2e-3)
    np.testing.assert_allclose(np.asarray(new_st_p).reshape(n),
                               np.asarray(new_st_l), rtol=2e-6, atol=1e-8)
    # round-trip back to logical
    up, uo = unpack_tables(
        pp._replace(sparse={"table_0": {"kind_plain": new_tab_p}}),
        po._replace(sparse={"table_0": new_st_p}), spec)
    assert up.sparse["table_0"]["kind_plain"].shape == (n, d)
    assert uo.sparse["table_0"].shape == (n,)
    assert uo.sparse["table_0"].dtype == jnp.float32
