"""Butterfly (table-wise all_to_all) mode vs single-device reference."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from evstore_tpu.config import TrainConfig, make_dlrm_config
from evstore_tpu.models.dlrm import DLRMParams, init_dlrm
from evstore_tpu.parallel.butterfly import (AXIS, init_butterfly_state,
                                            make_butterfly_train_step,
                                            stack_tables, unstack_tables)
from evstore_tpu.train.train_loop import init_opt_state, make_train_step
from jax.sharding import Mesh


def _mesh(n=8):
    return Mesh(np.asarray(jax.devices()[:n]), (AXIS,))


def _cfg():
    # 8 uniform-ish tables so the stack pads little
    return make_dlrm_config(4, (40, 40, 40, 40, 30, 30, 30, 30),
                            (8,), (8,), num_dense=4)


def _batch(cfg, B, seed=0):
    rng = np.random.default_rng(seed)
    dense = jnp.asarray(rng.random((B, cfg.num_dense_features)), jnp.float32)
    idx = jnp.asarray(
        np.stack([rng.integers(0, s, B) for s in cfg.table_sizes], axis=1),
        jnp.int32)
    labels = jnp.asarray(rng.integers(0, 2, B), jnp.float32)
    return dense, idx, labels


def test_stack_unstack_roundtrip():
    cfg = _cfg()
    params = init_dlrm(jax.random.PRNGKey(0), cfg)
    stack, T = stack_tables(params, 8)
    assert stack.shape == (8, 40, 4) and T == 8
    back = unstack_tables(stack, params)
    for t in range(T):
        np.testing.assert_array_equal(
            np.asarray(back.sparse[f"table_{t}"]["kind_plain"]),
            np.asarray(params.sparse[f"table_{t}"]["kind_plain"]))


@pytest.mark.parametrize("opt", ["sgd", "rwsadagrad"])
@pytest.mark.parametrize("dedup", [False, True])
def test_butterfly_matches_single_device(opt, dedup):
    cfg = _cfg()
    tcfg = TrainConfig(batch_size=16, learning_rate=0.1, optimizer=opt)
    params = init_dlrm(jax.random.PRNGKey(0), cfg)
    dense, idx, labels = _batch(cfg, 16)

    step1 = jax.jit(make_train_step(cfg, tcfg))
    p1, o1, loss1 = step1(params, init_opt_state(params, tcfg), dense, idx,
                          labels)

    mesh = _mesh(8)
    d0, stack, dstate, row_state = init_butterfly_state(params, tcfg, mesh)
    step = make_butterfly_train_step(cfg, tcfg, mesh, 16,
                                     dedup_exchange=dedup)(
        d0, stack, dstate, row_state)
    d1, stack1, _, _, lossN = step(d0, stack, dstate, row_state,
                                   jnp.zeros((), jnp.int32), dense, idx,
                                   labels)
    np.testing.assert_allclose(float(lossN), float(loss1), rtol=1e-5)
    pN = unstack_tables(stack1, params)
    for t in range(cfg.num_tables):
        np.testing.assert_allclose(
            np.asarray(pN.sparse[f"table_{t}"]["kind_plain"]),
            np.asarray(p1.sparse[f"table_{t}"]["kind_plain"]),
            rtol=1e-4, atol=1e-6, err_msg=f"table_{t}")
    np.testing.assert_allclose(
        np.asarray(d1["bot"]["layer_0"]["w"]),
        np.asarray(p1.dense["bot"]["layer_0"]["w"]), rtol=1e-4, atol=1e-6)


def test_butterfly_dedup_equals_full_exchange():
    """Dedup exchange must be bit-equivalent in what it computes: same loss
    and same updated tables as the full [B, Tl, D] exchange."""
    cfg = _cfg()
    tcfg = TrainConfig(batch_size=32, learning_rate=0.1,
                       optimizer="rwsadagrad")
    params = init_dlrm(jax.random.PRNGKey(2), cfg)
    # duplicate-heavy batch so dedup actually coalesces
    rng = np.random.default_rng(3)
    dense = jnp.asarray(rng.random((32, cfg.num_dense_features)), jnp.float32)
    idx = jnp.asarray(
        np.stack([rng.integers(0, min(s, 5), 32) for s in cfg.table_sizes],
                 axis=1), jnp.int32)
    labels = jnp.asarray(rng.integers(0, 2, 32), jnp.float32)
    mesh = _mesh(8)
    outs = {}
    for dedup in (False, True):
        d0, stack, dstate, row_state = init_butterfly_state(params, tcfg, mesh)
        step = make_butterfly_train_step(cfg, tcfg, mesh, 32,
                                         dedup_exchange=dedup)(
            d0, stack, dstate, row_state)
        outs[dedup] = step(d0, stack, dstate, row_state,
                           jnp.zeros((), jnp.int32), dense, idx, labels)
    np.testing.assert_allclose(float(outs[True][4]), float(outs[False][4]),
                               rtol=1e-6)
    np.testing.assert_allclose(np.asarray(outs[True][1]),
                               np.asarray(outs[False][1]),
                               rtol=1e-6, atol=1e-7)


def test_planner_balances_skewed_tables():
    from evstore_tpu.parallel.planner import (contiguous_order,
                                              plan_table_shards)
    # Criteo-like skew: a few huge tables, many tiny ones
    sizes = [1_000_000, 900_000, 800_000, 700_000] + [100] * 12
    order, imb = plan_table_shards(sizes, 4)
    assert sorted(o for o in order if o >= 0) == list(range(16))
    # contiguous split puts all 4 giants on shard 0
    cont = contiguous_order(16, 4)
    def shard_cost(o):
        Tl = len(o) // 4
        return [sum(sizes[t] for t in o[s*Tl:(s+1)*Tl] if t >= 0)
                for s in range(4)]
    cc = shard_cost(cont)
    assert max(cc) / (sum(cc) / 4) > 3.5      # contiguous: ~4x imbalance
    # optimum: largest (unsplittable) table + the 3 leftover tiny tables
    # that must share its shard (4 slots/shard), over the mean load
    opt = (max(sizes) + 3 * 100) / (sum(sizes) / 4)
    assert imb <= opt + 1e-6                  # LPT hits the optimum here
    # frequency-aware: costs follow freqs, not rows
    freqs = [1.0] * 16
    freqs[15] = 100.0
    order_f, imb_f = plan_table_shards(sizes, 4, freqs=freqs)
    # optimum under the 4-slots-per-shard constraint: giant shard also takes
    # the 3 leftover unit-freq tables -> (100+3)/(115/4)
    assert imb_f <= (100 + 3) / (115 / 4) + 1e-6


def test_butterfly_planned_order_matches_single_device():
    """A planner-permuted table placement must compute the identical
    training step (loss + tables) as single-device — placement is a pure
    layout choice."""
    from evstore_tpu.parallel.planner import plan_table_shards
    # interleaved sizes so LPT actually permutes the placement
    cfg = make_dlrm_config(4, (30, 40, 30, 40, 40, 30, 40, 30),
                           (8,), (8,), num_dense=4)
    tcfg = TrainConfig(batch_size=16, learning_rate=0.1,
                       optimizer="rwsadagrad")
    params = init_dlrm(jax.random.PRNGKey(0), cfg)
    dense, idx, labels = _batch(cfg, 16)
    step1 = jax.jit(make_train_step(cfg, tcfg))
    p1, _, loss1 = step1(params, init_opt_state(params, tcfg), dense, idx,
                         labels)
    mesh = _mesh(8)
    order, _ = plan_table_shards(cfg.table_sizes, 8)
    assert order != tuple(range(8))     # actually permuted
    for dedup in (False, True):
        d0, stack, dstate, row_state = init_butterfly_state(
            params, tcfg, mesh, table_order=order)
        step = make_butterfly_train_step(cfg, tcfg, mesh, 16,
                                         dedup_exchange=dedup,
                                         table_order=order)(
            d0, stack, dstate, row_state)
        d1, stack1, _, _, lossN = step(d0, stack, dstate, row_state,
                                       jnp.zeros((), jnp.int32), dense, idx,
                                       labels)
        np.testing.assert_allclose(float(lossN), float(loss1), rtol=1e-5)
        pN = unstack_tables(stack1, params, table_order=order)
        for t in range(cfg.num_tables):
            np.testing.assert_allclose(
                np.asarray(pN.sparse[f"table_{t}"]["kind_plain"]),
                np.asarray(p1.sparse[f"table_{t}"]["kind_plain"]),
                rtol=1e-4, atol=1e-6, err_msg=f"dedup={dedup} table_{t}")


def test_butterfly_multiple_steps_converge():
    cfg = _cfg()
    tcfg = TrainConfig(batch_size=32, learning_rate=0.3, optimizer="rwsadagrad")
    params = init_dlrm(jax.random.PRNGKey(1), cfg)
    mesh = _mesh(8)
    d0, stack, dstate, row_state = init_butterfly_state(params, tcfg, mesh)
    step = make_butterfly_train_step(cfg, tcfg, mesh, 32)(
        d0, stack, dstate, row_state)
    from evstore_tpu.data.synthetic import RandomDataConfig, learnable_batches
    dcfg = RandomDataConfig(num_dense=4, table_sizes=cfg.table_sizes,
                            batch_size=32, num_batches=60, seed=0)
    losses = []
    k = jnp.zeros((), jnp.int32)
    for dense, idx, labels in learnable_batches(dcfg):
        d0, stack, dstate, row_state, loss = step(
            d0, stack, dstate, row_state, k, jnp.asarray(dense),
            jnp.asarray(idx), jnp.asarray(labels))
        k = k + 1
        losses.append(float(loss))
    assert np.mean(losses[-10:]) < np.mean(losses[:10])


@pytest.mark.parametrize("opt", ["sgd", "rwsadagrad"])
@pytest.mark.parametrize("dedup", [False, True])
def test_butterfly_multihot_matches_single_device(opt, dedup):
    """VERDICT r2 item 5: multi-hot bags through the butterfly exchange
    (pool-before-a2a in the dense path, unique-rows-of-the-flat-bag in the
    dedup path) must match the single-device multi-hot step (the reference
    bags ride its a2a unchanged, dlrm_s_pytorch.py:407-459,:564-570)."""
    cfg = _cfg()
    tcfg = TrainConfig(batch_size=16, learning_rate=0.1, optimizer=opt)
    params = init_dlrm(jax.random.PRNGKey(0), cfg)
    B, L = 16, 3
    rng = np.random.default_rng(7)
    dense = jnp.asarray(rng.random((B, cfg.num_dense_features)), jnp.float32)
    idx = jnp.asarray(
        np.stack([rng.integers(0, s, (B, L)) for s in cfg.table_sizes],
                 axis=1), jnp.int32)                       # [B, T, L]
    bw = jnp.asarray(rng.random((B, cfg.num_tables, L)), jnp.float32)
    labels = jnp.asarray(rng.integers(0, 2, B), jnp.float32)

    step1 = jax.jit(make_train_step(cfg, tcfg))
    p1, o1, loss1 = step1(params, init_opt_state(params, tcfg), dense, idx,
                          labels, bw)

    mesh = _mesh(8)
    d0, stack, dstate, row_state = init_butterfly_state(params, tcfg, mesh)
    step = make_butterfly_train_step(cfg, tcfg, mesh, B,
                                     dedup_exchange=dedup,
                                     multihot=True)(
        d0, stack, dstate, row_state)
    d1, stack1, _, _, lossN = step(d0, stack, dstate, row_state,
                                   jnp.zeros((), jnp.int32), dense, idx,
                                   labels, bw)
    np.testing.assert_allclose(float(lossN), float(loss1), rtol=1e-5)
    pN = unstack_tables(stack1, params)
    for t in range(cfg.num_tables):
        np.testing.assert_allclose(
            np.asarray(pN.sparse[f"table_{t}"]["kind_plain"]),
            np.asarray(p1.sparse[f"table_{t}"]["kind_plain"]),
            rtol=1e-4, atol=1e-6, err_msg=f"table_{t}")
    np.testing.assert_allclose(
        np.asarray(d1["bot"]["layer_0"]["w"]),
        np.asarray(p1.dense["bot"]["layer_0"]["w"]), rtol=1e-4, atol=1e-6)


def test_run_training_butterfly_returns_trained_params():
    """Regression (round-4 advisor, high): the final sync in run_training
    must reconstruct the trained tables from bstate — a bug left sync_pair
    as identity in butterfly mode, so TrainResult.params / the final save
    carried the INITIAL untrained parameters."""
    from evstore_tpu.drivers.train import run_training
    cfg = _cfg()
    tcfg = TrainConfig(batch_size=16, learning_rate=0.5, optimizer="sgd",
                       nepochs=1, print_freq=100, test_freq=0)

    def batches():
        for s in range(4):
            yield _batch(cfg, 16, seed=s)

    res = run_training(cfg, tcfg, batches, mesh=_mesh(),
                       alltoall_impl="butterfly", log_fn=lambda *a: None)
    init = init_dlrm(jax.random.PRNGKey(0), cfg)
    moved = max(
        float(np.abs(np.asarray(res.params.sparse[f"table_{t}"]["kind_plain"])
                     - np.asarray(init.sparse[f"table_{t}"]["kind_plain"])
                     ).max())
        for t in range(cfg.num_tables))
    assert moved > 1e-4, "returned params are the untrained init"
