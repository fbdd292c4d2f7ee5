"""Pallas kernels in interpret mode (CPU); compiled-mode correctness runs on
hardware via bench/tpu smoke scripts."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from evstore_tpu.ops.interaction import dot_interaction
from evstore_tpu.ops.pallas_gather import (gather_rows,
                                           gather_rows_dequant_int8,
                                           gather_rows_dequant_int8_ref,
                                           gather_rows_ref)
from evstore_tpu.ops.pallas_interaction import dot_interaction_pallas


def test_gather_rows_interpret(rng):
    table = jnp.asarray(rng.normal(size=(64, 128)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, 64, 32), jnp.int32)
    out = gather_rows(table, idx, tile_b=16, interpret=True)
    np.testing.assert_array_equal(np.asarray(out),
                                  np.asarray(gather_rows_ref(table, idx)))


def test_gather_rows_duplicate_indices(rng):
    table = jnp.asarray(rng.normal(size=(8, 128)).astype(np.float32))
    idx = jnp.asarray([3, 3, 3, 3, 0, 0, 7, 7], jnp.int32)
    out = gather_rows(table, idx, tile_b=8, interpret=True)
    np.testing.assert_array_equal(np.asarray(out),
                                  np.asarray(table)[np.asarray(idx)])


def test_gather_dequant_int8_interpret(rng):
    table = rng.integers(0, 255, (32, 128)).astype(np.uint8)
    idx = jnp.asarray(rng.integers(0, 32, 16), jnp.int32)
    out = gather_rows_dequant_int8(jnp.asarray(table), idx, tile_b=16,
                                   interpret=True)
    expect = gather_rows_dequant_int8_ref(jnp.asarray(table), idx)
    np.testing.assert_allclose(np.asarray(out), np.asarray(expect),
                               rtol=1e-6, atol=1e-7)


@pytest.mark.parametrize("self_interaction", [False, True])
def test_pallas_interaction_matches_xla(rng, self_interaction):
    B, T, D = 16, 5, 8
    x = jnp.asarray(rng.normal(size=(B, D)).astype(np.float32))
    ly = jnp.asarray(rng.normal(size=(B, T, D)).astype(np.float32))
    expect = dot_interaction(x, ly, self_interaction)
    got = dot_interaction_pallas(x, ly, self_interaction, tile_b=8,
                                 interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expect),
                               rtol=1e-5, atol=1e-5)


def test_pallas_interaction_bad_tile():
    with pytest.raises(ValueError):
        dot_interaction_pallas(jnp.ones((10, 4)), jnp.ones((10, 3, 4)),
                               tile_b=4, interpret=True)


def test_pallas_interaction_gradients_match_xla(rng):
    """The custom VJP must reproduce XLA autodiff through the interaction."""
    B, T, D = 8, 5, 4
    x = jnp.asarray(rng.normal(size=(B, D)).astype(np.float32))
    ly = jnp.asarray(rng.normal(size=(B, T, D)).astype(np.float32))

    def loss_p(x_, ly_):
        return jnp.sum(dot_interaction_pallas(x_, ly_, False, 8, True) ** 2)

    def loss_x(x_, ly_):
        return jnp.sum(dot_interaction(x_, ly_) ** 2)

    gx_p, gly_p = jax.grad(loss_p, argnums=(0, 1))(x, ly)
    gx_x, gly_x = jax.grad(loss_x, argnums=(0, 1))(x, ly)
    np.testing.assert_allclose(np.asarray(gx_p), np.asarray(gx_x),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gly_p), np.asarray(gly_x),
                               rtol=1e-4, atol=1e-4)


def test_gather_rows_grad_matches_take_vjp():
    """Differentiable gather wrapper: value and table-cotangent must equal
    the jnp.take path (on CPU it routes to the XLA gather)."""
    import jax
    import jax.numpy as jnp
    from evstore_tpu.ops.pallas_gather import gather_rows_grad

    table = jnp.asarray(np.random.default_rng(0).random((40, 8), np.float32))
    idx = jnp.asarray([1, 3, 3, 7, 39, 0], jnp.int32)

    def f_pallas(t):
        return jnp.sum(gather_rows_grad(t, idx) ** 2)

    def f_take(t):
        return jnp.sum(jnp.take(t, idx, axis=0) ** 2)

    np.testing.assert_allclose(float(f_pallas(table)), float(f_take(table)),
                               rtol=1e-6)
    np.testing.assert_allclose(np.asarray(jax.grad(f_pallas)(table)),
                               np.asarray(jax.grad(f_take)(table)),
                               rtol=1e-6)


def test_use_pallas_gather_flag_equivalence():
    """cfg.use_pallas_gather must not change results (CPU falls back to the
    XLA gather; the flag only swaps the gather implementation)."""
    import dataclasses
    import jax
    import jax.numpy as jnp
    from evstore_tpu.config import TrainConfig, tiny_dlrm_config
    from evstore_tpu.models.dlrm import dlrm_forward, init_dlrm
    from evstore_tpu.train.train_loop import init_opt_state, make_train_step

    cfg = tiny_dlrm_config()
    cfg_p = dataclasses.replace(cfg, use_pallas_gather=True)
    tcfg = TrainConfig(batch_size=8, learning_rate=0.1, optimizer="sgd")
    params = init_dlrm(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(1)
    dx = jnp.asarray(rng.random((8, cfg.num_dense_features), np.float32))
    idx = jnp.asarray(np.stack([rng.integers(0, s, 8)
                                for s in cfg.table_sizes], 1), jnp.int32)
    y = jnp.asarray(rng.integers(0, 2, 8).astype(np.float32))

    np.testing.assert_allclose(
        np.asarray(dlrm_forward(params, dx, idx, cfg_p)),
        np.asarray(dlrm_forward(params, dx, idx, cfg)), rtol=1e-6)
    p1, _, l1 = jax.jit(make_train_step(cfg, tcfg))(
        params, init_opt_state(params, tcfg), dx, idx, y)
    p2, _, l2 = jax.jit(make_train_step(cfg_p, tcfg))(
        params, init_opt_state(params, tcfg), dx, idx, y)
    np.testing.assert_allclose(float(l2), float(l1), rtol=1e-6)
    for name in p1.sparse:
        np.testing.assert_allclose(
            np.asarray(p2.sparse[name]["kind_plain"]),
            np.asarray(p1.sparse[name]["kind_plain"]), rtol=1e-6)


@pytest.mark.parametrize("self_interaction", [False, True])
@pytest.mark.parametrize("dtype", ["float32", "bfloat16"])
def test_blocked_interaction_matches_xla(rng, self_interaction, dtype):
    """Round-5 sample-blocked fused kernel: forward must match the XLA
    split-gram path (same rounding chain) for both dtypes."""
    from evstore_tpu.ops.pallas_interaction import dot_interaction_blocked
    dt = jnp.dtype(dtype)
    B, T, D = 32, 5, 12
    x = jnp.asarray(rng.normal(size=(B, D)), dt)
    ly = jnp.asarray(rng.normal(size=(B, T, D)), dt)
    ref = dot_interaction(x, ly, self_interaction)
    got = dot_interaction_blocked(x, ly, self_interaction, 16, 4, True)
    assert got.dtype == ref.dtype and got.shape == ref.shape
    tol = 0 if dt == jnp.bfloat16 else 4e-6
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(ref, np.float32), atol=tol)


def test_blocked_interaction_gradients_match_xla(rng):
    from evstore_tpu.ops.pallas_interaction import dot_interaction_blocked
    B, T, D = 16, 4, 8
    x = jnp.asarray(rng.normal(size=(B, D)), jnp.float32)
    ly = jnp.asarray(rng.normal(size=(B, T, D)), jnp.float32)

    def loss_ref(x_, ly_):
        return jnp.sum(jnp.sin(dot_interaction(x_, ly_)))

    def loss_blk(x_, ly_):
        return jnp.sum(jnp.sin(
            dot_interaction_blocked(x_, ly_, False, 8, 4, True)))

    gr = jax.grad(loss_ref, argnums=(0, 1))(x, ly)
    gb = jax.grad(loss_blk, argnums=(0, 1))(x, ly)
    np.testing.assert_allclose(np.asarray(gb[0]), np.asarray(gr[0]),
                               rtol=1e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(gb[1]), np.asarray(gr[1]),
                               rtol=1e-4, atol=2e-5)


def test_blocked_interaction_bad_shapes():
    from evstore_tpu.ops.pallas_interaction import dot_interaction_blocked
    x = jnp.zeros((20, 8), jnp.float32)
    ly = jnp.zeros((20, 3, 8), jnp.float32)
    with pytest.raises(ValueError):
        dot_interaction_blocked(x, ly, False, 16, 4, True)
