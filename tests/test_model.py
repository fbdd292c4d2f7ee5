import jax
import jax.numpy as jnp
import numpy as np
import pytest

from evstore_tpu.config import (kaggle_dlrm_config, make_dlrm_config,
                                terabyte_dlrm_config, tiny_dlrm_config,
                                mlperf_dlrm_config)
from evstore_tpu.models.dlrm import (DLRMParams, dlrm_forward, dlrm_loss,
                                     init_dlrm, predict)
from evstore_tpu.ops.interaction import cat_interaction, dot_interaction


def test_kaggle_config_dims():
    cfg = kaggle_dlrm_config()
    assert cfg.embedding_dim == 36
    assert cfg.num_tables == 26
    assert cfg.mlp_bot == (13, 512, 256, 64, 36)
    # 36 dense + C(27,2)=351 pairwise -> 387 (dlrm_s_pytorch.py:1214-1229)
    assert cfg.mlp_top == (387, 512, 256, 1)


def test_terabyte_and_mlperf_config_dims():
    tb = terabyte_dlrm_config()
    assert tb.embedding_dim == 64
    assert tb.mlp_top[0] == 64 + 351
    mp = mlperf_dlrm_config()
    assert mp.embedding_dim == 128
    assert mp.mlp_top == (128 + 351, 1024, 1024, 512, 256, 1)


def test_config_validation_errors():
    import dataclasses
    cfg = tiny_dlrm_config()
    bad = dataclasses.replace(cfg, mlp_bot=(4, 8, 5))  # 5 != emb dim 4
    with pytest.raises(ValueError):
        bad.validate()


def test_dot_interaction_matches_naive():
    B, T, D = 4, 5, 8
    rng = np.random.default_rng(1)
    x = rng.normal(size=(B, D)).astype(np.float32)
    ly = rng.normal(size=(B, T, D)).astype(np.float32)
    out = np.asarray(dot_interaction(jnp.asarray(x), jnp.asarray(ly)))
    # naive per-sample
    for b in range(B):
        feats = np.concatenate([x[b:b + 1], ly[b]], axis=0)  # [T+1, D]
        gram = feats @ feats.T
        pairs = [gram[i, j] for i in range(T + 1) for j in range(i)]
        expect = np.concatenate([x[b], np.array(pairs, np.float32)])
        np.testing.assert_allclose(out[b], expect, rtol=1e-5, atol=1e-5)
    assert out.shape == (B, D + (T + 1) * T // 2)


def test_dot_interaction_self():
    B, T, D = 2, 3, 4
    x = jnp.ones((B, D))
    ly = jnp.ones((B, T, D))
    out = dot_interaction(x, ly, self_interaction=True)
    assert out.shape == (B, D + (T + 1) * T // 2 + (T + 1))


def test_cat_interaction():
    out = cat_interaction(jnp.ones((2, 4)), jnp.ones((2, 3, 4)))
    assert out.shape == (2, 16)


def test_forward_shapes_and_determinism():
    cfg = tiny_dlrm_config()
    params = init_dlrm(jax.random.PRNGKey(0), cfg)
    B = 8
    rng = np.random.default_rng(0)
    dense = jnp.asarray(rng.random((B, cfg.num_dense_features)), jnp.float32)
    idx = jnp.asarray(rng.integers(0, 20, (B, cfg.num_tables)), jnp.int32)
    logits = dlrm_forward(params, dense, idx, cfg)
    assert logits.shape == (B,)
    logits2 = dlrm_forward(params, dense, idx, cfg)
    np.testing.assert_array_equal(np.asarray(logits), np.asarray(logits2))
    p = predict(params, dense, idx, cfg)
    assert np.all(np.asarray(p) >= 0) and np.all(np.asarray(p) <= 1)


def test_forward_with_prefetched_rows_matches_lookup():
    """The cache/sharded paths inject emb_rows; must equal the local lookup."""
    from evstore_tpu.models.embedding import sparse_arch_lookup
    cfg = tiny_dlrm_config()
    params = init_dlrm(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    dense = jnp.asarray(rng.random((4, cfg.num_dense_features)), jnp.float32)
    idx = jnp.asarray(rng.integers(0, 20, (4, cfg.num_tables)), jnp.int32)
    rows = sparse_arch_lookup(params.sparse, idx, cfg)
    a = dlrm_forward(params, dense, idx, cfg)
    b = dlrm_forward(params, dense, idx, cfg, emb_rows=rows)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)


def test_loss_functions():
    logits = jnp.asarray([2.0, -1.0, 0.5])
    targets = jnp.asarray([1.0, 0.0, 1.0])
    bce = float(dlrm_loss(logits, targets, "bce"))
    p = 1 / (1 + np.exp(-np.asarray(logits)))
    t = np.asarray(targets)
    expect = -np.mean(t * np.log(p) + (1 - t) * np.log(1 - p))
    np.testing.assert_allclose(bce, expect, rtol=1e-5)
    mse = float(dlrm_loss(logits, targets, "mse"))
    np.testing.assert_allclose(mse, np.mean((p - t) ** 2), rtol=1e-5)
    wbce = float(dlrm_loss(logits, targets, "wbce", (1.0, 1.0)))
    np.testing.assert_allclose(wbce, bce, rtol=1e-5)


def test_bfloat16_compute():
    import dataclasses
    cfg = dataclasses.replace(tiny_dlrm_config(), compute_dtype="bfloat16")
    params = init_dlrm(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    dense = jnp.asarray(rng.random((8, cfg.num_dense_features)), jnp.float32)
    idx = jnp.asarray(rng.integers(0, 20, (8, cfg.num_tables)), jnp.int32)
    logits = dlrm_forward(params, dense, idx, cfg)
    assert logits.dtype == jnp.float32
    assert np.all(np.isfinite(np.asarray(logits)))


def test_take_rows_onehot_exact_f32():
    # ADVICE r3 (medium): the one-hot MXU lowering must not round f32
    # tables to bf16 — take_rows must be bit-identical to jnp.take for
    # tiny tables in BOTH dtypes.
    from evstore_tpu.models.embedding import ONEHOT_GATHER_MAX_ROWS, take_rows
    rng = np.random.default_rng(3)
    n = min(512, ONEHOT_GATHER_MAX_ROWS)
    for dtype in (jnp.float32, jnp.bfloat16):
        # values with full mantissas (f32 rounds visibly if demoted to bf16)
        table = jnp.asarray(rng.standard_normal((n, 36)) * 1.2345e-1, dtype)
        ids = jnp.asarray(rng.integers(0, n, (257,)), jnp.int32)
        got = jax.jit(take_rows)(table, ids)
        want = jnp.take(table, ids, axis=0)
        assert got.dtype == table.dtype
        np.testing.assert_array_equal(np.asarray(got, np.float32),
                                      np.asarray(want, np.float32))
