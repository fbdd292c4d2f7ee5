import jax
import jax.numpy as jnp
import numpy as np

from evstore_tpu.train.optim import (PAD_ROW, dedup_rows, lr_schedule,
                                     make_optimizer)


def test_lr_schedule_warmup_flat_decay():
    lr = lr_schedule(0.1, num_warmup_steps=10, decay_start_step=20,
                     num_decay_steps=10)
    # warmup: scale = 1 - (warm - step)/warm  (dlrm_s_pytorch.py:183-186)
    np.testing.assert_allclose(float(lr(0)), 0.0, atol=1e-8)
    np.testing.assert_allclose(float(lr(5)), 0.05, rtol=1e-5)
    np.testing.assert_allclose(float(lr(10)), 0.1, rtol=1e-5)
    np.testing.assert_allclose(float(lr(15)), 0.1, rtol=1e-5)
    # decay: scale = ((nd - d)/nd)^2
    np.testing.assert_allclose(float(lr(25)), 0.1 * 0.25, rtol=1e-5)
    assert float(lr(35)) == np.float32(1e-7)


def test_lr_schedule_no_decay():
    lr = lr_schedule(0.5, 0, 0, 0)
    assert float(lr(100)) == np.float32(0.5)


def test_dedup_rows():
    idx = jnp.asarray([3, 1, 3, 7], jnp.int32)
    g = jnp.asarray([[1., 1.], [2., 2.], [10., 10.], [4., 4.]])
    uniq, summed, valid = dedup_rows(idx, g, 4)
    uniq = np.asarray(uniq)
    summed = np.asarray(summed)
    got = {int(u): tuple(s) for u, s, v in zip(uniq, summed, np.asarray(valid))
           if v > 0}
    assert got == {1: (2., 2.), 3: (11., 11.), 7: (4., 4.)}
    # exactly one padded slot
    assert int(np.sum(np.asarray(valid))) == 3


def test_rwsadagrad_sparse_matches_manual():
    """Row-wise sparse Adagrad semantics (optim/rwsadagrad.py:109-113):
    momentum[row] += mean(grad_row^2); p[row] -= lr*grad/(sqrt(m)+eps)."""
    _, _, sparse_update = make_optimizer("rwsadagrad", eps=1e-10)
    N, D = 5, 3
    table = jnp.ones((N, D))
    mom = jnp.zeros((N,))
    rows_idx = jnp.asarray([2, 4, PAD_ROW], jnp.int32)
    g = jnp.asarray([[1., 2., 3.], [0.5, 0.5, 0.5], [9., 9., 9.]])
    valid = jnp.asarray([1., 1., 0.])
    new_mom, new_tab = sparse_update(mom, table, rows_idx, g, valid, 0.1)
    new_mom = np.asarray(new_mom)
    new_tab = np.asarray(new_tab)
    m2 = np.mean([1., 4., 9.])
    np.testing.assert_allclose(new_mom[2], m2, rtol=1e-6)
    np.testing.assert_allclose(new_mom[4], 0.25, rtol=1e-6)
    assert new_mom[0] == 0.0  # untouched rows
    np.testing.assert_allclose(
        new_tab[2], 1.0 - 0.1 * np.array([1., 2., 3.]) / (np.sqrt(m2) + 1e-10),
        rtol=1e-6)
    np.testing.assert_allclose(new_tab[0], np.ones(D))  # untouched
    # padded entry dropped: no row corrupted by the [9,9,9] grad
    np.testing.assert_allclose(new_tab[3], np.ones(D))


def test_adagrad_dense_matches_manual():
    init, dense_update, _ = make_optimizer("adagrad", eps=1e-10)
    p = {"w": jnp.asarray([1.0, 2.0])}
    g = {"w": jnp.asarray([0.5, -0.5])}
    s = {"w": jnp.zeros(2)}
    s2, p2 = dense_update(s, p, g, 0.1)
    np.testing.assert_allclose(np.asarray(s2["w"]), [0.25, 0.25], rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(p2["w"]), [1.0 - 0.1 * 0.5 / 0.5, 2.0 + 0.1 * 0.5 / 0.5],
        rtol=1e-6)


def test_pad_row_never_wraps():
    """Regression: XLA scatter WRAPS negative indices even with mode='drop';
    the PAD_ROW sentinel must never touch the last row."""
    _, _, sparse_update = make_optimizer("rwsadagrad")
    table = jnp.ones((4, 2))
    mom = jnp.zeros((4,))
    rows_idx = jnp.asarray([PAD_ROW], jnp.int32)
    g = jnp.asarray([[100., 100.]])
    valid = jnp.asarray([0.])
    new_mom, new_tab = sparse_update(mom, table, rows_idx, g, valid, 1.0)
    np.testing.assert_array_equal(np.asarray(new_tab), np.ones((4, 2)))
    np.testing.assert_array_equal(np.asarray(new_mom), np.zeros(4))


def test_sgd_sparse_update():
    """Contract: rows_idx is UNIQUE (one entry per row, from dedup_rows) —
    duplicates would double-apply under adagrad state math and are no longer
    supported by the dense-pass lowering (optim.scatter_rows_add)."""
    _, _, sparse_update = make_optimizer("sgd")
    table = jnp.zeros((4, 2))
    rows_idx = jnp.asarray([1, 3], jnp.int32)
    g = jnp.asarray([[2., 2.], [1., 1.]])
    valid = jnp.asarray([1., 1.])
    _, new_tab = sparse_update(None, table, rows_idx, g, valid, 1.0)
    np.testing.assert_allclose(np.asarray(new_tab)[1], [-2., -2.])
    np.testing.assert_allclose(np.asarray(new_tab)[3], [-1., -1.])
    np.testing.assert_allclose(np.asarray(new_tab)[0], [0., 0.])


def test_scatter_rows_add_dense_and_scatter_paths_agree():
    """The static dense-pass vs scatter lowering choice must be invisible:
    same result for a table on both sides of the N <= 256*U crossover."""
    from evstore_tpu.train.optim import scatter_rows_add
    rng = np.random.default_rng(0)
    u = 8
    ids = np.asarray([3, 7, 11, 200, PAD_ROW, PAD_ROW, 0, 150], np.int32)
    upd = rng.normal(size=(u, 4)).astype(np.float32)
    upd[4:6] = 0.0
    small = jnp.asarray(rng.normal(size=(256, 4)).astype(np.float32))   # dense
    big = jnp.concatenate([small,
                           jnp.zeros((u * 256 + 1 - 256, 4))])          # scatter
    out_small = np.asarray(scatter_rows_add(small, jnp.asarray(ids),
                                            jnp.asarray(upd)))
    out_big = np.asarray(scatter_rows_add(big, jnp.asarray(ids),
                                          jnp.asarray(upd)))
    np.testing.assert_allclose(out_small, out_big[:256], rtol=1e-6)
    np.testing.assert_allclose(out_small[3], np.asarray(small)[3] + upd[0],
                               rtol=1e-6)
    # 1-D (row-wise momentum) variant
    mom = jnp.zeros((256,))
    out = np.asarray(scatter_rows_add(mom, jnp.asarray(ids),
                                      jnp.asarray(upd[:, 0])))
    np.testing.assert_allclose(out[7], upd[1, 0], rtol=1e-6)
    assert out[1] == 0.0
