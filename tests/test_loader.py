import numpy as np
import pytest

from evstore_tpu.data.loader import prefetch
from evstore_tpu.data.synthetic import RandomDataConfig, random_batches


def test_prefetch_preserves_stream():
    cfg = RandomDataConfig(num_dense=4, table_sizes=(40, 30), batch_size=16,
                           num_batches=12, seed=0)
    plain = list(random_batches(cfg))
    pre = list(prefetch(random_batches(cfg), depth=3, to_device=False))
    assert len(pre) == len(plain)
    for (a, b, c), (x, y, z) in zip(pre, plain):
        np.testing.assert_array_equal(a, x)
        np.testing.assert_array_equal(b, y)
        np.testing.assert_array_equal(c, z)


def test_prefetch_to_device():
    import jax
    cfg = RandomDataConfig(num_dense=4, table_sizes=(40,), batch_size=8,
                           num_batches=3, seed=0)
    out = list(prefetch(random_batches(cfg), to_device=True))
    assert all(isinstance(a, jax.Array) for batch in out for a in batch)


def test_prefetch_propagates_errors():
    def bad():
        yield (np.zeros(1), np.zeros(1), np.zeros(1))
        raise RuntimeError("boom")

    it = prefetch(bad(), to_device=False)
    next(it)
    with pytest.raises(RuntimeError, match="boom"):
        next(it)


def test_prefetch_transform():
    cfg = RandomDataConfig(num_dense=4, table_sizes=(40,), batch_size=8,
                           num_batches=2, seed=0)
    out = list(prefetch(random_batches(cfg), to_device=False,
                        transform=lambda b: (b[0] * 2, b[1], b[2])))
    plain = list(random_batches(cfg))
    np.testing.assert_allclose(out[0][0], plain[0][0] * 2)
